"""FlyModel: the compiled, flat-array model spec consumed by the engine.

The TPU-native engine never sees XML or MuJoCo objects at runtime. A model is
compiled once, host-side (see compile.py), into this pytree of device arrays
plus hashable static metadata. All shapes are static; one FlyModel instance
corresponds to one task configuration (body-part "surgery" produces new
static specs rather than runtime model editing, unlike the reference which
re-edits MJCF per episode — see reference flybody/fruitfly/fruitfly.py:123).

Conventions:
  * quaternions are (w, x, y, z),
  * units are CGS (cm, gram, second) like the reference model,
  * "dof" indexing follows the standard topological ordering where a dof's
    ancestors always precede it.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Joint types (values match the standard mjtJoint encoding).
FREE = 0
BALL = 1
SLIDE = 2
HINGE = 3

# Geom types (values match the standard mjtGeom encoding).
GEOM_PLANE = 0
GEOM_HFIELD = 1
GEOM_SPHERE = 2
GEOM_CAPSULE = 3
GEOM_ELLIPSOID = 4
GEOM_CYLINDER = 5
GEOM_BOX = 6
GEOM_MESH = 7

# Actuator dynamics types (mjtDyn encoding).
DYN_NONE = 0
DYN_INTEGRATOR = 1
DYN_FILTER = 2
DYN_FILTEREXACT = 3

# Actuator gain/bias types (mjtGain/mjtBias encoding).
GAIN_FIXED = 0
GAIN_AFFINE = 1
BIAS_NONE = 0
BIAS_AFFINE = 1

# Actuator transmission types (mjtTrn encoding).
TRN_JOINT = 0
TRN_TENDON = 3
TRN_SITE = 4
TRN_BODY = 5  # adhesion

# Sensor types (mjtSensor encoding, subset used by the fly model).
SENS_TOUCH = 0
SENS_ACCELEROMETER = 1
SENS_VELOCIMETER = 2
SENS_GYRO = 3
SENS_FORCE = 4
SENS_TORQUE = 5

# Integrators.
INT_EULER = 0
INT_RK4 = 1
INT_IMPLICIT = 2
INT_IMPLICITFAST = 3

# Friction cones.
CONE_PYRAMIDAL = 0
CONE_ELLIPTIC = 1


@dataclasses.dataclass(frozen=True, eq=True)
class Meta:
    """Hashable static metadata (participates in jit cache keys)."""

    # Sizes.
    nq: int
    nv: int
    nu: int
    na: int
    nbody: int
    njnt: int
    ngeom: int
    nsite: int
    ncam: int
    ntendon: int
    nsensor: int
    nsensordata: int
    nkey: int

    # Tree structure.
    body_parentid: tuple[int, ...]
    body_rootid: tuple[int, ...]
    body_jntadr: tuple[int, ...]
    body_jntnum: tuple[int, ...]
    body_dofadr: tuple[int, ...]
    body_dofnum: tuple[int, ...]
    body_geomadr: tuple[int, ...]
    body_geomnum: tuple[int, ...]
    body_weldid: tuple[int, ...]
    # Ancestor pointer-doubling table: anc[k][b] = ancestor 2^k hops up.
    body_anc: tuple[tuple[int, ...], ...]
    # Max number of joints in any body.
    max_jnt_per_body: int

    # Joints.
    jnt_type: tuple[int, ...]
    jnt_qposadr: tuple[int, ...]
    jnt_dofadr: tuple[int, ...]
    jnt_bodyid: tuple[int, ...]
    jnt_limited: tuple[bool, ...]

    # Dofs.
    dof_bodyid: tuple[int, ...]
    dof_jntid: tuple[int, ...]

    # Geoms.
    geom_type: tuple[int, ...]
    geom_bodyid: tuple[int, ...]
    geom_contype: tuple[int, ...]
    geom_conaffinity: tuple[int, ...]
    geom_condim: tuple[int, ...]
    geom_priority: tuple[int, ...]
    geom_group: tuple[int, ...]
    geom_sameframe: tuple[int, ...]
    # Nonzero geom_fluid[0] (ellipsoid fluid-interaction geoms); static
    # because fluidshape activation is a build-time spec transformation.
    geom_fluid_active: tuple[bool, ...]

    # Sites / cameras.
    site_bodyid: tuple[int, ...]
    site_sameframe: tuple[int, ...]
    cam_bodyid: tuple[int, ...]

    # Actuators.
    actuator_trntype: tuple[int, ...]
    actuator_trnid: tuple[int, ...]  # first trnid entry
    actuator_dyntype: tuple[int, ...]
    actuator_gaintype: tuple[int, ...]
    actuator_biastype: tuple[int, ...]
    actuator_actadr: tuple[int, ...]  # -1 if stateless

    # Contact excludes: (body1, body2) pairs (fruitfly.xml:733-761 plus any
    # task-added excludes).
    exclude_pairs: tuple[tuple[int, int], ...]

    # Sensors.
    sensor_type: tuple[int, ...]
    sensor_objid: tuple[int, ...]
    sensor_adr: tuple[int, ...]
    sensor_dim: tuple[int, ...]

    # Options (static solver configuration).
    integrator: int
    cone: int
    solver_iterations: int
    ls_iterations: int
    noslip_iterations: int
    disableflags: int

    # Names, for lookups and debugging.
    body_names: tuple[str, ...]
    jnt_names: tuple[str, ...]
    geom_names: tuple[str, ...]
    site_names: tuple[str, ...]
    actuator_names: tuple[str, ...]
    sensor_names: tuple[str, ...]
    tendon_names: tuple[str, ...]
    cam_names: tuple[str, ...]

    def name2id(self, kind: str, name: str) -> int:
        names = getattr(self, f'{kind}_names')
        return names.index(name)


@struct.dataclass
class FlyModel:
    """Compiled model: static meta + device-array parameters."""

    meta: Meta = struct.field(pytree_node=False)

    # Options.
    timestep: jax.Array
    gravity: jax.Array  # (3,)
    density: jax.Array
    viscosity: jax.Array
    wind: jax.Array  # (3,)
    opt_tolerance: jax.Array
    opt_impratio: jax.Array

    # Reference configuration.
    qpos0: jax.Array  # (nq,)
    qpos_spring: jax.Array  # (nq,)
    key_qpos: jax.Array  # (nkey, nq)

    # Bodies.
    body_pos: jax.Array  # (nbody, 3)
    body_quat: jax.Array  # (nbody, 4)
    body_ipos: jax.Array  # (nbody, 3)
    body_iquat: jax.Array  # (nbody, 4)
    body_mass: jax.Array  # (nbody,)
    body_subtreemass: jax.Array  # (nbody,)
    body_inertia: jax.Array  # (nbody, 3)
    body_invweight0: jax.Array  # (nbody, 2)

    # Joints.
    jnt_pos: jax.Array  # (njnt, 3)
    jnt_axis: jax.Array  # (njnt, 3)
    jnt_range: jax.Array  # (njnt, 2)
    jnt_stiffness: jax.Array  # (njnt,)
    jnt_solref: jax.Array  # (njnt, 2)
    jnt_solimp: jax.Array  # (njnt, 5)
    jnt_margin: jax.Array  # (njnt,)

    # Dofs.
    dof_armature: jax.Array  # (nv,)
    dof_damping: jax.Array  # (nv,)
    dof_invweight0: jax.Array  # (nv,)
    dof_frictionloss: jax.Array  # (nv,)

    # Masking matrices for dense tree algebra (constant 0/1 floats).
    # body_dof_mask[b, i] = 1 iff dof i is an ancestor-or-self dof of body b.
    body_dof_mask: jax.Array  # (nbody, nv)
    # dof_prefix_mask[i, j] = 1 iff dof j contributes to the spatial velocity
    # "seen" by dof i when computing cdofdot (mj_comVel prefix semantics).
    dof_prefix_mask: jax.Array  # (nv, nv)

    # Geoms.
    geom_pos: jax.Array  # (ngeom, 3)
    geom_quat: jax.Array  # (ngeom, 4)
    geom_size: jax.Array  # (ngeom, 3)
    geom_rbound: jax.Array  # (ngeom,)
    geom_friction: jax.Array  # (ngeom, 3)
    geom_margin: jax.Array  # (ngeom,)
    geom_gap: jax.Array  # (ngeom,)
    geom_solref: jax.Array  # (ngeom, 2)
    geom_solimp: jax.Array  # (ngeom, 5)
    geom_solmix: jax.Array  # (ngeom,)
    geom_fluid: jax.Array  # (ngeom, 12)

    # Sites and cameras.
    site_pos: jax.Array  # (nsite, 3)
    site_quat: jax.Array  # (nsite, 4)
    site_size: jax.Array  # (nsite, 3)
    cam_pos: jax.Array  # (ncam, 3)
    cam_quat: jax.Array  # (ncam, 4)
    cam_fovy: jax.Array  # (ncam,)

    # Tendons (fixed tendons only: constant coupling).
    ten_J: jax.Array  # (ntendon, nv) constant moment matrix
    ten_Lq: jax.Array  # (ntendon, nq) length = ten_Lq @ qpos
    ten_range: jax.Array  # (ntendon, 2)
    ten_limited: jax.Array  # (ntendon,) 0/1
    ten_stiffness: jax.Array  # (ntendon,)
    ten_damping: jax.Array  # (ntendon,)
    ten_lengthspring: jax.Array  # (ntendon, 2)
    ten_solref: jax.Array  # (ntendon, 2)
    ten_solimp: jax.Array  # (ntendon, 5)
    ten_margin: jax.Array  # (ntendon,)

    # Actuators.
    actuator_gainprm: jax.Array  # (nu, 10)
    actuator_biasprm: jax.Array  # (nu, 10)
    actuator_dynprm: jax.Array  # (nu, 10)
    actuator_ctrlrange: jax.Array  # (nu, 2)
    actuator_forcerange: jax.Array  # (nu, 2)
    actuator_forcelimited: jax.Array  # (nu,) 0/1
    actuator_gear0: jax.Array  # (nu,) first gear component
    # Constant transmission moment for joint/tendon actuators; zero rows for
    # adhesion actuators (their force enters through the contact solver).
    actuator_moment: jax.Array  # (nu, nv)
    # act <-> actuator index maps (na == number of stateful actuators).
    act_actuator_id: jax.Array  # (na,) int32
    actuator_act_adr: jax.Array  # (nu,) int32, -1 if stateless

    # Sensors.
    sensor_cutoff: jax.Array  # (nsensor,)

    @property
    def nq(self) -> int:
        return self.meta.nq

    @property
    def nv(self) -> int:
        return self.meta.nv

    @property
    def nu(self) -> int:
        return self.meta.nu

    @property
    def na(self) -> int:
        return self.meta.na

    def astype(self, dtype: Any) -> 'FlyModel':
        """Cast all floating-point leaves to `dtype` (e.g. float32 for TPU)."""
        def cast(x):
            if isinstance(x, (jax.Array, np.ndarray)) and jnp.issubdtype(
                    x.dtype, jnp.floating):
                return jnp.asarray(x, dtype=dtype)
            return x
        return jax.tree.map(cast, self)


def save(path: str, model: FlyModel) -> None:
    """Serialize a FlyModel to an .npz archive (arrays + JSON metadata)."""
    import json

    arrays = {}
    for field in dataclasses.fields(FlyModel):
        if field.name == 'meta':
            continue
        arrays[field.name] = np.asarray(getattr(model, field.name))
    meta_dict = dataclasses.asdict(model.meta)
    arrays['_meta_json'] = np.frombuffer(
        json.dumps(meta_dict).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load(path: str, dtype: Any = None) -> FlyModel:
    """Load a FlyModel from an .npz archive."""
    import json

    with np.load(path) as data:
        meta_dict = json.loads(bytes(data['_meta_json'].tobytes()).decode())
        # JSON turns tuples into lists; restore hashability.
        def detuple(v):
            if isinstance(v, list):
                return tuple(detuple(x) for x in v)
            return v
        meta = Meta(**{k: detuple(v) for k, v in meta_dict.items()})
        kwargs = {'meta': meta}
        for field in dataclasses.fields(FlyModel):
            if field.name == 'meta':
                continue
            kwargs[field.name] = jnp.asarray(data[field.name])
    model = FlyModel(**kwargs)
    if dtype is not None:
        model = model.astype(dtype)
    return model
