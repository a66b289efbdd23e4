"""Host-side model compilation: fruitfly.xml -> FlyModel flat arrays.

Like MJX, we use MuJoCo's model *compiler* (a host-side, build-time-only
dependency) to resolve the MJCF defaults tree, mesh inertias, and address
bookkeeping, then extract everything the TPU engine needs into a FlyModel.
The runtime engine never imports mujoco.

The reference repository snapshot is missing six cosmetic mesh files (see
meshes.py); we synthesize calibrated replacements so the compiled masses
match the documented empirical values (reference tests/test_flybare.py:27-36).
"""

from __future__ import annotations

import functools
import os

import numpy as np

from flybody_tpu.model import meshes as _meshes
from flybody_tpu.model import spec as _spec

# The fly model (fruitfly.xml + mesh pack) is vendored with the package —
# it is the data artifact the reference distributes via its repo/figshare
# (reference flybody/fruitfly/assets/) — so the framework has no runtime
# dependency on a reference checkout. FLYBODY_ASSETS_DIR overrides.
VENDORED_ASSETS_DIR = os.path.join(os.path.dirname(__file__), 'assets')
# Backwards-compatible alias (old name predates vendoring).
REFERENCE_ASSETS_DIR = VENDORED_ASSETS_DIR
XML_NAME = 'fruitfly.xml'


def _require_mujoco():
    import mujoco  # Host-side build dependency only.
    return mujoco


def load_reference_assets(
        assets_dir: str | None = None) -> tuple[str, dict[str, bytes]]:
    """Returns (xml_string, asset dict) for the reference fly model."""
    assets_dir = assets_dir or os.environ.get('FLYBODY_ASSETS_DIR',
                                              REFERENCE_ASSETS_DIR)
    with open(os.path.join(assets_dir, XML_NAME)) as f:
        xml = f.read()
    assets: dict[str, bytes] = {}
    for fname in os.listdir(assets_dir):
        if fname.endswith(('.obj', '.png', '.msh', '.stl')):
            with open(os.path.join(assets_dir, fname), 'rb') as f:
                assets[fname] = f.read()
    return xml, assets


@functools.lru_cache(maxsize=1)
def _calibrated_head_scale() -> float:
    """Volume-calibration factor for the synthetic head meshes.

    Solves for the uniform scale s such that the compiled head body mass
    (from the three massful synthetic head meshes at the XML density 0.713)
    makes the head subtree mass match the documented value. Mesh mass scales
    as s^3.
    """
    mujoco = _require_mujoco()
    xml, assets = load_reference_assets()
    assets = dict(assets)
    assets.update(_meshes.synthesize_meshes(head_scale=1.0))
    m = mujoco.MjModel.from_xml_string(xml, assets)
    head_id = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, 'head')
    head_body_mass = float(m.body_mass[head_id])
    children_mass = float(m.body_subtreemass[head_id]) - head_body_mass
    target_body_mass = _meshes.HEAD_SUBTREE_MASS - children_mass
    if target_body_mass <= 0:
        raise RuntimeError('Head children mass exceeds target subtree mass.')
    return float(np.cbrt(target_body_mass / head_body_mass))


def fly_xml_and_assets(
        assets_dir: str | None = None) -> tuple[str, dict[str, bytes]]:
    """Reference XML plus complete (patched) asset dict."""
    xml, assets = load_reference_assets(assets_dir)
    assets = dict(assets)
    assets.update(
        _meshes.synthesize_meshes(head_scale=_calibrated_head_scale()))
    return xml, assets


def compile_mj_model(xml: str | None = None,
                     assets: dict[str, bytes] | None = None):
    """Compile the (patched) fly XML into a mujoco.MjModel."""
    mujoco = _require_mujoco()
    if xml is None:
        xml, assets = fly_xml_and_assets()
    return mujoco.MjModel.from_xml_string(xml, assets or {})


# -----------------------------------------------------------------------------
# Extraction: mjModel -> FlyModel.


def _names(m, objtype, n) -> tuple[str, ...]:
    import mujoco
    return tuple(
        mujoco.mj_id2name(m, objtype, i) or f'_{i}' for i in range(n))


def _body_depths(parentid: np.ndarray) -> np.ndarray:
    depth = np.zeros(len(parentid), dtype=np.int64)
    for b in range(1, len(parentid)):
        depth[b] = depth[parentid[b]] + 1
    return depth


def _ancestor_doubling(parentid: np.ndarray) -> tuple[tuple[int, ...], ...]:
    """Pointer-doubling tables: anc[k][b] = ancestor of b, 2^k hops up."""
    depth = _body_depths(parentid)
    max_depth = int(depth.max())
    levels = max(1, int(np.ceil(np.log2(max(2, max_depth)))))
    anc = [parentid.copy()]
    while len(anc) < levels:
        prev = anc[-1]
        anc.append(prev[prev])
    return tuple(tuple(int(x) for x in a) for a in anc)


def _body_dof_mask(m) -> np.ndarray:
    """mask[b, i] = 1 iff dof i belongs to body b or one of its ancestors."""
    mask = np.zeros((m.nbody, m.nv))
    for b in range(m.nbody):
        cur = b
        while cur != 0:
            adr, num = m.body_dofadr[cur], m.body_dofnum[cur]
            if num > 0:
                mask[b, adr:adr + num] = 1.0
            cur = m.body_parentid[cur]
    return mask


def _dof_prefix_mask(m) -> np.ndarray:
    """mask[i, j] = 1 iff dof j contributes to the spatial velocity "seen"
    by dof i when computing cdofdot.

    Follows the mj_comVel accumulation order: parent-body dofs first, then
    joints of the same body in order; within a free joint the 3 rotational
    dofs all see the (common) velocity including the translational dofs;
    within a ball joint the 3 dofs see the velocity before the joint.
    """
    mask = np.zeros((m.nv, m.nv))
    body_prefix: list[np.ndarray] = [np.zeros(m.nv)]
    for b in range(1, m.nbody):
        prefix = body_prefix[m.body_parentid[b]].copy()
        for j in range(m.body_jntadr[b],
                       m.body_jntadr[b] + m.body_jntnum[b]):
            jtype = m.jnt_type[j]
            adr = m.jnt_dofadr[j]
            if jtype == 0:  # FREE
                # Translational dofs: cdofdot = 0; they do not read a prefix.
                prefix = prefix.copy()
                prefix[adr:adr + 3] = 1.0
                for i in range(adr + 3, adr + 6):
                    mask[i] = prefix
                prefix = prefix.copy()
                prefix[adr + 3:adr + 6] = 1.0
            elif jtype == 1:  # BALL
                for i in range(adr, adr + 3):
                    mask[i] = prefix
                prefix = prefix.copy()
                prefix[adr:adr + 3] = 1.0
            else:  # SLIDE or HINGE
                mask[adr] = prefix
                prefix = prefix.copy()
                prefix[adr] = 1.0
        body_prefix.append(prefix)
    return mask


def _tendon_matrices(m) -> tuple[np.ndarray, np.ndarray]:
    """Dense coupling matrices for fixed tendons."""
    import mujoco
    ten_J = np.zeros((m.ntendon, m.nv))
    ten_Lq = np.zeros((m.ntendon, m.nq))
    for t in range(m.ntendon):
        adr, num = m.tendon_adr[t], m.tendon_num[t]
        for w in range(adr, adr + num):
            if m.wrap_type[w] != mujoco.mjtWrap.mjWRAP_JOINT:
                raise NotImplementedError(
                    'Only fixed (joint-coupled) tendons are supported.')
            j = m.wrap_objid[w]
            coef = m.wrap_prm[w]
            ten_J[t, m.jnt_dofadr[j]] += coef
            ten_Lq[t, m.jnt_qposadr[j]] += coef
    return ten_J, ten_Lq


def _actuator_moment(m) -> np.ndarray:
    """Constant transmission moment matrix for joint/tendon actuators."""
    ten_J, _ = _tendon_matrices(m)
    moment = np.zeros((m.nu, m.nv))
    for u in range(m.nu):
        trntype = m.actuator_trntype[u]
        gear = m.actuator_gear[u, 0]
        tid = m.actuator_trnid[u, 0]
        if trntype == 0:  # joint
            jtype = m.jnt_type[tid]
            if jtype not in (2, 3):  # slide/hinge only
                raise NotImplementedError(
                    'Joint actuators on free/ball joints not supported.')
            moment[u, m.jnt_dofadr[tid]] = gear
        elif trntype == 3:  # tendon
            moment[u] = gear * ten_J[tid]
        elif trntype == 5:  # adhesion: enters via the contact solver
            pass
        else:
            raise NotImplementedError(f'Transmission type {trntype}.')
    return moment


def extract(m) -> _spec.FlyModel:
    """Extract a FlyModel from a compiled mujoco.MjModel (float64)."""
    import mujoco

    f = np.asarray

    meta = _spec.Meta(
        nq=m.nq, nv=m.nv, nu=m.nu, na=m.na, nbody=m.nbody, njnt=m.njnt,
        ngeom=m.ngeom, nsite=m.nsite, ncam=m.ncam, ntendon=m.ntendon,
        nsensor=m.nsensor, nsensordata=m.nsensordata, nkey=m.nkey,
        body_parentid=tuple(map(int, m.body_parentid)),
        body_rootid=tuple(map(int, m.body_rootid)),
        body_jntadr=tuple(map(int, m.body_jntadr)),
        body_jntnum=tuple(map(int, m.body_jntnum)),
        body_dofadr=tuple(map(int, m.body_dofadr)),
        body_dofnum=tuple(map(int, m.body_dofnum)),
        body_geomadr=tuple(map(int, m.body_geomadr)),
        body_geomnum=tuple(map(int, m.body_geomnum)),
        body_weldid=tuple(map(int, m.body_weldid)),
        body_anc=_ancestor_doubling(np.asarray(m.body_parentid)),
        max_jnt_per_body=int(max(m.body_jntnum.max(), 1)),
        jnt_type=tuple(map(int, m.jnt_type)),
        jnt_qposadr=tuple(map(int, m.jnt_qposadr)),
        jnt_dofadr=tuple(map(int, m.jnt_dofadr)),
        jnt_bodyid=tuple(map(int, m.jnt_bodyid)),
        jnt_limited=tuple(map(bool, m.jnt_limited)),
        dof_bodyid=tuple(map(int, m.dof_bodyid)),
        dof_jntid=tuple(map(int, m.dof_jntid)),
        geom_type=tuple(map(int, m.geom_type)),
        geom_bodyid=tuple(map(int, m.geom_bodyid)),
        geom_contype=tuple(map(int, m.geom_contype)),
        geom_conaffinity=tuple(map(int, m.geom_conaffinity)),
        geom_condim=tuple(map(int, m.geom_condim)),
        geom_priority=tuple(map(int, m.geom_priority)),
        geom_group=tuple(map(int, m.geom_group)),
        geom_sameframe=tuple(map(int, m.geom_sameframe)),
        geom_fluid_active=tuple(
            bool(x) for x in (np.asarray(m.geom_fluid).reshape(
                m.ngeom, -1)[:, 0] != 0)),
        site_bodyid=tuple(map(int, m.site_bodyid)),
        site_sameframe=tuple(map(int, m.site_sameframe)),
        cam_bodyid=tuple(map(int, m.cam_bodyid)),
        actuator_trntype=tuple(map(int, m.actuator_trntype)),
        actuator_trnid=tuple(int(x[0]) for x in m.actuator_trnid),
        actuator_dyntype=tuple(map(int, m.actuator_dyntype)),
        actuator_gaintype=tuple(map(int, m.actuator_gaintype)),
        actuator_biastype=tuple(map(int, m.actuator_biastype)),
        actuator_actadr=tuple(map(int, m.actuator_actadr)),
        exclude_pairs=tuple(
            (int(sig >> 16), int(sig & 0xffff))
            for sig in np.asarray(m.exclude_signature).reshape(-1)),
        sensor_type=tuple(map(int, m.sensor_type)),
        sensor_objid=tuple(map(int, m.sensor_objid)),
        sensor_adr=tuple(map(int, m.sensor_adr)),
        sensor_dim=tuple(map(int, m.sensor_dim)),
        integrator=int(m.opt.integrator),
        cone=int(m.opt.cone),
        solver_iterations=int(m.opt.iterations),
        ls_iterations=int(m.opt.ls_iterations),
        noslip_iterations=int(m.opt.noslip_iterations),
        disableflags=int(m.opt.disableflags),
        body_names=_names(m, mujoco.mjtObj.mjOBJ_BODY, m.nbody),
        jnt_names=_names(m, mujoco.mjtObj.mjOBJ_JOINT, m.njnt),
        geom_names=_names(m, mujoco.mjtObj.mjOBJ_GEOM, m.ngeom),
        site_names=_names(m, mujoco.mjtObj.mjOBJ_SITE, m.nsite),
        actuator_names=_names(m, mujoco.mjtObj.mjOBJ_ACTUATOR, m.nu),
        sensor_names=_names(m, mujoco.mjtObj.mjOBJ_SENSOR, m.nsensor),
        tendon_names=_names(m, mujoco.mjtObj.mjOBJ_TENDON, m.ntendon),
        cam_names=_names(m, mujoco.mjtObj.mjOBJ_CAMERA, m.ncam),
    )

    ten_J, ten_Lq = _tendon_matrices(m)

    # act index maps.
    act_actuator_id = np.full((max(m.na, 1),), -1, dtype=np.int32)
    actuator_act_adr = np.asarray(m.actuator_actadr, dtype=np.int32)
    for u in range(m.nu):
        if m.actuator_actadr[u] >= 0:
            # The fly model's stateful actuators have actnum == 1.
            act_actuator_id[m.actuator_actadr[u]] = u
    if m.na == 0:
        act_actuator_id = np.zeros((0,), dtype=np.int32)

    return _spec.FlyModel(
        meta=meta,
        timestep=f(m.opt.timestep),
        gravity=f(m.opt.gravity),
        density=f(m.opt.density),
        viscosity=f(m.opt.viscosity),
        wind=f(m.opt.wind),
        opt_tolerance=f(m.opt.tolerance),
        opt_impratio=f(m.opt.impratio),
        qpos0=f(m.qpos0),
        qpos_spring=f(m.qpos_spring),
        key_qpos=f(m.key_qpos).reshape(m.nkey, m.nq) if m.nkey else
        np.zeros((0, m.nq)),
        body_pos=f(m.body_pos),
        body_quat=f(m.body_quat),
        body_ipos=f(m.body_ipos),
        body_iquat=f(m.body_iquat),
        body_mass=f(m.body_mass),
        body_subtreemass=f(m.body_subtreemass),
        body_inertia=f(m.body_inertia),
        body_invweight0=f(m.body_invweight0),
        jnt_pos=f(m.jnt_pos),
        jnt_axis=f(m.jnt_axis),
        jnt_range=f(m.jnt_range),
        jnt_stiffness=f(m.jnt_stiffness),
        jnt_solref=f(m.jnt_solref),
        jnt_solimp=f(m.jnt_solimp),
        jnt_margin=f(m.jnt_margin),
        dof_armature=f(m.dof_armature),
        dof_damping=f(m.dof_damping),
        dof_invweight0=f(m.dof_invweight0),
        dof_frictionloss=f(m.dof_frictionloss),
        body_dof_mask=_body_dof_mask(m),
        dof_prefix_mask=_dof_prefix_mask(m),
        geom_pos=f(m.geom_pos),
        geom_quat=f(m.geom_quat),
        geom_size=f(m.geom_size),
        geom_rbound=f(m.geom_rbound),
        geom_friction=f(m.geom_friction),
        geom_margin=f(m.geom_margin),
        geom_gap=f(m.geom_gap),
        geom_solref=f(m.geom_solref),
        geom_solimp=f(m.geom_solimp),
        geom_solmix=f(m.geom_solmix),
        geom_fluid=f(m.geom_fluid).reshape(m.ngeom, -1),
        site_pos=f(m.site_pos),
        site_quat=f(m.site_quat),
        site_size=f(m.site_size),
        cam_pos=f(m.cam_pos),
        cam_quat=f(m.cam_quat),
        cam_fovy=f(m.cam_fovy),
        ten_J=ten_J,
        ten_Lq=ten_Lq,
        ten_range=f(m.tendon_range) if m.ntendon else np.zeros((0, 2)),
        ten_limited=f(m.tendon_limited).astype(np.float64)
        if m.ntendon else np.zeros((0,)),
        ten_stiffness=f(m.tendon_stiffness) if m.ntendon else np.zeros((0,)),
        ten_damping=f(m.tendon_damping) if m.ntendon else np.zeros((0,)),
        ten_lengthspring=f(m.tendon_lengthspring).reshape(m.ntendon, -1)
        if m.ntendon else np.zeros((0, 2)),
        ten_solref=f(m.tendon_solref_lim) if m.ntendon else np.zeros((0, 2)),
        ten_solimp=f(m.tendon_solimp_lim) if m.ntendon else np.zeros((0, 5)),
        ten_margin=f(m.tendon_margin) if m.ntendon else np.zeros((0,)),
        actuator_gainprm=f(m.actuator_gainprm),
        actuator_biasprm=f(m.actuator_biasprm),
        actuator_dynprm=f(m.actuator_dynprm),
        actuator_ctrlrange=f(m.actuator_ctrlrange),
        actuator_forcerange=f(m.actuator_forcerange),
        actuator_forcelimited=f(m.actuator_forcelimited).astype(np.float64),
        actuator_gear0=f(m.actuator_gear[:, 0]),
        actuator_moment=_actuator_moment(m),
        act_actuator_id=act_actuator_id,
        actuator_act_adr=actuator_act_adr,
        sensor_cutoff=f(m.sensor_cutoff),
    )


def build_fly_model(xml: str | None = None,
                    assets: dict[str, bytes] | None = None):
    """Compile the fly model and return (FlyModel, mujoco.MjModel)."""
    m = compile_mj_model(xml, assets)
    return extract(m), m
