"""Dynamic state pytree for the TPU-native engine.

`Data` mirrors the role of MuJoCo's mjData: the dynamic state (qpos, qvel,
act, ctrl) plus everything derived from it by the forward pipeline. All
fields are device arrays with static shapes; `Data` instances vmap/jit/scan
cleanly. Fields not yet computed are None (an empty pytree node).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from flybody_tpu.model.spec import FlyModel


@struct.dataclass
class Data:
    # Primary state.
    time: jax.Array
    qpos: jax.Array  # (nq,)
    qvel: jax.Array  # (nv,)
    act: jax.Array  # (na,)
    ctrl: jax.Array  # (nu,)

    # Accelerations / actuation state derivatives.
    qacc: Optional[jax.Array] = None  # (nv,)
    act_dot: Optional[jax.Array] = None  # (na,)

    # Kinematics.
    xpos: Optional[jax.Array] = None  # (nbody, 3)
    xquat: Optional[jax.Array] = None  # (nbody, 4)
    xmat: Optional[jax.Array] = None  # (nbody, 3, 3)
    xipos: Optional[jax.Array] = None  # (nbody, 3)
    ximat: Optional[jax.Array] = None  # (nbody, 3, 3)
    geom_xpos: Optional[jax.Array] = None  # (ngeom, 3)
    geom_xmat: Optional[jax.Array] = None  # (ngeom, 3, 3)
    site_xpos: Optional[jax.Array] = None  # (nsite, 3)
    site_xmat: Optional[jax.Array] = None  # (nsite, 3, 3)
    subtree_com: Optional[jax.Array] = None  # (nbody, 3)
    jnt_xanchor: Optional[jax.Array] = None  # (njnt, 3)
    jnt_xaxis: Optional[jax.Array] = None  # (njnt, 3)

    # CoM-based quantities.
    cdof: Optional[jax.Array] = None  # (nv, 6)
    cinert: Optional[jax.Array] = None  # (nbody, 6, 6)
    cvel: Optional[jax.Array] = None  # (nbody, 6)
    cdof_dot: Optional[jax.Array] = None  # (nv, 6)

    # Mass matrix (dense) and its Cholesky factor.
    qM: Optional[jax.Array] = None  # (nv, nv)
    qLD: Optional[jax.Array] = None  # (nv, nv) lower-triangular factor

    # Forces.
    qfrc_bias: Optional[jax.Array] = None  # (nv,)
    qfrc_passive: Optional[jax.Array] = None  # (nv,)
    qfrc_fluid: Optional[jax.Array] = None  # (nv,)
    qfrc_actuator: Optional[jax.Array] = None  # (nv,)
    qfrc_applied: Optional[jax.Array] = None  # (nv,)
    xfrc_applied: Optional[jax.Array] = None  # (nbody, 6) (force; torque)*
    qfrc_smooth: Optional[jax.Array] = None  # (nv,)
    qfrc_constraint: Optional[jax.Array] = None  # (nv,)

    # Actuation.
    actuator_force: Optional[jax.Array] = None  # (nu,)
    actuator_moment: Optional[jax.Array] = None  # (nu, nv) incl. adhesion

    # Tendons.
    ten_length: Optional[jax.Array] = None  # (ntendon,)
    ten_velocity: Optional[jax.Array] = None  # (ntendon,)

    # Sensors.
    sensordata: Optional[jax.Array] = None  # (nsensordata,)
    # Sum of |contact-frame force| over fly self-contacts
    # (reference fruitfly.py:687-704 self_contact observable).
    self_contact_force: Optional[jax.Array] = None  # ()

    # Contacts (filled by the collision/solver modules).
    contact: Any = None

    def strip(self) -> 'Data':
        """Primary state only (derived fields reset to None).

        Use as the carry in lax.scan substep loops: the stripped pytree has
        the same structure as a fresh make_data() output, so scan carries
        stay structure-stable while XLA dead-code-eliminates the derived
        fields of intermediate steps.
        """
        return Data(time=self.time, qpos=self.qpos, qvel=self.qvel,
                    act=self.act, ctrl=self.ctrl, qacc=self.qacc,
                    qfrc_applied=self.qfrc_applied,
                    xfrc_applied=self.xfrc_applied)


def make_data(model: FlyModel, dtype: Any = None) -> Data:
    """Fresh Data at qpos0 with zero velocities and controls."""
    dtype = dtype or model.qpos0.dtype
    meta = model.meta
    return Data(
        time=jnp.zeros((), dtype),
        qpos=jnp.asarray(model.qpos0, dtype),
        qvel=jnp.zeros((meta.nv,), dtype),
        act=jnp.zeros((meta.na,), dtype),
        ctrl=jnp.zeros((meta.nu,), dtype),
    )
