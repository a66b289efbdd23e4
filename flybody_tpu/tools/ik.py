"""Multi-site inverse kinematics via autodiff gradient descent.

Counterpart of the reference IK (flybody/inverse_kinematics.py:14-304),
which minimizes ||site_xpos(qpos) - targets||^2 + alpha * ||qpos - qpos0||^2
by momentum gradient descent on hand-assembled MuJoCo Jacobians. With the
differentiable FK engine the Jacobians come from jax.grad, and the whole
optimization jits and vmaps over batches of IK problems.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.model.spec import FlyModel
from flybody_tpu.physics import kinematics as kin
from flybody_tpu.physics.state import make_data
from flybody_tpu.physics.smooth import integrate_pos


def qpos_from_site_xpos(model: FlyModel,
                        site_ids,
                        target_xpos,
                        qpos_init=None,
                        reg_strength: float = 0.1,
                        lr: float = 0.05,
                        momentum: float = 0.9,
                        iterations: int = 200):
    """Solve for qpos placing `site_ids` at `target_xpos`.

    Args:
        model: compiled FlyModel.
        site_ids: static tuple/array of site indices.
        target_xpos: (S, 3) target world positions.
        qpos_init: initial configuration (default model.qpos0).
        reg_strength: weight of the ||qpos - qpos_init|| regularizer.
        lr, momentum, iterations: optimizer settings.

    Returns:
        (qpos, final_error): the solution and per-site residual norms.
    """
    site_ids = np.asarray(site_ids)
    q0 = model.qpos0 if qpos_init is None else jnp.asarray(qpos_init)
    dtype = q0.dtype
    target = jnp.asarray(target_xpos, dtype)

    def objective_from_dq(dq, qpos_base):
        # Parameterize by a tangent step to stay quaternion-consistent.
        qpos = integrate_pos(model, qpos_base, dq, 1.0)
        data = make_data(model).replace(qpos=qpos)
        fkd, _, _ = kin.fwd_position_smooth(model, data)
        sites = fkd.site_xpos[site_ids]
        err = jnp.sum((sites - target) ** 2)
        reg = reg_strength * jnp.sum(dq ** 2)
        return err + reg, qpos

    grad_fn = jax.grad(lambda dq, qb: objective_from_dq(dq, qb)[0])

    def body(_, carry):
        qpos, vel = carry
        dq0 = jnp.zeros((model.meta.nv,), dtype)
        g = grad_fn(dq0, qpos)
        vel = momentum * vel - lr * g
        qpos = integrate_pos(model, qpos, vel, 1.0)
        return qpos, vel

    qpos, _ = jax.lax.fori_loop(
        0, iterations, body,
        (q0, jnp.zeros((model.meta.nv,), dtype)))
    data = make_data(model).replace(qpos=qpos)
    fkd, _, _ = kin.fwd_position_smooth(model, data)
    err = jnp.linalg.norm(fkd.site_xpos[site_ids] - target, axis=-1)
    return qpos, err
