"""Shared helpers for parity tests against CPU MuJoCo ground truth."""

import numpy as np


def random_qpos(m, rng: np.random.RandomState, scale: float = 1.0):
    """Random configuration: joint angles within ranges, random root pose."""
    qpos = m.qpos0.copy()
    for j in range(m.njnt):
        t = int(m.jnt_type[j])
        adr = int(m.jnt_qposadr[j])
        if t in (2, 3):  # slide/hinge
            lo, hi = m.jnt_range[j]
            if m.jnt_limited[j]:
                qpos[adr] = rng.uniform(lo + 0.05 * (hi - lo),
                                        hi - 0.05 * (hi - lo))
            else:
                qpos[adr] = rng.uniform(-0.5, 0.5) * scale
        elif t == 1:  # ball
            q = rng.randn(4)
            qpos[adr:adr + 4] = q / np.linalg.norm(q)
        elif t == 0:  # free
            qpos[adr:adr + 3] = m.qpos0[adr:adr + 3] + 0.3 * rng.randn(3)
            q = rng.randn(4)
            qpos[adr + 3:adr + 7] = q / np.linalg.norm(q)
    return qpos


def random_qvel(m, rng: np.random.RandomState, scale: float = 1.0):
    return scale * rng.randn(m.nv)


def quat_sign_align(q, q_ref):
    """Flip quaternion signs to match reference hemisphere."""
    sign = np.sign(np.sum(q * q_ref, axis=-1, keepdims=True))
    sign = np.where(sign == 0, 1.0, sign)
    return q * sign
