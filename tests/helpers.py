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


def arrow_compatible_rows(part, rng: np.random.RandomState, B: int,
                          K: int, nv: int, scale: float = 0.3,
                          p_break: float = 0.3):
    """Random contact-Jacobian rows honoring the arrow-Hessian contract
    (physics/solver.py): rows that will carry hess_active=1 have support
    within the root dofs + ONE limb block; cross-limb rows are dense
    over two limbs and flagged break=1 (the packed Hessian truncates
    cross-limb blocks, so a dense row with hess_active=1 makes Hp
    indefinite). Returns (conJ (B,K,3,nv) f32, brk (B,K) f32)."""
    nlimb = len(part.los)
    conJ = np.zeros((B, K, 3, nv), np.float32)
    brk = np.zeros((B, K), np.float32)
    for b in range(B):
        for ki in range(K):
            if rng.rand() < p_break and nlimb >= 2:
                brk[b, ki] = 1.0
                for li in rng.choice(nlimb, 2, replace=False):
                    lo, d = part.los[li], part.ds[li]
                    conJ[b, ki, :, lo:lo + d] = rng.randn(3, d) * scale
            else:
                li = rng.randint(nlimb)
                lo, d = part.los[li], part.ds[li]
                conJ[b, ki, :, lo:lo + d] = rng.randn(3, d) * scale
            if part.nr:
                conJ[b, ki, :, :part.nr] = rng.randn(3, part.nr) * scale
    return conJ, brk
