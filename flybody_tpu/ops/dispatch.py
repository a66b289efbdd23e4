"""Pallas dispatch gate.

Each hot op has a plain-XLA fallback used off-TPU; this gate additionally
lets the TPU path be disabled per kernel via the environment variable
FLYBODY_NO_PALLAS — a comma-separated subset of {chol, noslip, mpr,
linesearch, arrow, newton, narrow, posstage, forcestage, sensstage,
efcstage} or 'all'. Used to bisect runtime faults (is it a Mosaic kernel or XLA?) and
to A/B kernel performance without code edits.

The whole-stage fusion kernels (posstage, forcestage, sensstage) are ON
by default (compiled lane 7/7 green on v5e); FLYBODY_STAGE_FUSION=0 (or
false/no/off) disables the group for A/B runs and fault bisection.
"""

from __future__ import annotations

import os

import jax


def _disabled() -> frozenset[str]:
    v = os.environ.get('FLYBODY_NO_PALLAS', '').strip().lower()
    if not v:
        return frozenset()
    if v == 'all':
        return frozenset({'chol', 'noslip', 'mpr', 'linesearch',
                          'arrow', 'newton', 'narrow', 'posstage',
                          'forcestage', 'sensstage', 'efcstage'})
    return frozenset(p.strip() for p in v.split(',') if p.strip())


# The whole-stage fusion kernels (default ON since the compiled lane
# went 7/7 green on v5e, 2026-08-18): FLYBODY_STAGE_FUSION=0/false
# disables them as a group (equivalent to listing
# posstage,forcestage,sensstage in FLYBODY_NO_PALLAS).
_STAGE_FUSION = frozenset({'posstage', 'forcestage', 'sensstage',
                           'efcstage'})


def _env_falsy(var: str) -> bool:
    return os.environ.get(var, '').strip().lower() in (
        '0', 'false', 'no', 'off')


def pallas_enabled(name: str) -> bool:
    """True if the named pallas kernel should run (TPU backend, not
    disabled via FLYBODY_NO_PALLAS, and — for the stage-fusion
    kernels — FLYBODY_STAGE_FUSION not set falsy)."""
    if name in _disabled():
        return False
    if name in _STAGE_FUSION and _env_falsy('FLYBODY_STAGE_FUSION'):
        return False
    try:
        return jax.default_backend() == 'tpu'
    except RuntimeError:  # pragma: no cover - uninitialized backend
        return False
