"""Pallas dispatch gate.

Each hot op has a plain-XLA fallback used off-TPU; this gate additionally
lets the TPU path be disabled per kernel via the environment variable
FLYBODY_NO_PALLAS — a comma-separated subset of {chol, noslip, mpr,
linesearch, arrow, newton, narrow, posstage, forcestage, sensstage} or
'all'. Used to bisect runtime faults (is it a Mosaic kernel or XLA?) and
to A/B kernel performance without code edits.

The whole-stage fusion kernels (posstage, forcestage, sensstage) are
additionally gated behind the opt-in FLYBODY_STAGE_FUSION variable (see
_OPT_IN below); set it to 1/true to enable them once the compiled lane
(FLYBODY_TPU_TESTS=1 tests/test_tpu_kernels.py) is green on the target
chip. Falsy values ('', '0', 'false', 'no', 'off') leave them disabled.
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
                          'arrow', 'newton', 'narrow', 'posstage', 'forcestage', 'sensstage'})
    return frozenset(p.strip() for p in v.split(',') if p.strip())


# The whole-stage fusion kernels are opt-in until their Mosaic lowering
# is validated on real TPU: first compile attempts (2026-08-18) hit
# Mosaic NotImplemented gaps (>2-D gather, sublane+lane broadcast) that
# interpret-mode tests cannot catch. Set FLYBODY_STAGE_FUSION=1 to
# enable once a compiled-lane run (tests/test_tpu_kernels.py) is green.
_OPT_IN = frozenset({'posstage', 'forcestage', 'sensstage'})


def _env_truthy(var: str) -> bool:
    return os.environ.get(var, '').strip().lower() not in (
        '', '0', 'false', 'no', 'off')


def pallas_enabled(name: str) -> bool:
    """True if the named pallas kernel should run (TPU backend, not
    disabled via FLYBODY_NO_PALLAS, and — for the opt-in stage-fusion
    kernels — FLYBODY_STAGE_FUSION set truthy)."""
    if name in _disabled():
        return False
    if name in _OPT_IN and not _env_truthy('FLYBODY_STAGE_FUSION'):
        return False
    try:
        return jax.default_backend() == 'tpu'
    except RuntimeError:  # pragma: no cover - uninitialized backend
        return False
