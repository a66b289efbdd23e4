"""Test configuration: JAX on a virtual 8-device CPU mesh with x64 enabled.

Parity tests compare the TPU-native engine against CPU MuJoCo (float64), so
tests run in float64 on CPU. TPU deployment uses float32/bfloat16 specs; the
engine code is dtype-polymorphic.
"""

import os

# Must be set before jax initializes its backends.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("FLYBODY_TPU_TESTS"):
    # Opt-in accelerator lane (tests/test_tpu_kernels.py): run compiled
    # (non-interpret) pallas kernels on whatever accelerator is present
    # so Mosaic miscompiles are caught by a test, not a training crash.
    # Everything else skips itself under this lane (no x64 on TPU).
    pass
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


# ---------------------------------------------------------------- fast lane
# `pytest -m fast` is the sub-10-minute smoke split (structure, routing,
# one parity probe per stage, trainer tiny-config, checkpoint resume).
# The full suite (~45 min solo) stays the default; heavyweight sweeps are
# marked slow. Centralized here so the split is easy to retune from
# --durations data without touching test files.
FAST_NODES = (
    "tests/test_model_spec.py",
    "tests/test_quaternions.py",
    "tests/test_kinematics.py",
    "tests/test_replay.py",
    "tests/test_vision_parity.py",
    "tests/test_smooth.py",
    "tests/test_checkpoint_resume.py",
    "tests/test_surgery.py::test_body_part_configs_compile_and_step",
    "tests/test_surgery.py::test_action_routing_matches_ctrl",
    "tests/test_surgery.py::test_filterexact_dyntype",
    "tests/test_contacts.py::test_compact_collide_efc_equivalence",
    "tests/test_envs.py::test_template_env",
)


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    for item in items:
        nid = item.nodeid
        path = nid.split("::")[0]
        if any(nid.startswith(p) for p in FAST_NODES) or path in FAST_NODES:
            item.add_marker(_pytest.mark.fast)
