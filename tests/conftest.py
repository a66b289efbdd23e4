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
