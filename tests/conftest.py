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

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
