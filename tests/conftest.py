"""Test configuration.

Tests run on the CPU backend in float64 so that numeric oracles match the
reference's double-precision semantics, with an 8-device virtual host
platform for the sharding tests (see the multichip dry-run contract).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
os.environ["RB_TPU_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
