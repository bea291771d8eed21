"""Test configuration.

Tests run on the LOCAL CPU backend in float64 so numeric oracles match
the reference's double-precision semantics, with an 8-device virtual
platform for the sharding tests.

NOTE: on this machine the axon TPU plugin registers itself as the
default backend and ignores the ``JAX_PLATFORMS`` environment variable;
``jax.config.update('jax_platforms', 'cpu')`` is the reliable way to
force local CPU (and local, fast XLA compiles).
"""

import os

os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
os.environ["RB_TPU_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
