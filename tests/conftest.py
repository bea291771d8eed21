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

# Persistent compile cache: the suite is compile-dominated (the coupling
# tests alone spent ~9 min of XLA CPU compiles per run in round 2).
_cache = os.environ.get("RB_TEST_CACHE",
                        os.path.join(os.path.dirname(__file__), "..",
                                     ".jax_test_cache"))
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# don't persist XLA:CPU AOT blobs — reloading them spams a target-feature
# mismatch error line per executable on this machine
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
