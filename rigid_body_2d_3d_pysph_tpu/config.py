"""Global precision / platform configuration.

The reference runs float64 throughout (PySPH carrays are C doubles).
TPUs natively compute in float32/bfloat16; float64 is unsupported on the
MXU.  We therefore make the working dtype a process-level switch:

* ``float32`` (default) — the TPU performance configuration,
* ``float64`` — the validation configuration (CPU backend; used by the
  parity tests against the reference's float64 semantics).

Selecting float64 requires ``jax.config.update('jax_enable_x64', True)``
*before* any arrays are created; ``enable_x64()`` does this.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Persistent XLA compilation cache.  On this class of machine a cold XLA
# compile costs O(10-100 s) of wall time, so every entry point (tests,
# benchmarks, case scripts) shares one on-disk cache.  Override with
# RB_TPU_CACHE_DIR; disable with RB_TPU_CACHE_DIR="".
# ---------------------------------------------------------------------------
# Platform override: the axon TPU plugin ignores JAX_PLATFORMS, so we
# honor RB_TPU_PLATFORM (e.g. "cpu") via the config API, which works.
_platform = os.environ.get("RB_TPU_PLATFORM")
if _platform:
    jax.config.update("jax_platforms", _platform)

_cache_dir = os.environ.get(
    "RB_TPU_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
if _cache_dir:
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        # don't persist XLA:CPU AOT blobs: reloading them on a host with
        # different CPU features prints a loud error per executable (the
        # cached StableHLO->executable mapping is what saves the time)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:  # older jax versions: best effort
        pass

_DTYPE = jnp.float64 if os.environ.get("RB_TPU_X64", "0") == "1" else jnp.float32

if os.environ.get("RB_TPU_X64", "0") == "1":
    jax.config.update("jax_enable_x64", True)


def enable_x64() -> None:
    """Switch the framework (and JAX) to float64. Call before building scenes."""
    global _DTYPE
    jax.config.update("jax_enable_x64", True)
    _DTYPE = jnp.float64


def set_dtype(dtype) -> None:
    global _DTYPE
    if dtype == jnp.float64:
        enable_x64()
    else:
        _DTYPE = jnp.dtype(dtype)


def float_dtype():
    """The working floating dtype for particle/body state."""
    return _DTYPE


def int_dtype():
    return jnp.int32
