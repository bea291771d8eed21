"""Exact one-hot MXU contractions for Pallas TPU kernels.

Mosaic lowers a DEFAULT-precision f32 ``dot_general`` as a single MXU
pass, truncating BOTH operands to bf16 (observed: the 3D 9-field pack
and the contact kernel's query/pick dots came out bf16-rounded, while
the same dots with <= 8 sublanes took an exact path — see
scripts/dbg_spill3d_dft.py).  ``Precision.HIGHEST`` is exact but splits
both operands (6 passes); per-operand precision is unsupported
(`NotImplementedError` in mosaic/lowering.py).

For the kernels' contractions one operand is always a 0/1 one-hot
matrix — exactly representable in bf16 — so only the DATA operand
needs splitting.  ``split3`` decomposes f32 data into three
bf16-representable f32 parts (hi/mid/lo, 8 mantissa bits each,
hi+mid+lo == data exactly); three DEFAULT passes against the one-hot
operand are then exact:

* selection dots (exactly one 1 per output element — the pack
  expansion, the query transpose, the closest-source pick): the result
  is hi + mid + lo of a single lane = the original f32 value,
  BIT-exact;
* accumulation dots (many selected lanes): each product is exact and
  accumulation is f32, i.e. at-least-f32-accurate (the result is a
  reassociated f32 sum, not bit-identical to a sequential sum — same
  contract as any MXU f32 reduction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split3(data):
    """f32 -> (hi, mid, lo) f32 parts, each bf16-representable, summing
    bit-exactly to ``data``.  Standard Dekker-style: each rounding
    residual is exactly representable in f32."""
    hi = data.astype(jnp.bfloat16).astype(jnp.float32)
    r = data - hi
    mid = r.astype(jnp.bfloat16).astype(jnp.float32)
    lo = r - mid
    return hi, mid, lo


def dot_data_onehot(data, onehot, dimension_numbers, data_is_lhs=True):
    """``dot_general`` with one f32 DATA operand and one 0/1 one-hot
    operand, exact at 3 MXU passes (vs 6 for Precision.HIGHEST).

    Bit-exact when each output element selects at most one lane of
    ``data``; otherwise an f32-accurate (reassociated) accumulation.
    """
    parts = split3(data)
    out = None
    for p in parts:
        lhs, rhs = (p, onehot) if data_is_lhs else (onehot, p)
        d = jax.lax.dot_general(
            lhs, rhs, dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.float32)
        out = d if out is None else out + d
    return out
