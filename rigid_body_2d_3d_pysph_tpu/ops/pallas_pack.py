"""Pallas TPU pack-expansion kernel: cell-sorted fields -> dense slots.

The contact kernel consumes a field-major dense layout ``dfT
[NC, F, 128]`` (slot rows, fields as sublanes, M particle lanes +
sentinel pad).  Producing it from per-particle arrays with an XLA
gather is LATENCY-bound: an [NC*M]-row random gather costs ~14 ns/row
(~25 ms at 1M particles on v5e) regardless of row width, plus ~6.6 ms
for the field-major transpose.

This kernel replaces both.  The grid build carries the pack fields
through its cell sort (``cellpairs.build_cell_grid_packed``, ~+3 ms for
9 payload operands), after which each dense slot is a CONTIGUOUS run of
sorted rows: slot ``s`` covers sorted positions ``[base[s],
base[s]+cnt[s])``.  Per program (``_BP`` consecutive slots) the kernel

1. DMAs the covering sorted window (``W`` lanes, 128-aligned, sequential
   HBM reads — consecutive slots advance by at most M lanes, so the
   window is statically bounded),
2. places lanes with ONE one-hot MXU contraction ``win[F, W] x
   P[W, BP*M]`` (P is the slot-expansion one-hot, built from the SMEM
   base/cnt block),
3. writes each slot's ``[F, 128]`` block (sentinel-padded lanes).

Unoccupied tail slots (cnt == 0) come out all-sentinel, which the
contact kernel's gates treat exactly like the XLA pack's sentinel rows.
Bandwidth-bound by the dfT write (~330 MB at 1M) instead of
latency-bound: measured ~2 ms at 1M vs ~32 ms for gather+transpose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cellpairs import CellGridConfig, PackTables
from .pallas_exact import dot_data_onehot

_BP = 64  # slots per program (amortizes Mosaic dispatch, bounds W;
#           measured at 1M: 16 -> 5.1 ms, 32 -> 5.5, 64 -> 4.6, 128 -> 4.9,
#           all bit-identical)


def _expand_kernel(F, M, W, sent, n_occ_ref, tbl_now, tbl_nxt,
                   dfs_hbm, out_ref, scratch, sems):
    nb = W // 128
    c = pl.program_id(0)
    nprog = pl.num_programs(0)

    def start(buf, b0):
        blk = b0 // 128
        for j in range(nb):
            pltpu.make_async_copy(dfs_hbm.at[blk + j], scratch.at[buf, j],
                                  sems.at[buf, j]).start()

    @pl.when(c == 0)
    def _():
        start(0, tbl_now[0, 0])

    # prefetch the next program's window before waiting on this one's
    @pl.when(c + 1 < nprog)
    def _():
        start((c + 1) % 2, tbl_nxt[0, 0])

    buf = c % 2
    blk0 = tbl_now[0, 0] // 128
    for j in range(nb):
        pltpu.make_async_copy(dfs_hbm.at[blk0 + j], scratch.at[buf, j],
                              sems.at[buf, j]).wait()
    win = jnp.concatenate([scratch[buf, j] for j in range(nb)],
                          axis=1)                        # [F, W]

    ws = blk0 * 128
    lane_m = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    tgts, vals = [], []
    for b in range(_BP):
        tgts.append(tbl_now[b, 0] - ws + lane_m)
        vals.append(jnp.where(lane_m < tbl_now[b, 1], 1.0, 0.0))
    tgt = jnp.concatenate(tgts, axis=1)                  # [1, BP*M]
    validf = jnp.concatenate(vals, axis=1)               # [1, BP*M]
    iw = jax.lax.broadcasted_iota(jnp.int32, (W, _BP * M), 0)
    P = jnp.where((iw == tgt) & (validf > 0.0), 1.0, 0.0)  # [W, BP*M]
    # exact one-hot placement: Mosaic's DEFAULT MXU pass truncates win
    # to bf16 when F > 8 sublanes (observed: 3D's 9-field pack came out
    # bf16-rounded while 2D's 7-field pack was exact) — see
    # ops/pallas_exact.py
    placed = dot_data_onehot(
        win, P, (((1,), (0,)), ((), ())))                # [F, BP*M]
    # per-field sentinel column from scalar literals (Pallas kernels
    # cannot close over array constants)
    sent_col = jnp.concatenate(
        [jnp.full((1, 1), float(s), jnp.float32) for s in sent], axis=0)
    placed = placed + sent_col * (1.0 - validf)
    pad = jnp.broadcast_to(sent_col, (F, 128 - M))
    for b in range(_BP):
        out_ref[b] = jnp.concatenate(
            [placed[:, b * M:(b + 1) * M], pad], axis=1)


def expand_dft_pallas(pt: PackTables, n_occ, cfg: CellGridConfig,
                      sentinels, interpret: bool = False,
                      extra_rows: int = 0):
    """Expand cell-sorted pack fields into ``dfT [NCe, F, 128]``.

    ``NCe`` covers the contact kernel's program padding plus one extra
    block: rows up to ``ceil(min(n_occ, NC)/_BP)*_BP + _BP`` are written
    (occupied slots expanded, the rest all-sentinel); the row at index
    ``min(n_occ, NC)`` is always a valid all-sentinel row — callers remap
    missing-neighbor entries (== NC) there.  ``extra_rows`` widens the
    dynamic coverage to ``n_occ + extra_rows`` (the row-window kernel's
    run DMAs read up to ``max_run`` rows past the last window)."""
    F = len(pt.sorted_fields)
    if len(sentinels) != F:
        raise ValueError(f"{len(sentinels)} sentinels for {F} fields")
    M = cfg.M
    NC = cfg.NC_max
    n = pt.sorted_fields[0].shape[0]
    W = -(-((_BP + 1) * M + 127) // 128) * 128
    NCp = -(-NC // _BP) * _BP
    NCe = NCp + _BP

    # sorted fields -> [NBLK, F, 128] HBM blocks (lane-major; the pad
    # tail carries sentinels so over-reads near n_valid gate to nothing)
    Npad = (-(-n // 128)) * 128 + W
    cols = [jnp.concatenate([jnp.asarray(p, jnp.float32),
                             jnp.full((Npad - n,), s, jnp.float32)])
            for p, s in zip(pt.sorted_fields, sentinels)]
    dfs = jnp.stack(cols, axis=0)                        # [F, Npad]
    nblk = Npad // 128
    dfs = jnp.swapaxes(dfs.reshape(F, nblk, 128), 0, 1)  # [NBLK, F, 128]

    # one [NCe, 2] SMEM table: row s = (base[s], cnt[s]) — Mosaic wants
    # rank-2 SMEM blocks with >= 8 rows, like the contact kernel's
    # neighbor tables
    base = jnp.concatenate(
        [pt.base, jnp.broadcast_to(pt.n_valid, (NCe - NC,))]).astype(
            jnp.int32)
    cnt = jnp.concatenate(
        [pt.cnt, jnp.zeros((NCe - NC,), jnp.int32)]).astype(jnp.int32)
    tbl = jnp.stack([base, cnt], axis=1)

    kern = functools.partial(_expand_kernel, F, M, W, list(sentinels))
    nprog_static = NCe // _BP
    # cover every slot up to and including the sentinel row at n_occ
    n_occ_i = jnp.minimum(
        jnp.maximum(jnp.asarray(n_occ, jnp.int32), 0), NC)
    nprog_dyn = jnp.minimum((n_occ_i + extra_rows) // _BP + 1,
                            nprog_static)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprog_dyn,),
        in_specs=[
            pl.BlockSpec((_BP, 2), lambda c, s: (c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_BP, 2),
                         lambda c, s: (jnp.minimum(c + 1,
                                                   nprog_static - 1), 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_BP, F, 128), lambda c, s: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, W // 128, F, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, W // 128)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NCe, F, 128), jnp.float32),
        interpret=interpret,
    )(n_occ_i.reshape(1), tbl, tbl, dfs)
    return out
