"""Row-window grid: sorted M-particle windows with per-row slot runs.

The spillover cell grid (``cellpairs.py``) keys dense slots to CELLS;
when the interaction radius is much smaller than a comfortable bin size
(DEM grains: contact radius 2*rad_s vs bins sized for lane occupancy)
its per-query candidate set is the whole 3x3-bin stencil — measured
~50x the true in-cutoff pair count on the 100k-grain DEM benchmark.

This grid instead keys slots to consecutive WINDOWS of the cell-sorted
order, split at row boundaries (a "row" = one y-bin in 2D, one
(y,z)-bin in 3D):

* every slot holds exactly M consecutive sorted particles of one row
  (the last window of a row may be partial) — lane fill is ~100% by
  construction, with no per-cell occupancy tuning,
* a window's candidate sources are, for each of the R = 3 (2D) / 9 (3D)
  neighbor rows, the CONTIGUOUS sorted run of positions whose cell-x
  lies within [cxa-1, cxb+1] around the window's own x-span — the
  minimal 3-row band the cutoff requires, located with one searchsorted
  table (``P``),
* runs are stored as slot ids (window-granular): each is ``max_run``
  consecutive slots starting at ``nbr_runs[w, r]`` — consecutive slots
  are CONTIGUOUS in the field-major pack, so a pair kernel fetches a
  whole run with ONE sequential DMA instead of per-cell copies.

Bins are sized to the cutoff itself (cell = cutoff): the vertical band
is then exactly [y - cutoff, y + cutoff] at row granularity, and the
x-padding of each run is one cutoff.  On the DEM benchmark this cuts
candidate pair lanes ~3x and vector registers ~2.4x vs the spillover
grid (M=16, cell_factor 4).

Reference parity note: this changes only WHICH (query, source) pairs
are examined and their lane order, not the pair math; every pair within
the cutoff appears exactly once per (query, source) direction, as in
the reference's NNPS (``code/dem.py:35-205`` iterates real neighbor
lists).  f32 sums differ from the cell-grid engines only by summation
order.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .cellpairs import PackTables, _cell_keys


@dataclass(frozen=True)
class RowWinConfig:
    cell: float                 # bin size (== cutoff)
    M: int                      # window width (8: one f32 sublane group)
    NC_max: int                 # static window capacity:
    #                             ceil(n/M) + total rows (cannot overflow)
    origin: tuple               # grid AABB min corner (3,)
    dims: tuple                 # cells per axis (gx, gy, gz); gz=1 in 2D
    dim: int = 2
    cutoff: float = 0.0
    max_run: int = 4            # slots fetched per neighbor-row run
    sub: int = 1                # (for _cell_keys reuse; always 1)

    @property
    def R(self) -> int:
        return 3 if self.dim == 2 else 9

    @property
    def radius(self) -> float:
        return self.cutoff if self.cutoff > 0 else self.cell

    @property
    def n_cells_total(self) -> int:
        return int(np.prod(self.dims))

    @property
    def n_rows_total(self) -> int:
        gx, gy, gz = self.dims
        return int(gy * gz)


class RowWinGrid(NamedTuple):
    nbr_runs: jax.Array    # [NC_max, R] start slot of each row run
    run_cnt: jax.Array     # [NC_max, R] slots in each run (<= max_run);
    #                        slots past the count belong to OTHER rows
    #                        (already covered by their own run) and MUST
    #                        be masked by consumers to avoid duplicates
    dense_pos: jax.Array   # [N] window*M + lane per particle; NC*M = dropped
    n_occupied: jax.Array  # scalar int32 (windows)
    overflow: jax.Array    # scalar bool (domain exit or run > max_run)


def rowwin_config_from_positions(x, y, z, cutoff: float, dim: int,
                                 M: int = 8, slack: float = 0.35,
                                 max_run: int | None = None,
                                 capacity_boost: float = 1.0
                                 ) -> RowWinConfig:
    """Host-side sizing.  ``max_run`` defaults to the measured worst
    initial run length x1.5 (the Solver's overflow rebuild raises
    ``capacity_boost`` to grow it)."""
    cell = float(cutoff)
    x = np.asarray(x); y = np.asarray(y); z = np.asarray(z)
    pts = [x, y] + ([z] if dim == 3 else [])
    lo = np.array([p.min() for p in pts])
    hi = np.array([p.max() for p in pts])
    ext = np.maximum(hi - lo, cell)
    lo = lo - slack * ext - 2 * cell
    hi = hi + slack * ext + 2 * cell
    dims = [int(np.ceil((hi[i] - lo[i]) / cell)) + 2 for i in range(len(lo))]
    if dim == 2:
        origin = (float(lo[0]), float(lo[1]), 0.0)
        dims = (dims[0], dims[1], 1)
    else:
        origin = (float(lo[0]), float(lo[1]), float(lo[2]))
        dims = (dims[0], dims[1], dims[2])
    n = x.shape[0]
    NCW = -(-n // M) + int(dims[1]) * int(dims[2]) + 1
    cfg = RowWinConfig(cell=cell, M=M, NC_max=NCW, origin=origin,
                       dims=dims, dim=dim, cutoff=float(cutoff),
                       max_run=8)
    if max_run is None:
        worst = _worst_run_np(x, y, z, cfg)
        max_run = max(2, int(np.ceil(worst * 1.5 * capacity_boost)))
    return RowWinConfig(cell=cell, M=M, NC_max=NCW, origin=origin,
                        dims=dims, dim=dim, cutoff=float(cutoff),
                        max_run=int(max_run))


def _np_windows(x, y, z, cfg: RowWinConfig):
    """Numpy reference of the window/run layout (config sizing + tests).
    Returns (order, wbase, wcnt, wrow, wcxa, wcxb, runs[(w, r, sa, sb)])."""
    gx, gy, gz = cfg.dims
    ox, oy, oz = cfg.origin
    cx = np.floor((np.asarray(x) - ox) / cfg.cell).astype(np.int64)
    cy = np.floor((np.asarray(y) - oy) / cfg.cell).astype(np.int64)
    cz = (np.floor((np.asarray(z) - oz) / cfg.cell).astype(np.int64)
          if cfg.dim == 3 else np.zeros_like(cx))
    key = cx + gx * (cy + gy * cz)
    order = np.argsort(key, kind="stable")
    ks = key[order]
    rowid = ks // gx
    kx = ks % gx
    M = cfg.M
    wbase, wcnt, wrow, wcxa, wcxb = [], [], [], [], []
    i = 0
    n = len(ks)
    while i < n:
        j = i
        while (j < n and rowid[j] == rowid[i] and j - i < M):
            j += 1
        wbase.append(i); wcnt.append(j - i); wrow.append(rowid[i])
        wcxa.append(kx[i]); wcxb.append(kx[j - 1])
        i = j
    # P[c] = first sorted pos with key >= c
    runs = []
    offsets = ([(dy, 0) for dy in (-1, 0, 1)] if cfg.dim == 2 else
               [(dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1)])
    for w in range(len(wbase)):
        for (dy, dz) in offsets:
            r = wrow[w] + dy + gy * dz
            clo = r * gx + wcxa[w] - 1
            chi = r * gx + wcxb[w] + 2
            lo = np.searchsorted(ks, clo, side="left")
            hi = np.searchsorted(ks, chi, side="left")
            if hi <= lo:
                continue
            # positions -> slots of row r
            fp = np.searchsorted(ks, r * gx, side="left")
            wf = np.searchsorted(wbase, fp, side="left")
            sa = wf + (lo - fp) // M
            sb = wf + (hi - 1 - fp) // M + 1
            runs.append((w, r, sa, sb))
    return order, wbase, wcnt, wrow, wcxa, wcxb, runs


def _worst_run_np(x, y, z, cfg: RowWinConfig) -> int:
    runs = _np_windows(x, y, z, cfg)[6]
    return max((sb - sa for (_w, _r, sa, sb) in runs), default=1)


def build_row_window_grid(x, y, z, active, cfg: RowWinConfig, payload):
    """Sort by cell (payload rides as f32 operands), split row windows,
    and build the per-window run table.  Returns ``(RowWinGrid,
    PackTables)`` — the PackTables feed ``pallas_pack.expand_dft_pallas``
    unchanged (windows satisfy its base-monotonicity invariant)."""
    n = x.shape[0]
    gx, gy, gz = cfg.dims
    M = cfg.M
    NCW = cfg.NC_max
    key, dom_overflow, G = _cell_keys(x, y, z, active, cfg)

    idx = jnp.arange(n, dtype=jnp.int32)
    if len(payload) <= 12:
        ops = (key,) + tuple(jnp.asarray(p, jnp.float32)
                             for p in payload) + (idx,)
        res = jax.lax.sort(ops, num_keys=1)
        ks, order = res[0], res[-1]
        sorted_fields = res[1:-1]
    else:
        # wide payloads (DEM: 13 fields + 5L table columns) as sort
        # operands explode XLA's sort compile; sort (key, idx) and
        # permute the payload with ONE stacked row gather instead
        # (~14 ns/row on v5e — 1.5 ms at 100k)
        ks, order = jax.lax.sort_key_val(key, idx)
        stacked = jnp.stack(
            [jnp.asarray(p, jnp.float32) for p in payload], axis=-1)
        srt = jax.lax.optimization_barrier(stacked)[order]
        sorted_fields = tuple(srt[:, i] for i in range(len(payload)))
    valid = ks < G
    n_valid = jnp.sum(valid.astype(jnp.int32)).astype(jnp.int32)

    rowid = ks // jnp.int32(gx)
    headr = valid & jnp.concatenate(
        [jnp.ones(1, bool), rowid[1:] != rowid[:-1]])
    rstart = jax.lax.cummax(jnp.where(headr, idx, -1))
    lane = (idx - rstart) % M
    subhead = valid & (lane == 0)
    win = jnp.cumsum(subhead.astype(jnp.int32)) - 1
    n_occ = jnp.where(jnp.any(valid), win[-1] + 1, 0)

    # dense_pos (particle -> window*M + lane), back to original order by
    # a scatter.  (At the 1M scale BASELINE.md's "scatters cost a flat
    # ~9 ms/1M-update" rule prefers sorts; the row-window grid serves
    # the ~100k-class DEM workloads where an [n]-update scatter is
    # ~0.1 ms and a third sort is ~1.5 ms.)
    flat = jnp.where(valid & (win < NCW), win * M + lane, NCW * M)
    dense_pos = jnp.full(n, NCW * M, jnp.int32).at[order].set(
        flat, unique_indices=True)

    # per-window tables: scatter cell id / position at the window heads
    # (window ids are unique there)
    iw = jnp.arange(NCW, dtype=jnp.int32)
    wvalid = iw < jnp.minimum(n_occ, NCW)
    tgt = jnp.where(subhead, win, NCW)
    wcid_f = jnp.full(NCW + 1, G, jnp.int32).at[tgt].set(
        ks, mode="drop", unique_indices=True)[:NCW]
    wpos_f = jnp.full(NCW + 1, 0, jnp.int32).at[tgt].set(
        idx, mode="drop", unique_indices=True)[:NCW]
    wbase = jnp.where(wvalid, wpos_f, n_valid)
    wnext = jnp.concatenate([wbase[1:], n_valid[None]])
    wcnt = jnp.clip(jnp.where(wvalid, wnext - wbase, 0), 0, M)
    wrow = wcid_f // jnp.int32(gx)
    wcxa = wcid_f - wrow * jnp.int32(gx)
    lastp = jnp.clip(wbase + wcnt - 1, 0, n - 1)
    kl = ks.at[lastp].get(mode="clip")
    wcxb = jnp.where(wvalid, kl - (kl // jnp.int32(gx)) * jnp.int32(gx),
                     wcxa)

    # P[c] = first sorted pos with cell id >= c: scatter per-cell head
    # positions, then a reverse cummin (exact across empty cells/rows
    # because positions sort by (row, cx))
    headc = valid & jnp.concatenate(
        [jnp.ones(1, bool), ks[1:] != ks[:-1]])
    # non-head lanes target G+1 (dropped): G itself is a REAL row of H
    # (the P[G] sentinel), and duplicate in-bounds targets would make
    # unique_indices undefined
    H = jnp.full(G + 1, n_valid, jnp.int32).at[
        jnp.where(headc, ks, G + 1)].set(idx, mode="drop",
                                         unique_indices=True)
    P = jax.lax.cummin(H, reverse=True)                      # [G+1]

    # runs: for each neighbor row, the sorted band [ (r, cxa-1),
    # (r, cxb+2) ) mapped to window slots of that row
    offsets = ([dy for dy in (-1, 0, 1)] if cfg.dim == 2 else
               [dy + gy * dz for dz in (-1, 0, 1) for dy in (-1, 0, 1)])
    sent = jnp.minimum(n_occ, NCW)      # all-sentinel window row
    run_sa, run_ct, run_ovf = [], [], jnp.zeros((), bool)
    for off in offsets:
        r = wrow + jnp.int32(off)
        clo = jnp.clip(r * jnp.int32(gx) + wcxa - 1, 0, G)
        chi = jnp.clip(r * jnp.int32(gx) + wcxb + 2, 0, G)
        lo = P.at[clo].get(mode="clip")
        hi = P.at[chi].get(mode="clip")
        fp = P.at[jnp.clip(r * jnp.int32(gx), 0, G)].get(mode="clip")
        wf = win.at[jnp.clip(fp, 0, n - 1)].get(mode="clip")
        nonempty = wvalid & (hi > lo)
        sa = wf + (lo - fp) // M
        nsl = (hi - 1 - fp) // M + 1 - (lo - fp) // M
        run_ovf = run_ovf | jnp.any(nonempty & (nsl > cfg.max_run))
        run_sa.append(jnp.where(nonempty, sa, sent))
        run_ct.append(jnp.where(nonempty,
                                jnp.minimum(nsl, cfg.max_run), 0))
    nbr_runs = jnp.stack(run_sa, axis=1).astype(jnp.int32)   # [NCW, R]
    run_cnt = jnp.stack(run_ct, axis=1).astype(jnp.int32)    # [NCW, R]

    grid = RowWinGrid(nbr_runs=nbr_runs, run_cnt=run_cnt,
                      dense_pos=dense_pos, n_occupied=n_occ,
                      overflow=dom_overflow | run_ovf)
    pt = PackTables(sorted_fields=sorted_fields, base=wbase, cnt=wcnt,
                    n_valid=n_valid,
                    slot_cid=jnp.where(wvalid, wcid_f, G),
                    sorted_pid=order.astype(jnp.int32))
    return grid, pt
