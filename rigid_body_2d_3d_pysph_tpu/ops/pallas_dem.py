"""Fused Pallas TPU kernels for the DEM LVC-displacement pipeline.

One kernel program per occupied slot batch evaluates, entirely in VMEM,
what the XLA cell engine (``dem_cell.lvc_displacement_cell``) plus the
separate ``dem.prune_contact_table`` pass spread over several
HBM-materialized [R, K, L] tensors: the Luding LVC pair force
(reference ``code/dem.py:35-205``), the tangential contact-table prune
(:208-293), slot matching, new-slot allocation, and the table
writeback.  The XLA formulation's [R, K, L] match/alloc intermediates
have an L=8 minor dim (16x tile padding on TPU) and its per-slot
writeback makes 5L masked sweeps over [R, K] in HBM; here the L axis is
a statically unrolled register loop over [M, OM] vregs.

Two slot layouts share the pair body (``_dem_pair_body``):

* the SPILLOVER cell grid (``cellpairs``): one program per _B cells,
  query block [M, F] + table [M, 5L] gather-packed, 9/27-stencil source
  blocks DMA'd per cell (``lvc_displacement_cell_pallas``);
* the ROW-WINDOW grid (``rowwin``): slots are M=8 consecutive sorted
  particles of one row, sources are R=3/9 CONTIGUOUS slot runs fetched
  with one sequential DMA each, and queries/tables ride the build's
  cell sort into two expanded field-major packs (no gather anywhere).
  For DEM's tiny contact radius this cuts candidate pair lanes ~3x vs
  the spillover grid (production default on TPU,
  ``lvc_displacement_rowwin_pallas``).

Prune fusion: the standalone prune frees slots whose pair no longer
overlaps (or changed dem id).  Any still-overlapping pair is
necessarily within the grid cutoff, so it appears among this cell's
candidates and is re-matched here; a slot NOT matched by any gated
candidate is exactly a slot the prune would free.  Freed slots are
available to new contacts in the same step, matching the reference's
prune -> evaluate group order.  (Requires cfg.radius >= 2*max(rad_s),
asserted by the wrapper.)

Layout per program (all f32; int-valued fields ride as exact f32):

* query block   ``[M, F]``   (BlockSpec over the packed [NC, M, F], or
  a one-hot MXU transpose of the window pack's own rows),
* query tables  ``[M, 5L]``  (idx | dem | sx | sy | sz, L lanes each),
* source block  ``[F, OM]``  DMA'd with a 2-deep revolving buffer (as
  ``pallas_contact._kernel``),
* new-contact ranks via one [M, OM] x [OM, OM] strictly-lower
  triangular MXU contraction (prefix count along the candidate axis),
* per-entity materials (kn/kt/alpha/mu) + dt from an SMEM params block.

Equivalence with prune+``lvc_displacement_cell`` is covered by
tests/test_pallas_dem.py (interpret mode) and on-TPU by bench/case
runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cellpairs import CellGrid, CellGridConfig
from .pallas_exact import dot_data_onehot

_BIG = 1.0e9

# packed f32 field order
(_DX, _DY, _DZ, _DU, _DV, _DW, _DWX, _DWY, _DWZ, _DRAD, _DM, _DDEM,
 _DIDX) = range(13)
_NF = 13
_SENT = [_BIG, _BIG, _BIG, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
         -1.0, -1.0]


_B = 8  # cells per kernel program (amortizes Mosaic grid-step dispatch;
#         see pallas_contact._B)


def _dem_pair_body(L, E, cutoff, q, tab, sL, params_ref,
                   src_valid=None, mxu=None):
    """The full LVC pair computation for one query block: force +
    table match/prune/alloc/writeback, shared by the spill-grid and
    row-window kernels (they differ only in how q/tab/sL are staged).

    ``q`` [M, F>=13] query fields, ``tab`` [M, 5L] contact table,
    ``sL`` [F>=13, OM] source fields (lane-major).  ``src_valid``
    ([1, OM] bool, optional) masks lanes fetched beyond a source run's
    true length (the row-window layout DMAs fixed max_run-slot runs;
    the overhang slots belong to OTHER rows already covered by their
    own run and would double-count).  ``mxu`` (optional dict of
    block-diag ones matrices, built once per program) switches the
    table/force reductions from VPU lane-sums to batched MXU
    contractions — see the in-body comment.  Returns the [M, 8 + 5L]
    output columns."""
    M = q.shape[0]
    dt = params_ref[0, 4]

    def qcol(f):
        return q[:, f:f + 1]          # [M, 1]

    def srow(f):
        return sL[f:f + 1, :]         # [1, OM]

    def tcol(block, l):
        return tab[:, block * L + l:block * L + l + 1]  # [M, 1]

    # ---- pair geometry --------------------------------------------
    xij = qcol(_DX) - srow(_DX)
    yij = qcol(_DY) - srow(_DY)
    zij = qcol(_DZ) - srow(_DZ)
    rij = jnp.sqrt(xij * xij + yij * yij + zij * zij)
    idx_row = srow(_DIDX)
    if src_valid is not None:
        idx_row = jnp.where(src_valid, idx_row, -1.0)
    j_s = jnp.broadcast_to(idx_row, rij.shape)        # [M, OM]
    dem_s = jnp.broadcast_to(srow(_DDEM), rij.shape)
    overlap = qcol(_DRAD) + srow(_DRAD) - rij
    cand = (j_s >= 0.0) & (j_s != qcol(_DIDX)) & (rij <= cutoff)
    gate = cand & (rij > 0.0) & (overlap > 0.0)

    # ---- per-source materials (entity count is tiny/static) -------
    kn = jnp.zeros_like(rij)
    kt = jnp.zeros_like(rij)
    alpha = jnp.zeros_like(rij)
    mu = jnp.zeros_like(rij)
    for e in range(E):
        m_e = dem_s == float(e)
        kn = jnp.where(m_e, params_ref[e, 0], kn)
        kt = jnp.where(m_e, params_ref[e, 1], kt)
        alpha = jnp.where(m_e, params_ref[e, 2], alpha)
        mu = jnp.where(m_e, params_ref[e, 3], mu)

    # ---- LVC normal force (dem.py lvc_displacement_core) ----------
    rinv = 1.0 / jnp.maximum(rij, 1e-30)
    nx, ny, nz = xij * rinv, yij * rinv, zij * rinv
    a_i = qcol(_DRAD) - overlap * 0.5
    a_j = srow(_DRAD) - overlap * 0.5
    vi_x = qcol(_DU) + (qcol(_DWY) * nz - qcol(_DWZ) * ny) * a_i
    vi_y = qcol(_DV) + (qcol(_DWZ) * nx - qcol(_DWX) * nz) * a_i
    vi_z = qcol(_DW) + (qcol(_DWX) * ny - qcol(_DWY) * nx) * a_i
    vj_x = srow(_DU) + (-srow(_DWY) * nz + srow(_DWZ) * ny) * a_j
    vj_y = srow(_DV) + (-srow(_DWZ) * nx + srow(_DWX) * nz) * a_j
    vj_z = srow(_DW) + (-srow(_DWX) * ny + srow(_DWY) * nx) * a_j
    vij_x, vij_y, vij_z = vi_x - vj_x, vi_y - vj_y, vi_z - vj_z
    vdotn = vij_x * nx + vij_y * ny + vij_z * nz
    vt_x = vij_x - vdotn * nx
    vt_y = vij_y - vdotn * ny
    vt_z = vij_z - vdotn * nz
    m_q = qcol(_DM)
    m_s = srow(_DM)
    m_eff = m_q * m_s / jnp.maximum(m_q + m_s, 1e-30)
    eta_n = alpha * jnp.sqrt(m_eff)
    fn = kn * overlap - eta_n * vdotn
    fn_x, fn_y, fn_z = fn * nx, fn * ny, fn * nz

    # ---- slot match (prune fused: unmatched slots free) -----------
    found = jnp.zeros_like(gate)
    eq_ls = []                          # [M, OM] per slot
    sx = jnp.zeros_like(rij)
    sy = jnp.zeros_like(rij)
    sz = jnp.zeros_like(rij)
    one = jnp.ones_like(rij)
    zero = jnp.zeros_like(rij)
    for l in range(L):
        # idx alone keys the match: a particle's dem_id is static,
        # so (idx, dem) pairs never collide on idx (the reference's
        # dem-changed prune at dem.py:246 can never fire)
        eq = gate & (j_s == tcol(0, l))
        eq_ls.append(eq)
        found = found | eq
        sx = jnp.where(eq, jnp.broadcast_to(tcol(2, l), rij.shape), sx)
        sy = jnp.where(eq, jnp.broadcast_to(tcol(3, l), rij.shape), sy)
        sz = jnp.where(eq, jnp.broadcast_to(tcol(4, l), rij.shape), sz)

    # spring projected onto the current contact plane (:156-161)
    sdotn = sx * nx + sy * ny + sz * nz
    sx, sy, sz = sx - sdotn * nx, sy - sdotn * ny, sz - sdotn * nz

    ft_x = -kt * sx - eta_n * vt_x
    ft_y = -kt * sy - eta_n * vt_y
    ft_z = -kt * sz - eta_n * vt_z
    ft_magn = jnp.sqrt(ft_x * ft_x + ft_y * ft_y + ft_z * ft_z)
    has_t = ft_magn > 1e-12
    inv_ft = jnp.where(has_t, 1.0 / jnp.maximum(ft_magn, 1e-30), 0.0)
    tx, ty, tz = ft_x * inv_ft, ft_y * inv_ft, ft_z * inv_ft
    fn_mu = mu * fn
    slip = ft_magn > fn_mu
    ft_x = jnp.where(slip, fn_mu * tx, ft_x)
    ft_y = jnp.where(slip, fn_mu * ty, ft_y)
    ft_z = jnp.where(slip, fn_mu * tz, ft_z)
    kt_inv = 1.0 / jnp.where(kt > 0.0, kt, 1.0)
    new_sx = jnp.where(slip, -kt_inv * (fn_mu * tx + eta_n * vt_x),
                       sx + vt_x * dt)
    new_sy = jnp.where(slip, -kt_inv * (fn_mu * ty + eta_n * vt_y),
                       sy + vt_y * dt)
    new_sz = jnp.where(slip, -kt_inv * (fn_mu * tz + eta_n * vt_z),
                       sz + vt_z * dt)
    # new contacts contribute no tangential force this step (:140-148)
    ft_x = jnp.where(found, ft_x, 0.0)
    ft_y = jnp.where(found, ft_y, 0.0)
    ft_z = jnp.where(found, ft_z, 0.0)

    # ---- new-slot allocation --------------------------------------
    OM = rij.shape[1]
    new_mask = gate & ~found
    new_f = jnp.where(new_mask, 1.0, 0.0)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (OM, OM), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (OM, OM), 1)
    strict_lt = jnp.where(row_i < col_i, 1.0, 0.0)     # [OM, OM]
    new_rank = jax.lax.dot_general(
        new_f, strict_lt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [M, OM]

    if mxu is not None:
        # ---- batched-MXU reductions (row-window path) -------------
        # At M=8 a single VPU lane-reduce costs ~7 shuffle steps, and
        # the table logic needs ~7L+6 of them per window — batching
        # them as block-diag-ones MXU contractions moves ~60% of the
        # kernel's VPU work onto the (otherwise idle) MXU.  Counts ride
        # DEFAULT dots (0/1 is bf16-exact); f32 values and the encoded
        # idx selection go through the 3-pass exact dot.
        dims = (((1,), (0,)), ((), ()))
        f1, f0 = jnp.float32(1), jnp.float32(0)
        eqf = [jnp.where(e, f1, f0) for e in eq_ls]
        cnts = jax.lax.dot_general(
            jnp.concatenate(eqf, axis=1), mxu["bd_cnt"],
            dimension_numbers=dims,
            preferred_element_type=jnp.float32)        # [M, L]
        any_f = jnp.where(cnts > 0.0, f1, f0)
        free_f = 1.0 - any_f
        li = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        lj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
        fr = jax.lax.dot_general(
            free_f, jnp.where(li < lj, f1, f0),
            dimension_numbers=dims,
            preferred_element_type=jnp.float32)        # [M, L] prefix
        n_free = fr[:, L - 1:L] + free_f[:, L - 1:L]
        ok_new = new_mask & (new_rank < n_free)
        takesf = [jnp.where(ok_new & (new_rank == fr[:, l:l + 1])
                            & (free_f[:, l:l + 1] > 0.0), f1, f0)
                  for l in range(L)]
        tcnts = jax.lax.dot_general(
            jnp.concatenate(takesf, axis=1), mxu["bd_cnt"],
            dimension_numbers=dims,
            preferred_element_type=jnp.float32)        # [M, L]
        any_n = jnp.where(tcnts > 0.0, f1, f0)

        gf = jnp.where(gate, f1, f0)
        vals = ([e * new_sx for e in eqf] + [e * new_sy for e in eqf]
                + [e * new_sz for e in eqf]
                + [gf * (fn_x + ft_x), gf * (fn_y + ft_y),
                   gf * (fn_z + ft_z),
                   gf * ((ny * ft_z - nz * ft_y) * a_i),
                   gf * ((nz * ft_x - nx * ft_z) * a_i),
                   gf * ((nx * ft_y - ny * ft_x) * a_i)])
        vs = dot_data_onehot(jnp.concatenate(vals, axis=1),
                             mxu["bd_val"], dims)      # [M, 3L+6]
        sxs = vs[:, 0:L]
        sys_ = vs[:, L:2 * L]
        szs = vs[:, 2 * L:3 * L]
        fsum = vs[:, 3 * L:3 * L + 6]

        if mxu["enc_ok"]:
            # one exact selection dot for (idx, dem): enc = 8*idx+dem
            # stays f32-exact for idx < 2^20 (checked by the wrapper)
            enc = j_s * 8.0 + jnp.maximum(dem_s, 0.0)
            es = dot_data_onehot(
                jnp.concatenate([t * enc for t in takesf], axis=1),
                mxu["bd_cnt"], dims)                   # [M, L]
            eidx = jnp.floor(es * 0.125)
            edem = es - 8.0 * eidx
        else:
            es = dot_data_onehot(
                jnp.concatenate([t * j_s for t in takesf]
                                + [t * dem_s for t in takesf], axis=1),
                mxu["bd_enc2"], dims)                  # [M, 2L]
            eidx, edem = es[:, :L], es[:, L:]

        t0 = tab[:, 0:L]
        t1 = tab[:, L:2 * L]
        idx_c = any_f * t0 + (1.0 - any_f) * (any_n * eidx
                                              + (any_n - 1.0))
        dem_c = any_f * t1 + (1.0 - any_f) * (any_n * edem
                                              + (any_n - 1.0))
        cnt = jnp.sum(jnp.where(idx_c >= 0.0, f1, f0), axis=1,
                      keepdims=True)
        return jnp.concatenate(
            [fsum, cnt, jnp.zeros((M, 1), jnp.float32),
             idx_c, dem_c, any_f * sxs, any_f * sys_, any_f * szs],
            axis=1)

    # ---- legacy VPU lane-reduces (spill-grid path) -----------------
    matched_l = [jnp.sum(jnp.where(e, one, zero), axis=1,
                         keepdims=True) > 0.0 for e in eq_ls]
    free_rank = jnp.zeros((M, 1), jnp.float32)
    free_ls, free_rank_ls = [], []
    for l in range(L):
        fr_l = jnp.where(matched_l[l], 0.0, 1.0)       # [M, 1]
        free_ls.append(fr_l > 0.0)
        free_rank_ls.append(free_rank)
        free_rank = free_rank + fr_l
    n_free = free_rank                                 # [M, 1]
    ok_new = new_mask & (new_rank < n_free)

    # ---- per-slot writeback + force sums --------------------------
    def lanesum(mask, v):
        return jnp.sum(jnp.where(mask, v, zero), axis=1,
                       keepdims=True)

    out_idx, out_dem, out_sx, out_sy, out_sz = [], [], [], [], []
    cnt = jnp.zeros((M, 1), jnp.float32)
    for l in range(L):
        takes = (ok_new & (new_rank == free_rank_ls[l])
                 & jnp.broadcast_to(free_ls[l], new_mask.shape))
        any_f = jnp.where(matched_l[l], 1.0, 0.0)
        any_n = jnp.where(lanesum(takes, one) > 0.0, 1.0, 0.0)
        eq = eq_ls[l]
        idx_l = (any_f * tcol(0, l) + (1.0 - any_f)
                 * (any_n * lanesum(takes, j_s) + (any_n - 1.0)))
        dem_l = (any_f * tcol(1, l) + (1.0 - any_f)
                 * (any_n * lanesum(takes, dem_s) + (any_n - 1.0)))
        out_idx.append(idx_l)
        out_dem.append(dem_l)
        out_sx.append(any_f * lanesum(eq, new_sx))
        out_sy.append(any_f * lanesum(eq, new_sy))
        out_sz.append(any_f * lanesum(eq, new_sz))
        cnt = cnt + jnp.where(idx_l >= 0.0, 1.0, 0.0)

    fx = lanesum(gate, fn_x + ft_x)
    fy = lanesum(gate, fn_y + ft_y)
    fz = lanesum(gate, fn_z + ft_z)
    trx = lanesum(gate, (ny * ft_z - nz * ft_y) * a_i)
    trY = lanesum(gate, (nz * ft_x - nx * ft_z) * a_i)
    trz = lanesum(gate, (nx * ft_y - ny * ft_x) * a_i)
    return jnp.concatenate(
        [fx, fy, fz, trx, trY, trz, cnt, jnp.zeros((M, 1), jnp.float32)]
        + out_idx + out_dem + out_sx + out_sy + out_sz, axis=1)


def _kernel(L, E, M, O, cutoff, n_occ_ref, q_ref, tab_ref, nbr_now,
            nbr_nxt, params_ref, dft_hbm, out_ref, scratch, sems):
    c = pl.program_id(0)
    n_occ = n_occ_ref[0]

    def start_dmas(buf, nbr_row, row):
        for o in range(O):
            pltpu.make_async_copy(
                dft_hbm.at[nbr_row[row, o]], scratch.at[buf, o],
                sems.at[buf, o]).start()

    @pl.when((c == 0) & (n_occ > 0))
    def _():
        start_dmas(0, nbr_now, 0)

    def compute(b):
        buf = b % 2
        for o in range(O):
            pltpu.make_async_copy(
                dft_hbm.at[nbr_now[b, o]], scratch.at[buf, o],
                sems.at[buf, o]).wait()
        q = q_ref[b]          # [M, F]
        tab = tab_ref[b]      # [M, 5L]
        sL = jnp.concatenate([scratch[buf, o][:, :M] for o in range(O)],
                             axis=1)  # [F, OM]
        return _dem_pair_body(L, E, cutoff, q, tab, sL, params_ref)

    base = c * _B
    for b in range(_B):
        g = base + b
        if b + 1 < _B:
            @pl.when(g + 1 < n_occ)
            def _(b=b):
                start_dmas((b + 1) % 2, nbr_now, b + 1)
        else:
            # g+1 < n_occ implies program c+1 is within the dynamic
            # grid bound, so nbr_nxt's block is the real next row
            @pl.when(g + 1 < n_occ)
            def _():
                start_dmas(0, nbr_nxt, 0)
        # slots >= n_occ are never referenced by dense_pos: leave their
        # out block unwritten (unpack never gathers it)
        @pl.when(g < n_occ)
        def _(b=b):
            out_ref[b] = compute(b)


def dem_sums_pallas(df, tab, src_l, params, n_occ, nbr_slots,
                    cfg: CellGridConfig, L: int, E: int,
                    interpret: bool = False):
    """Raw per-slot DEM outputs for every cell: [NC, M, 8+5L] f32
    (fx fy fz torx tory torz count pad | idx | dem | sx | sy | sz)."""
    NC, M, F = df.shape
    O = nbr_slots.shape[1]
    kern = functools.partial(_kernel, L, E, M, O, cfg.radius)
    W = 8 + 5 * L
    NCp = -(-NC // _B) * _B
    nprog = NCp // _B
    # dynamic grid bound: only programs covering occupied cells run
    n_occ_i = jnp.minimum(jnp.asarray(n_occ, jnp.int32), NCp)
    nprog_dyn = (jnp.maximum(n_occ_i, 0) + _B - 1) // _B
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprog_dyn,),
        in_specs=[
            pl.BlockSpec((_B, M, F), lambda c, n: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B, M, 5 * L), lambda c, n: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B, O), lambda c, n: (c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_B, O),
                         lambda c, n: (jnp.minimum(c + 1, nprog - 1), 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 8), lambda c, n: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_B, M, W), lambda c, n: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, O, F, -(-M // 128) * 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, O)),
        ],
    )
    slots = jnp.minimum(nbr_slots, NC).astype(jnp.int32)
    if NCp != NC:
        slots = jnp.concatenate(
            [slots, jnp.full((NCp - NC, O), NC, jnp.int32)], axis=0)
        df = jnp.concatenate(
            [df, jnp.broadcast_to(jnp.asarray(_SENT, df.dtype),
                                  (NCp - NC, M, F))], axis=0)
        tab = jnp.concatenate(
            [tab, jnp.full((NCp - NC, M, 5 * L), -1.0, tab.dtype)], axis=0)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NCp, M, W), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(n_occ, jnp.int32).reshape(1), df, tab, slots, slots,
      params, src_l)
    return out[:NC]


def lvc_displacement_cell_pallas(scene, grid: CellGrid,
                                 cfg: CellGridConfig, dt,
                                 tng_idx, tng_dem, tng_x, tng_y, tng_z,
                                 interpret: bool = False):
    """Drop-in for ``prune_contact_table`` + ``lvc_displacement_cell``:
    same returns (force/torque [N] + updated [N, L] table + count), with
    the prune fused into the kernel's slot matching."""
    from .cellpairs import pack_fields, pack_rows, unpack

    n = scene.n
    fdt = scene.x.dtype
    L = tng_idx.shape[1]
    E = int(scene.dem_kn.shape[0])
    if E > 8:
        raise NotImplementedError("pallas DEM kernel: > 8 dem entities")
    # prune fusion soundness: every overlapping pair must be a candidate
    # (checked only when rad_s is concrete — schemes call this under jit
    # with a config they built from the same scene)
    if not isinstance(scene.rad_s, jax.core.Tracer):
        assert cfg.radius >= 2.0 * float(jnp.max(scene.rad_s)), (
            "pallas DEM kernel requires cutoff >= 2*max(rad_s) so the "
            "fused prune sees every still-overlapping pair")

    ident = (scene.gid if "gid" in scene
             else jnp.arange(n, dtype=jnp.int32))
    df = pack_fields(
        grid, cfg,
        [scene.x, scene.y, scene.z, scene.u, scene.v, scene.w,
         scene.wx, scene.wy, scene.wz, scene.rad_s, scene.m,
         scene.dem_id.astype(fdt), ident.astype(fdt)],
        _SENT).astype(jnp.float32)
    tabs = [pack_rows(grid, cfg, tng_idx.astype(fdt), -1.0),
            pack_rows(grid, cfg, tng_dem.astype(fdt), -1.0),
            pack_rows(grid, cfg, tng_x, 0.0),
            pack_rows(grid, cfg, tng_y, 0.0),
            pack_rows(grid, cfg, tng_z, 0.0)]
    tab = jnp.concatenate(tabs, axis=2).astype(jnp.float32)

    NC, M, F = df.shape
    sent = jnp.broadcast_to(jnp.asarray(_SENT, df.dtype), (M, F))[None]
    dfT = jnp.swapaxes(jnp.concatenate([df, sent], axis=0), 1, 2)
    lane = -(-M // 128) * 128  # Mosaic DMA slices: 128-aligned minor dim
    if M < lane:
        pad = jnp.broadcast_to(
            jnp.asarray(_SENT, df.dtype)[None, :, None],
            (NC + 1, F, lane - M))
        dfT = jnp.concatenate([dfT, pad], axis=2)

    params = jnp.zeros((8, 8), jnp.float32)
    mat = jnp.stack([scene.dem_kn, scene.dem_kt, scene.dem_alpha,
                     scene.dem_mu], axis=1).astype(jnp.float32)  # [E, 4]
    params = params.at[:E, :4].set(mat)
    params = params.at[0, 4].set(jnp.asarray(dt, jnp.float32))

    dense = dem_sums_pallas(df, tab, dfT, params, grid.n_occupied,
                            grid.nbr_slots, cfg, L, E, interpret=interpret)
    return _unpack_dem_out(dense, grid, cfg, n, L, fdt)


def _unpack_dem_out(dense, grid, cfg, n, L, fdt):
    """[NC, M, 8+5L] kernel output -> per-particle returns (original
    order).  ``grid``/``cfg`` only need ``dense_pos`` / ``NC_max, M``
    (duck-typed: CellGrid or RowWinGrid)."""
    from .cellpairs import unpack

    # ONE [N]-row gather for all 8+5L columns (row gathers are
    # latency-bound: three separate unpacks cost 3x); dropped rows
    # (inactive/out-of-domain) must keep an EMPTY table, so the idx/dem
    # block's 0-fill is patched to -1 afterwards
    W = 8 + 5 * L
    flat = unpack(grid, cfg, dense[..., :W], n, 0.0)
    out = flat[:, :8].astype(fdt)
    dropped = grid.dense_pos >= cfg.NC_max * cfg.M
    tabi = jnp.where(dropped[:, None], -1.0, flat[:, 8:8 + 2 * L])
    tabf = flat[:, 8 + 2 * L:W].astype(fdt)

    fx, fy, fz = out[:, 0], out[:, 1], out[:, 2]
    trx, try_, trz = out[:, 3], out[:, 4], out[:, 5]
    count = out[:, 6].astype(jnp.int32)
    idx = tabi[:, 0:L].astype(jnp.int32)
    dem = tabi[:, L:2 * L].astype(jnp.int32)
    sx = tabf[:, 0:L]
    sy = tabf[:, L:2 * L]
    sz = tabf[:, 2 * L:3 * L]
    return (fx, fy, fz, trx, try_, trz, idx, dem, sx, sy, sz, count)


# ---------------------------------------------------------------------------
# row-window layout (production DEM path on TPU)
# ---------------------------------------------------------------------------

_BW = 32  # windows per program (small per-window compute at M=8)


def _bd_ones(K, OM):
    """[K*OM, K] block-diagonal ones: column k sums lanes
    [k*OM, (k+1)*OM) of a lane-concatenated batch."""
    r = jax.lax.broadcasted_iota(jnp.int32, (K * OM, K), 0) // OM
    c = jax.lax.broadcasted_iota(jnp.int32, (K * OM, K), 1)
    return jnp.where(r == c, jnp.float32(1), jnp.float32(0))


def _win_kernel(L, E, M, R, RUN, Fs, Ft, enc_ok, cutoff, n_occ_ref,
                qs_ref, qt_ref, runs_now, runs_nxt, params_ref,
                dfs_hbm, out_ref, scratch, sems):
    """One program per _BW row windows.  Each window's R source runs
    (RUN consecutive slots each) are fetched with ONE sequential DMA per
    run from the field-major source pack; query fields and contact
    tables are one-hot MXU transposes of the program's own pack rows
    (both packs ride the grid build's sort — no gathers anywhere)."""
    c = pl.program_id(0)
    n_occ = n_occ_ref[0]

    def start_dmas(buf, runs_row, row):
        for r in range(R):
            pltpu.make_async_copy(
                dfs_hbm.at[pl.ds(runs_row[row, r], RUN)],
                scratch.at[buf, r], sems.at[buf, r]).start()

    @pl.when((c == 0) & (n_occ > 0))
    def _():
        start_dmas(0, runs_now, 0)

    # exact one-hot transposes for ALL _BW windows at once
    isel = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (M, 128), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1), 1.0, 0.0)
    qs_all = dot_data_onehot(
        qs_ref[...].reshape(_BW * Fs, 128), isel,
        (((1,), (1,)), ((), ())), data_is_lhs=False)   # [M, _BW*Fs]
    qt_all = dot_data_onehot(
        qt_ref[...].reshape(_BW * Ft, 128), isel,
        (((1,), (1,)), ((), ())), data_is_lhs=False)   # [M, _BW*Ft]

    OM = R * RUN * M
    blk = jax.lax.broadcasted_iota(jnp.int32, (1, OM), 1) // M
    # block-diag reduction matrices, shared by the _BW windows
    mxu = {"bd_cnt": _bd_ones(L, OM),
           "bd_val": _bd_ones(3 * L + 6, OM),
           "enc_ok": enc_ok}
    if not enc_ok:
        mxu["bd_enc2"] = _bd_ones(2 * L, OM)

    def compute(b):
        buf = b % 2
        for r in range(R):
            pltpu.make_async_copy(
                dfs_hbm.at[pl.ds(runs_now[b, r], RUN)],
                scratch.at[buf, r], sems.at[buf, r]).wait()
        q = qs_all[:, b * Fs:(b + 1) * Fs]             # [M, Fs]
        tab = qt_all[:, b * Ft:b * Ft + 5 * L]         # [M, 5L]
        sL = jnp.concatenate(
            [scratch[buf, r, t][:, :M] for r in range(R)
             for t in range(RUN)], axis=1)             # [Fs, R*RUN*M]
        # mask lanes of run-overhang slots (they belong to other rows,
        # already covered by those rows' own runs)
        ok = jnp.zeros((1, OM), bool)
        for r in range(R):
            c_r = runs_now[b, R + r]
            ok = ok | ((blk >= r * RUN) & (blk < r * RUN + c_r))
        cols = _dem_pair_body(L, E, cutoff, q, tab, sL, params_ref,
                              src_valid=ok, mxu=mxu)
        W = cols.shape[1]
        Wp = out_ref.shape[2]
        if Wp != W:  # 128-align the copy-out
            cols = jnp.concatenate(
                [cols, jnp.zeros((M, Wp - W), jnp.float32)], axis=1)
        return cols

    base = c * _BW
    for b in range(_BW):
        g = base + b
        if b + 1 < _BW:
            @pl.when(g + 1 < n_occ)
            def _(b=b):
                start_dmas((b + 1) % 2, runs_now, b + 1)
        else:
            @pl.when(g + 1 < n_occ)
            def _():
                start_dmas(0, runs_nxt, 0)
        @pl.when(g < n_occ)
        def _(b=b):
            out_ref[b] = compute(b)


def lvc_displacement_rowwin_pallas(scene, cfg, dt,
                                   tng_idx, tng_dem, tng_x, tng_y,
                                   tng_z, interpret: bool = False):
    """DEM LVC step on the row-window grid: build (payload rides the
    sort), two pack expansions, fused kernel, unpack.  Same returns as
    :func:`lvc_displacement_cell_pallas` plus the built grid."""
    from . import pallas_pack
    from .rowwin import RowWinConfig, build_row_window_grid

    assert isinstance(cfg, RowWinConfig)
    n = scene.n
    fdt = scene.x.dtype
    L = tng_idx.shape[1]
    E = int(scene.dem_kn.shape[0])
    if E > 8:
        raise NotImplementedError("pallas DEM kernel: > 8 dem entities")
    if not isinstance(scene.rad_s, jax.core.Tracer):
        assert cfg.radius >= 2.0 * float(jnp.max(scene.rad_s)), (
            "pallas DEM kernel requires cutoff >= 2*max(rad_s) so the "
            "fused prune sees every still-overlapping pair")

    ident = (scene.gid if "gid" in scene
             else jnp.arange(n, dtype=jnp.int32))
    src_fields = [scene.x, scene.y, scene.z, scene.u, scene.v, scene.w,
                  scene.wx, scene.wy, scene.wz, scene.rad_s, scene.m,
                  scene.dem_id.astype(fdt), ident.astype(fdt)]
    tab_cols = ([tng_idx[:, l].astype(fdt) for l in range(L)]
                + [tng_dem[:, l].astype(fdt) for l in range(L)]
                + [tng_x[:, l] for l in range(L)]
                + [tng_y[:, l] for l in range(L)]
                + [tng_z[:, l] for l in range(L)])
    grid, pt = build_row_window_grid(scene.x, scene.y, scene.z,
                                     scene.active, cfg,
                                     src_fields + tab_cols)

    M = cfg.M
    R = cfg.R
    RUN = cfg.max_run
    NCW = cfg.NC_max
    zero = jnp.zeros((n,), jnp.float32)
    # source pack: 13 fields + 3 zero rows = 16 sublanes (2 f32 tiles)
    pt_src = pt._replace(sorted_fields=pt.sorted_fields[:_NF]
                         + (zero, zero, zero))
    sent_src = _SENT + [0.0, 0.0, 0.0]
    dfs = pallas_pack.expand_dft_pallas(pt_src, grid.n_occupied, cfg,
                                        sent_src, interpret=interpret,
                                        extra_rows=RUN)
    # table pack: 5L query-only rows
    pt_tab = pt._replace(sorted_fields=pt.sorted_fields[_NF:])
    sent_tab = [-1.0] * (2 * L) + [0.0] * (3 * L)
    dft = pallas_pack.expand_dft_pallas(pt_tab, grid.n_occupied, cfg,
                                        sent_tab, interpret=interpret)

    params = jnp.zeros((8, 8), jnp.float32)
    mat = jnp.stack([scene.dem_kn, scene.dem_kt, scene.dem_alpha,
                     scene.dem_mu], axis=1).astype(jnp.float32)
    params = params.at[:E, :4].set(mat)
    params = params.at[0, 4].set(jnp.asarray(dt, jnp.float32))

    Fs, Ft = _NF + 3, 5 * L
    W = 8 + 5 * L
    Wp = -(-W // 128) * 128
    NCp = -(-NCW // _BW) * _BW
    nprog = NCp // _BW
    n_occ_i = jnp.minimum(jnp.asarray(grid.n_occupied, jnp.int32), NCp)
    nprog_dyn = (jnp.maximum(n_occ_i, 0) + _BW - 1) // _BW
    # enc_ok: the idx/dem pair selection rides ONE exact dot when
    # 8*idx + dem stays below 2^23 (f32-exact integers); gid-keyed
    # scenes (slab shards) have no static idx bound, so they take the
    # two-dot path
    enc_ok = bool(8 * n + 8 <= (1 << 23)) and "gid" not in scene
    kern = functools.partial(_win_kernel, L, E, M, R, RUN, Fs, Ft,
                             enc_ok, cfg.radius)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprog_dyn,),
        in_specs=[
            pl.BlockSpec((_BW, Fs, 128), lambda c, s: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BW, Ft, 128), lambda c, s: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BW, 2 * R), lambda c, s: (c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_BW, 2 * R),
                         lambda c, s: (jnp.minimum(c + 1, nprog - 1), 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 8), lambda c, s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_BW, M, Wp), lambda c, s: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, R, RUN, Fs, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, R)),
        ],
    )
    # runs must stay DMA-safe: starts within the expanded rows; the
    # SMEM table carries (starts | counts) side by side
    starts = jnp.clip(grid.nbr_runs, 0, dfs.shape[0] - RUN).astype(
        jnp.int32)
    runs = jnp.concatenate([starts, grid.run_cnt.astype(jnp.int32)],
                           axis=1)                        # [NCW, 2R]
    if NCp != NCW:
        runs = jnp.concatenate(
            [runs, jnp.zeros((NCp - NCW, 2 * R), jnp.int32)], axis=0)
    # query BlockSpecs need NCp rows
    def pad_rows(a, sent):
        if a.shape[0] < NCp:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(
                    jnp.asarray(sent, a.dtype)[None, :, None],
                    (NCp - a.shape[0], a.shape[1], 128))], axis=0)
        return a[:NCp]

    qs = pad_rows(dfs, sent_src) if dfs.shape[0] < NCp else dfs[:NCp]
    qt = pad_rows(dft, sent_tab) if dft.shape[0] < NCp else dft[:NCp]
    dense = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NCp, M, Wp), jnp.float32),
        interpret=interpret,
    )(n_occ_i.reshape(1), qs, qt, runs, runs, params, dfs)
    return _unpack_dem_out(dense[:NCW], grid, cfg, n, L, fdt) + (grid,)
