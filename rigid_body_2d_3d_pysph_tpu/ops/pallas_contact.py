"""Fused Pallas TPU kernel for the full contact pair pipeline.

One kernel program per occupied cell computes, entirely in VMEM, what
the XLA cell engine spreads over two HBM-materialized passes
(``contact_cell.contact_sums_fused``): the Mofidi Eq. 22 normal sums,
the Eq. 21 distance sums, and the per-slot closest-point pick
(reference pair loops ``code/rigid_body_common.py:631-723`` and
``:726-836``).  The XLA formulation streams ~200 MB of [C, M, OM]
intermediates through HBM per cell chunk (quant tensors, one-hot
broadcasts, pick masks); here every pair matrix lives in registers/VMEM
and HBM sees only the packed inputs and the finalized [NC, M, 12*S] output.

Layout (per cell program, all f32):

* queries along SUBLANES — pair matrices are ``[M, OM]`` with M the
  cell capacity (multiple of 8, no sublane padding) and OM = O*M the
  stencil lanes,
* query block   ``[M, F]``  (BlockSpec over the packed ``[NC, M, F]``),
* source block  ``[F, OM]`` (fields as lane rows), pre-gathered by XLA
  through the grid's neighbor-slot table,
* slot reductions as TWO MXU contractions per cell, both with the
  one-hot right operand built lane-oriented (no transposes):
  1. ``[7M, OM] x [S, OM]^T`` — the seven per-pair quantities
     (t1*xij..t2*zij) against the source-entity one-hot,
  2. ``[M, OM] x [6S, OM]^T``  — closest-source field pick.
  The per-slot min/tie-break broadcasts are S-step select-accumulates
  (VPU), not contractions.
* unoccupied tail cells (slot >= n_occupied, the NC_max slack) skip all
  compute through a scalar-prefetch bound and write zeros.

Equivalence to the XLA engines is covered by
tests/test_pallas_contact.py (interpret mode on CPU) and on-TPU by the
validation/bench runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cellpairs import CellGrid, CellGridConfig, gather_source_block
from .pallas_exact import dot_data_onehot
from .kernels import Kernel

_BIG = 1.0e9

# packed f32 field order (shared with the host-side pack below).
# V = m/rho (the only use of m and rho is their ratio in Eq. 22's t1);
# FLAGS bit-packs dem_id*8 + is_boundary*4 + is_fluid*2 + is_rigid —
# pack/dfT/DMA bytes scale with F, and 9 fields beat 13 by ~30% of the
# pipeline's HBM traffic.
(_FX, _FY, _FZ, _FU, _FV, _FW, _FVOL, _FH, _FFLAGS) = range(9)
_NF = 9
_SENT = [_BIG, _BIG, _BIG, 0.0, 0.0, 0.0, 0.0, 1.0, -8.0]
# 2D pack: no z, no w (identically zero) — 7 fields fit ONE (8, 128)
# memory tile per dfT slot row, halving the stencil DMA tiles/bytes
_SENT_2D = [_BIG, _BIG, 0.0, 0.0, 0.0, 1.0, -8.0]


def sent_fields(two_d: bool):
    return _SENT_2D if two_d else _SENT


def pack_for_contact(scene, grid: CellGrid, cfg: CellGridConfig):
    """[NC_max, M, F] f32 query/source pack (sentinel lanes gate to
    zero).  7 fields in 2D, 9 in 3D."""
    from .cellpairs import pack_fields

    two_d = cfg.dim == 2
    dense = pack_fields(grid, cfg, contact_payload(scene, two_d),
                        sent_fields(two_d))
    return dense.astype(jnp.float32)


def _decode_flags(f):
    """flags f32 -> (dem_id, is_boundary, is_fluid, is_rigid), exact for
    dem_id < 2^20 (sentinel dem_id = -1 decodes as such)."""
    dem = jnp.floor(f * 0.125)
    r = f - 8.0 * dem
    bdry = jnp.floor(r * 0.25)
    r = r - 4.0 * bdry
    fluid = jnp.floor(r * 0.5)
    rigid = r - 2.0 * fluid
    return dem, bdry, fluid, rigid


_B = 16  # cells per kernel program (amortizes Mosaic grid-step dispatch:
#         measured ~0.5 us/program on v5e — 55 ms of a 119 ms kernel at
#         10^6 particles was pure dispatch+zero-write with 1 cell/program)


def _kernel(S, M, O, cutoff, init_dist, kernel: Kernel, two_d,
            n_occ_ref, q_ref, nbr_now, nbr_nxt, dft_hbm, out_ref,
            scratch, sems):
    """One program per _B consecutive cell slots.  Each cell's 9/27
    stencil source blocks are DMA'd dfT[slot] -> VMEM with a 2-deep
    revolving buffer (cell g+1's copies start before cell g's compute,
    crossing program boundaries) — XLA's equivalent pre-gather
    materializes a [NC, O, M, F] tensor in HBM whose gather alone costs
    more than this whole kernel at 10^6 particles."""
    c = pl.program_id(0)
    n_occ = n_occ_ref[0]
    # queries come from the SAME field-major dfT the sources do (the
    # query block is dfT's own slot row, pipelined by BlockSpec) — the
    # [M, F] slot-major pack the kernel used to read is gone entirely.
    # One exact one-hot MXU placement turns [F, 128] into [M, F].
    isel = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (M, 128), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1), 1.0, 0.0)

    def start_dmas(buf, nbr_row, row):
        # (skipping sentinel entries' DMAs behind pl.when guards and
        # substituting the sentinel constant in-register measured
        # SLOWER — the scalar branches cost more than the copies)
        for o in range(O):
            pltpu.make_async_copy(
                dft_hbm.at[nbr_row[row, o]], scratch.at[buf, o],
                sems.at[buf, o]).start()

    @pl.when((c == 0) & (n_occ > 0))
    def _():
        start_dmas(0, nbr_now, 0)

    # exact query transpose for ALL _B cells in ONE 3-pass one-hot dot
    # ([M, 128] x [128, _B*F] -> [M, _B*F]): per-cell dots cost ~48
    # Mosaic MXU ops per program; batched it is 3.
    F = q_ref.shape[1]
    q_all = q_ref[...].reshape(_B * F, 128)
    qT_all = dot_data_onehot(
        q_all, isel, (((1,), (1,)), ((), ())),
        data_is_lhs=False)  # [M, _B*F], exact copy

    def compute(b):
        buf = b % 2
        for o in range(O):
            pltpu.make_async_copy(
                dft_hbm.at[nbr_now[b, o]], scratch.at[buf, o],
                sems.at[buf, o]).wait()
        qT = qT_all[:, b * F:(b + 1) * F]  # [M, F]
        # blocks are DMA'd with 128 lanes (Mosaic alignment); the pad
        # lanes carry sentinel values and are sliced away here
        sL = jnp.concatenate([scratch[buf, o][:, :M] for o in range(O)],
                             axis=1)  # [F, OM]
        return _pair_body(S, M, cutoff, init_dist, kernel, qT, sL,
                          two_d=two_d)

    base = c * _B
    for b in range(_B):
        g = base + b
        # prefetch cell g+1's stencil (the next program's cell 0 when
        # b == _B-1) into the other buffer before waiting on cell g's
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
        # slots >= n_occ are never referenced by dense_pos: their out
        # block stays unwritten (garbage), which unpack never gathers
        @pl.when(g < n_occ)
        def _(b=b):
            out_ref[b] = compute(b)


def _pair_body(S, M, cutoff, init_dist, kernel: Kernel, qT, sL,
               two_d=False, union=False):
    """The full per-cell pair computation, [M, OM] vreg math: geometry,
    gates, Mofidi sums (MXU), closest-point pick, in-kernel epilogue.

    ``two_d`` selects the 7-field pack (no z, no w — both identically
    zero in 2D scenes): a dfT slot row is then ONE (8, 128) memory tile
    instead of two, and the quantity/source contractions drop their
    zero rows.  (A pair-entry stencil-table variant that halved the
    per-cell DMA count by copying TWO consecutive slots per entry was
    measured SLOWER at 1M — 69.6 vs 62.8 ms — because odd runs grow
    the pair lanes 256 -> 384 and the DMA floor is per-cell
    latency-bound, not per-copy; it was removed.)

    ``union`` reads the COUPLING pack instead (``pallas_fluid``'s
    14-field layout, z/w always present): vol comes from m/rho in
    vregs and the gates decode that layout's wider flags word — the
    fused forces+contact pass shares one stencil DMA stream between
    the fluid and contact physics."""
    if union:
        (FX, FY, FZ, FU, FV, FW, FM, FRHO) = range(8)
        FH, FFLAGS = 8, 13
        FVOL = None
    elif two_d:
        (FX, FY, FU, FV, FVOL, FH, FFLAGS) = range(7)
    else:
        (FX, FY, FZ, FU, FV, FW, FVOL, FH, FFLAGS) = range(9)

    def qcol(f):
        return qT[:, f:f + 1]         # [M, 1]

    def srow(f):
        return sL[f:f + 1, :]         # [1, OM]

    # ---- pair geometry [M, OM] ----------------------------------------
    xij = qcol(FX) - srow(FX)
    yij = qcol(FY) - srow(FY)
    if two_d:
        rij = jnp.sqrt(xij * xij + yij * yij)
    else:
        zij = qcol(FZ) - srow(FZ)
        rij = jnp.sqrt(xij * xij + yij * yij + zij * zij)
    hij = 0.5 * (qcol(FH) + srow(FH))
    wij = kernel.w(rij, hij)

    if union:
        # pallas_fluid's packed flags word; the contact gate's
        # "boundary" bit is cfib (contact_force_is_boundary)
        from .pallas_fluid import _decode_flags as _dec_union

        def dec(f):
            dem, cfib, _sb, fluid, rigid = _dec_union(f)
            return dem, cfib, fluid, rigid

        s_dem, s_bdry, s_fluid, _ = dec(srow(FFLAGS))
        q_dem, _, _, q_rigid = dec(qcol(FFLAGS))
    else:
        s_dem, s_bdry, s_fluid, _ = _decode_flags(srow(FFLAGS))
        q_dem, _, _, q_rigid = _decode_flags(qcol(FFLAGS))
    gate = ((s_bdry == 1.0)
            & (s_dem != q_dem)
            & (s_fluid == 0.0)
            & (q_rigid == 1.0)
            & (rij <= cutoff))
    rinv = 1.0 / jnp.maximum(rij, 1e-30)
    vol_q = (qcol(FM) / qcol(FRHO)) if union else qcol(FVOL)
    t1 = jnp.where(gate, vol_q * rinv * wij, 0.0)
    t2 = t1 * rij

    # ---- slot sums: one MXU contraction -------------------------------
    # direct per-pair quantities (like the XLA engine) — a factored
    # sum(t*xij) = xq*sum(t) - sum(t*xs) form is ~25% cheaper but
    # amplifies f32 cancellation on the near-zero normal components
    oh_rows = [s_dem == float(s_id) for s_id in range(S)]  # [1, OM]
    ohT = jnp.concatenate(
        [jnp.where(m, 1.0, 0.0) for m in oh_rows], axis=0)  # [S, OM]
    zcol = jnp.zeros((M, S), jnp.float32)
    if two_d:
        quants = [t1 * xij, t1 * yij, t2, t2 * xij, t2 * yij]
    else:
        quants = [t1 * xij, t1 * yij, t1 * zij, t2,
                  t2 * xij, t2 * yij, t2 * zij]
    # This ACCUMULATION dot runs at DEFAULT MXU precision (bf16
    # operands, f32 accumulate) — deliberately: the XLA cell engine's
    # one-hot sum einsums also run at DEFAULT, and the two lowerings
    # are bit-identical (verified on v5e: scripts/exp_spill3d.py
    # reports cfn_*/dist bit-parity), so DEFAULT-on-both keeps the
    # engines exactly comparable.  Physics-wise the bf16 operand
    # rounding is inside every validation gate (oracle rebound <2%,
    # Zhang RMS).  Only SELECTION dots (qT copy, closest-source pick,
    # pack placement) need pallas_exact.dot_data_onehot — there
    # bf16-rounding corrupts the picked values themselves.
    quant = jnp.concatenate(quants, axis=0)     # [5M|7M, OM]
    sums = jax.lax.dot_general(
        quant, ohT, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)     # [5M|7M, S]
    qs = [sums[i * M:(i + 1) * M] for i in range(len(quants))]
    if two_d:
        q0, q1, q3, q4, q5 = qs                 # sum(t1*xij), ...
        q2 = zcol                               # sum(t1*zij) == 0
        q6 = zcol
    else:
        q0, q1, q2, q3, q4, q5, q6 = qs
    # q3 = sum(t2) == sum(t1*rij) (wij-norm == distance denominator)

    # ---- closest source per slot ---------------------------------------
    r_g = jnp.where(gate, rij, _BIG)  # [M, OM]
    lane = jax.lax.broadcasted_iota(jnp.int32, r_g.shape, 1
                                    ).astype(jnp.float32)
    mins, min_b = [], jnp.full_like(r_g, _BIG)
    for s_id, m in enumerate(oh_rows):
        mn = jnp.min(jnp.where(m, r_g, _BIG), axis=1, keepdims=True)
        mins.append(mn)
        min_b = jnp.where(m, mn, min_b)  # [M, OM] select-accumulate
    min_r = jnp.concatenate(mins, axis=1)  # [M, S]
    pick = gate & (r_g <= min_b)
    lane_b = jnp.zeros_like(r_g)
    for m in oh_rows:
        ls = jnp.min(jnp.where(pick & m, lane, _BIG), axis=1,
                     keepdims=True)
        lane_b = jnp.where(m, ls, lane_b)
    pickf = jnp.where(pick & (lane == lane_b), 1.0, 0.0)

    src_fields = (FX, FY, FU, FV) if two_d else (FX, FY, FZ, FU, FV, FW)
    A = jnp.concatenate(
        [srow(f) * ohT for f in src_fields], axis=0)  # [4S|6S, OM]
    srcs = dot_data_onehot(
        A, pickf, (((1,), (1,)), ((), ())),
        data_is_lhs=False)  # [M, 4S|6S]
    if two_d:
        # z / w source picks are identically zero in 2D
        srcs = jnp.concatenate(
            [srcs[:, 0:S], srcs[:, S:2 * S], zcol,
             srcs[:, 2 * S:3 * S], srcs[:, 3 * S:4 * S], zcol], axis=1)

    # ---- epilogue, in-kernel ([M, S] vreg math) -----------------------
    # Formerly an XLA pass over the [NC, M, 14S] output; inside one
    # jit XLA's layout assignment put NC minor-most on the stacked
    # intermediates and copied ~1.5 GB around the unpack gather —
    # 111 ms at 1M vs ~15 ms for this same math here.
    has = q3 > 1e-12
    inv_w = jnp.where(has, 1.0 / jnp.maximum(q3, 1e-30), 0.0)
    mx, my, mz = q0 * inv_w, q1 * inv_w, q2 * inv_w
    mag = jnp.sqrt(mx * mx + my * my + mz * mz)
    inv_m = jnp.where(has & (mag > 0),
                      1.0 / jnp.maximum(mag, 1e-30), 0.0)
    cfn_x, cfn_y, cfn_z = mx * inv_m, my * inv_m, mz * inv_m
    num = cfn_x * q4 + cfn_y * q5 + cfn_z * q6
    dist = jnp.where(has, num / jnp.where(has, q3, 1.0), 0.0)
    # float mask (Mosaic cannot concatenate i1 vregs)
    foundf = jnp.where(min_r < init_dist, 1.0, 0.0)
    mind = jnp.minimum(min_r, init_dist)
    srcs = srcs * jnp.concatenate([foundf] * 6, axis=1)

    cols = jnp.concatenate(
        [cfn_x, cfn_y, cfn_z, q3, dist, mind, srcs], axis=1)  # [M,12S]
    W = 12 * S
    Wp = -(-W // 128) * 128
    if Wp != W:
        # 128-align the output minor dim: misaligned VMEM->HBM block
        # copy-out runs ~40x off bandwidth (measured 27 ms for the
        # 1.16 GB [*, 108] output at 1M particles)
        cols = jnp.concatenate(
            [cols, jnp.zeros((M, Wp - W), jnp.float32)], axis=1)
    return cols


def contact_sums_pallas(src_l, n_occ, nbr_slots, cfg: CellGridConfig,
                        kernel: Kernel, S: int, init_dist: float = 0.0,
                        interpret: bool = False, sent_slot=None,
                        q_rows=None, missing: int | None = None):
    """Finalized per-slot contact fields for every cell: [NC, M, Wp] f32
    — (cfn_x, cfn_y, cfn_z, wij-sum, contact dist, closest dist, 6 source
    picks), each an [NC, M, S] block along the last axis; Wp is 12S
    128-aligned (zero tail columns).  The normals/distance/pick epilogue
    runs IN-kernel (see :func:`_kernel`).

    ``src_l`` is the field-major pack ``dfT [>= NCp(+1), F, 128]``;
    stencil blocks are DMA'd from it inside the kernel and the query
    block is its own slot row (BlockSpec-pipelined).  ``sent_slot`` is
    the dfT row holding an all-sentinel block, used for missing-neighbor
    entries: NC for the XLA-packed layout (sentinel row appended last),
    ``n_occ`` for the Pallas sorted-pack layout (first unoccupied slot,
    always written all-sentinel).  ``missing`` is the stencil-table value
    meaning "no neighbor" — defaults to the table's own row count; the
    compact pipeline passes ``cfg.NC_max`` because its tables have only
    NI_max rows while entries still address the full dfT."""
    NC, O = nbr_slots.shape
    if missing is None:
        missing = NC
    M = cfg.M
    F = src_l.shape[1]
    kern = functools.partial(_kernel, S, M, O, cfg.radius,
                             float(init_dist), kernel, cfg.dim == 2)
    W = -(-12 * S // 128) * 128
    NCp = -(-NC // _B) * _B
    nprog = NCp // _B
    if sent_slot is None:
        sent_slot = jnp.int32(NC)
    # dynamic grid bound: only programs covering occupied cells run —
    # the NC_max slack tail (nc_factor 1.6) otherwise costs its block
    # copies even though every cell in it is skipped
    n_occ_i = jnp.minimum(jnp.asarray(n_occ, jnp.int32), NCp)
    nprog_dyn = (jnp.maximum(n_occ_i, 0) + _B - 1) // _B
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprog_dyn,),
        in_specs=[
            # the query block: dfT's own slot rows
            pl.BlockSpec((_B, F, 128), lambda c, n: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            # the program's _B stencil rows + the NEXT program's (for
            # the revolving-buffer prefetch), as tiny SMEM blocks — the
            # full [NC, O] table exceeds the SMEM scalar-prefetch budget
            pl.BlockSpec((_B, O), lambda c, n: (c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_B, O),
                         lambda c, n: (jnp.minimum(c + 1, nprog - 1), 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_B, M, W), lambda c, n: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, O, F, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, O)),
        ],
    )
    slots = jnp.where(nbr_slots < missing, nbr_slots,
                      sent_slot).astype(jnp.int32)
    if NCp != NC:  # pad cell rows to the program batch
        slots = jnp.concatenate(
            [slots, jnp.broadcast_to(jnp.asarray(sent_slot, jnp.int32),
                                     (NCp - NC, O))], axis=0)
    # query BlockSpec needs >= NCp rows, a multiple of the block batch
    # (q_rows: the interest-culled path passes COMPACTED query rows
    # while the stencil DMAs still address the full dfT)
    def pad_rows(a):
        rows = a.shape[0]
        target = max(NCp, -(-rows // _B) * _B)
        if rows < target:
            a = jnp.concatenate(
                [a,
                 jnp.broadcast_to(
                     jnp.asarray(sent_fields(cfg.dim == 2),
                                 a.dtype)[None, :, None],
                     (target - rows, F, 128))], axis=0)
        return a

    q = pad_rows(src_l if q_rows is None else q_rows)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NCp, M, W), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(n_occ, jnp.int32).reshape(1), q, slots, slots,
      src_l)
    return out[:NC]


def contact_pipeline_cell_pallas(scene, grid: CellGrid,
                                 cfg: CellGridConfig, kernel: Kernel,
                                 interpret: bool = False):
    """Drop-in replacement for ``contact_cell.contact_pipeline_cell_fused``
    running the pair pipeline in the fused Pallas kernel.  Same outputs
    ([N,S] cfn_x/y/z, wij, dist_info) in original particle order."""
    S = scene.meta.total_no_bodies
    init_dist = 4.0 * scene.meta.spacing0

    df = pack_for_contact(scene, grid, cfg)            # [NC, M, F]
    NC, M, F = df.shape
    sent_l = sent_fields(cfg.dim == 2)
    sent = jnp.broadcast_to(jnp.asarray(sent_l, df.dtype), (M, F))[None]
    dfT = jnp.swapaxes(jnp.concatenate([df, sent], axis=0), 1, 2)
    if M < 128:  # Mosaic DMA slices must be 128-aligned in the minor dim
        pad = jnp.broadcast_to(
            jnp.asarray(sent_l, df.dtype)[None, :, None],
            (NC + 1, F, 128 - M))
        dfT = jnp.concatenate([dfT, pad], axis=2)
    # field-major [NC+1, F, 128]: the kernel DMAs one block per stencil
    # cell (no XLA pre-gather — it costs more than the kernel at 1M)

    out = contact_sums_pallas(dfT, grid.n_occupied, grid.nbr_slots,
                              cfg, kernel, S, init_dist,
                              interpret=interpret)     # [NC, M, Wp]
    return _unpack_contact_out(out, grid, cfg, scene, S)


def _unpack_contact_out(out, grid, cfg, scene, S):
    from .cellpairs import unpack

    n = scene.n
    out = out.astype(scene.x.dtype)
    flat = unpack(grid, cfg, out, n, 0.0)
    outp = flat[:, :12 * S].reshape(n, 12, S)
    dinfo = dict(
        contact_force_dist=outp[:, 4],
        closest_point_dist_to_source=outp[:, 5],
        x_source=outp[:, 6], y_source=outp[:, 7], z_source=outp[:, 8],
        vx_source=outp[:, 9], vy_source=outp[:, 10],
        vz_source=outp[:, 11],
    )
    return outp[:, 0], outp[:, 1], outp[:, 2], outp[:, 3], dinfo


def contact_payload(scene, two_d: bool = False):
    """The packed contact fields as per-particle [N] arrays (the
    sorted-pack path carries these through the grid build's cell sort
    — see ``cellpairs.build_cell_grid_packed``).  2D scenes drop z and
    w (identically zero there): 7 fields instead of 9."""
    fdt = scene.x.dtype
    flags = (scene.dem_id.astype(fdt) * 8.0
             + scene.contact_force_is_boundary * 4.0
             + scene.is_fluid.astype(fdt) * 2.0
             + scene.is_rigid.astype(fdt))
    if two_d:
        return [scene.x, scene.y, scene.u, scene.v,
                scene.m / scene.rho, scene.h, flags]
    return [scene.x, scene.y, scene.z, scene.u, scene.v, scene.w,
            scene.m / scene.rho, scene.h, flags]


def _cull_interesting_slots(dfT, slot_cid, cfg: CellGridConfig,
                            union: bool = False):
    """Conservative per-slot interest test for the Mofidi contact gate.

    A slot's queries can produce a gated pair ONLY if (a) the slot has a
    rigid query lane and (b) its cell's stencil contains a
    contact-boundary non-fluid source whose dem differs from some query
    dem.  Body-INTERIOR cells (uniform dem, no foreign sources in
    range) fail this test and their kernel output is exactly the init
    row — in block-lattice scenes that is the vast majority of occupied
    cells, so the kernel runs on a compacted "interesting" slot list
    (~6x fewer programs at 1M on the bench scene).

    The test is exact w.r.t. the dem/flag gates and conservative w.r.t.
    distance (stencil locality), so culled outputs are BIT-identical to
    the full kernel's.

    Returns ``(interesting [NC] bool, islot [NC] i32)`` where islot
    lists interesting slot ids compacted to the front (NC sentinels
    after)."""
    NC = cfg.NC_max
    G = cfg.n_cells_total
    gx, gy, gz = cfg.dims
    F = dfT.shape[1]
    BIGD = jnp.float32(2.0e9)

    # per-slot lane aggregates from the packed flags row (sentinel
    # lanes decode to dem=-1/rigid=0/bdry=0 and drop out).  ``union``
    # reads the COUPLING pack's wider flags word (pallas_fluid layout;
    # the contact gate's boundary bit is cfib there)
    if union:
        from .pallas_fluid import _decode_flags as _dec_union
        dem, bdry, _sb, fluid, rigid = _dec_union(dfT[:NC, F - 1, :])
    else:
        dem, bdry, fluid, rigid = _decode_flags(dfT[:NC, F - 1, :])
    qmask = rigid == 1.0
    smask = (bdry == 1.0) & (fluid == 0.0)
    qdmin = jnp.min(jnp.where(qmask, dem, BIGD), axis=1)    # [NC]
    qdmax = jnp.max(jnp.where(qmask, dem, -BIGD), axis=1)
    sdmin = jnp.min(jnp.where(smask, dem, BIGD), axis=1)
    sdmax = jnp.max(jnp.where(smask, dem, -BIGD), axis=1)

    # per-CELL source tables over dense cell-id space: scatter-min/max
    # handles multi-slot cells for free (NC updates each)
    cidc = jnp.where(slot_cid < G, slot_cid, G)
    SminG = jnp.full(G + 1, BIGD, jnp.float32).at[cidc].min(
        jnp.where(slot_cid < G, sdmin, BIGD), mode="drop")[:G]
    SmaxG = jnp.full(G + 1, -BIGD, jnp.float32).at[cidc].max(
        jnp.where(slot_cid < G, sdmax, -BIGD), mode="drop")[:G]

    # stencil union via shifted slices (elementwise, bandwidth-bound;
    # domain boundary ring is particle-free so offsets never wrap)
    offs = [dx_ + gx * (dy_ + gy * dz_) for (dx_, dy_, dz_) in cfg.stencil]
    maxoff = max(abs(o) for o in offs)
    pmin = jnp.concatenate([jnp.full(maxoff, BIGD, jnp.float32), SminG,
                            jnp.full(maxoff, BIGD, jnp.float32)])
    pmax = jnp.concatenate([jnp.full(maxoff, -BIGD, jnp.float32), SmaxG,
                            jnp.full(maxoff, -BIGD, jnp.float32)])
    SminU, SmaxU = None, None
    for off in offs:
        a = jax.lax.dynamic_slice_in_dim(pmin, maxoff + off, G)
        b = jax.lax.dynamic_slice_in_dim(pmax, maxoff + off, G)
        SminU = a if SminU is None else jnp.minimum(SminU, a)
        SmaxU = b if SmaxU is None else jnp.maximum(SmaxU, b)

    # one [NC]-row lookup of the union tables at each slot's cell
    T = jnp.stack([SminU, SmaxU], axis=1)                   # [G, 2]
    rows = T.at[jnp.clip(slot_cid, 0, G - 1)].get(mode="clip")
    sminu = jnp.where(slot_cid < G, rows[:, 0], BIGD)
    smaxu = jnp.where(slot_cid < G, rows[:, 1], -BIGD)

    has_q = qdmin < BIGD
    has_s = sminu < BIGD
    uniform = (qdmin == qdmax) & (sminu == smaxu) & (qdmin == sminu)
    # slot_cid < G gates out empty tail slots, whose dfT rows past the
    # expand kernel's covered range are UNWRITTEN garbage
    interesting = has_q & has_s & ~uniform & (slot_cid < G)

    iota = jnp.arange(NC, dtype=jnp.int32)
    islot = jnp.sort(jnp.where(interesting, iota, NC))
    return interesting, islot


def _cull_rigid_query_slots(dfT, slot_cid, cfg: CellGridConfig,
                            union: bool = True):
    """LIGHT interest test: a slot is interesting iff it holds a RIGID
    query lane.  Conservative superset of :func:`_cull_interesting_
    slots` w.r.t. outputs (a rigid query with no gated source still
    produces exactly the init row), but with none of the per-cell
    source tables / stencil unions — one flag decode + one lane
    reduction.  Right for schemes where rigid particles are a small
    fraction (the FSI coupling: one body in a tank of fluid); the
    contact scheme keeps the full test (its scenes are mostly rigid,
    and dem-uniformity is what culls body interiors there)."""
    NC = cfg.NC_max
    G = cfg.n_cells_total
    F = dfT.shape[1]
    if union:
        from .pallas_fluid import _decode_flags as _dec_union
        _, _, _, _, rigid = _dec_union(dfT[:NC, F - 1, :])
    else:
        _, _, _, rigid = _decode_flags(dfT[:NC, F - 1, :])
    # sentinel/pad lanes decode rigid=0; garbage tail rows gate out via
    # the slot_cid sentinel
    interesting = jnp.any(rigid == 1.0, axis=1) & (slot_cid < G)
    iota = jnp.arange(NC, dtype=jnp.int32)
    islot = jnp.sort(jnp.where(interesting, iota, NC))
    return interesting, islot


def contact_pipeline_sorted_pallas(scene, cfg: CellGridConfig,
                                   kernel: Kernel,
                                   interpret: bool = False,
                                   cull: bool | None = None):
    """The full TPU fast path: grid build with the pack fields carried
    through the cell sort, Pallas pack-expansion into dfT, interest
    culling (body-interior cells skip the kernel — bit-identical init
    outputs), fused Pallas contact kernel over the compacted slot list,
    re-expand, unpack.  Returns the same outputs as
    :func:`contact_pipeline_cell_pallas` plus the built grid (callers
    fold ``grid.overflow`` into the scene and reuse nothing else).

    Numerically identical to the gather-packed pipeline: the same sort
    order, the same f32 field values, the same kernel."""
    import os
    from . import pallas_pack
    from .cellpairs import build_cell_grid_packed

    if cull is None:
        cull = not os.environ.get("RB_NO_CULL")
    S = scene.meta.total_no_bodies
    init_dist = 4.0 * scene.meta.spacing0
    NC, M = cfg.NC_max, cfg.M

    payload = contact_payload(scene, cfg.dim == 2)
    grid, pt = build_cell_grid_packed(scene.x, scene.y, scene.z,
                                      scene.active, cfg, payload)
    dfT = pallas_pack.expand_dft_pallas(pt, grid.n_occupied, cfg,
                                        sent_fields(cfg.dim == 2),
                                        interpret=interpret)
    sent_slot = jnp.minimum(grid.n_occupied, NC)

    if not cull:
        out = contact_sums_pallas(dfT, grid.n_occupied, grid.nbr_slots,
                                  cfg, kernel, S, init_dist,
                                  interpret=interpret,
                                  sent_slot=sent_slot)
        return _unpack_contact_out(out, grid, cfg, scene, S) + (grid,)

    interesting, islot = _cull_interesting_slots(dfT, pt.slot_cid, cfg)
    n_int = jnp.sum(interesting.astype(jnp.int32))
    valid = islot < NC
    qsel = jnp.where(valid, islot, sent_slot)
    qI = dfT.at[qsel].get(mode="clip")                     # [NC, F, 128]
    nbrI = jnp.where(valid[:, None],
                     grid.nbr_slots.at[jnp.clip(islot, 0, NC - 1)
                                       ].get(mode="clip"), NC)
    out_c = contact_sums_pallas(dfT, n_int, nbrI, cfg, kernel, S,
                                init_dist, interpret=interpret,
                                sent_slot=sent_slot, q_rows=qI)

    # re-expand: scatter the compacted rows over an init-filled full
    # layout (boring slots' kernel output IS the init row: cfn/srcs 0,
    # dist 0, closest init_dist)
    Wp = out_c.shape[-1]
    initrow = jnp.zeros((Wp,), jnp.float32).at[5 * S:6 * S].set(
        float(init_dist))
    full = jnp.broadcast_to(initrow, (NC + 1, M, Wp))
    full = full.at[jnp.where(valid, islot, NC)].set(
        out_c, mode="drop")[:NC]
    return _unpack_contact_out(full, grid, cfg, scene, S) + (grid,)


def contact_pipeline_compact_pallas(scene, cfg: CellGridConfig,
                                    kernel: Kernel, ni_max: int,
                                    interpret: bool = False):
    """The COMPACT fast path: like :func:`contact_pipeline_sorted_pallas`
    but the kernel output stays in the compacted interesting-slot layout
    — nothing is re-expanded to [NC, M, ·] and nothing is unpacked to
    [N, ·].  The caller (``models.rigid_body.rigid_contact_force_eval_
    compact``) runs the whole contact-force tail on the ``[NI_max*M]``
    compacted lanes and scatters per-particle results back, which at 1M
    particles removes the ~14 ms [N]-row unpack gather, the ~5 ms
    re-expand scatter, the dense_pos sort, and the [N, S] tail math —
    non-interesting slots' outputs are KNOWN (the init row; see the
    bit-exactness argument in :func:`_cull_interesting_slots`).

    ``ni_max`` is the static interesting-slot capacity; ``overflow`` is
    raised when the cull finds more (the Solver's overflow-rebuild path
    then re-sizes, like every other static capacity here).

    Returns ``(out_c [NI_max, M, Wp], pid [NI_max, M] int32 — original
    particle index per compacted lane, n for empty/padding lanes,
    (u, v, w) [NI_max, M] query velocities, grid, overflow)``.
    """
    from . import pallas_pack
    from .cellpairs import build_cell_grid_packed

    S = scene.meta.total_no_bodies
    init_dist = 4.0 * scene.meta.spacing0
    NC, M = cfg.NC_max, cfg.M
    n = scene.n
    two_d = cfg.dim == 2

    payload = contact_payload(scene, two_d)
    grid, pt = build_cell_grid_packed(scene.x, scene.y, scene.z,
                                      scene.active, cfg, payload,
                                      want_dense_pos=False)
    dfT = pallas_pack.expand_dft_pallas(pt, grid.n_occupied, cfg,
                                        sent_fields(two_d),
                                        interpret=interpret)
    sent_slot = jnp.minimum(grid.n_occupied, NC)

    interesting, islot = _cull_interesting_slots(dfT, pt.slot_cid, cfg)
    n_int = jnp.sum(interesting.astype(jnp.int32))
    cull_ovf = n_int > ni_max
    isl = islot[:ni_max]                       # interesting-first, sorted
    valid = isl < NC
    isl_c = jnp.clip(isl, 0, NC - 1)
    qsel = jnp.where(valid, isl, sent_slot)
    qI = dfT.at[qsel].get(mode="clip")                 # [NI, F, 128]
    nbrI = jnp.where(valid[:, None],
                     grid.nbr_slots.at[isl_c].get(mode="clip"), NC)
    out_c = contact_sums_pallas(dfT, jnp.minimum(n_int, ni_max), nbrI,
                                cfg, kernel, S, init_dist,
                                interpret=interpret, sent_slot=sent_slot,
                                q_rows=qI, missing=NC)  # [NI, M, Wp]

    # original particle id per compacted lane (slot s covers sorted rows
    # [base[s], base[s]+cnt[s]); empty lanes -> n)
    base_c = jnp.where(valid, pt.base.at[isl_c].get(mode="clip"), n)
    cnt_c = jnp.where(valid, pt.cnt.at[isl_c].get(mode="clip"), 0)
    lane = jnp.arange(M, dtype=jnp.int32)[None, :]
    sidx = jnp.clip(base_c[:, None] + lane, 0, max(n - 1, 0))
    pid = jnp.where(lane < cnt_c[:, None],
                    pt.sorted_pid.at[sidx].get(mode="clip"), n)

    # query velocities from the packed rows (bit-identical to scene.u/v/w
    # — the pack is a plain f32 copy)
    if two_d:
        u_c, v_c = qI[:, 2, :M], qI[:, 3, :M]
        w_c = jnp.zeros_like(u_c)
    else:
        u_c, v_c, w_c = qI[:, 3, :M], qI[:, 4, :M], qI[:, 5, :M]
    return out_c, pid, (u_c, v_c, w_c), grid, cull_ovf
