"""Fused Pallas TPU kernels for the WCSPH/EDAC/FSI fluid passes.

The coupling scheme's three fluid pair passes (``ops.fluid_cell``:
rates R, wall-BC W, momentum+FSI F; reference
``code/rigid_fluid_coupling.py:67-226,489-554``) are plain per-particle
lane reductions — no per-entity slot sums — so they share one generic
per-cell scaffold: query block in VMEM, the 9/27 stencil source blocks
DMA'd in-kernel with a ``_D``-deep revolving buffer (deeper than
``pallas_contact._kernel``'s: the fluid per-cell compute is too short
to hide one HBM round-trip), pair matrices as [M, OM] vregs, outputs a
[M, W] reduction block.  The XLA cell engine streams [C, M, OM]
intermediates through HBM per chunk; here HBM sees only the packed
fields and the [NC, M, W] outputs.

W and F stay separate kernels: the Adami wall pressure written by W is
read by F through OTHER cells' sources, so a barrier (the [N]-order
update + repack) must sit between them — the same group ordering as the
reference (:691-743).

Equivalence with the XLA engine: tests/test_pallas_fluid.py (interpret
mode) and the coupling scheme's cross-engine tests on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cellpairs import CellGrid, CellGridConfig, pack_fields, unpack
from .kernels import Kernel

_BIG = 1.0e9

# packed f32 field order: the fluid_cell 13 fields + ONE packed flags
# column.  FLAGS bit-packs dem_id*16 + contact_force_is_boundary*8 +
# is_static_boundary*4 + is_fluid*2 + is_rigid, so the SAME pack also
# carries every gate the CONTACT kernel needs — the fused
# forces+contact pass reads one stencil DMA stream for both physics.
(_FX, _FY, _FZ, _FU, _FV, _FW, _FM, _FRHO, _FH, _FP,
 _FMFSI, _FRHOFSI, _FPFSI, _FFLAGS) = range(14)
_NF = 14
_SENT = [_BIG, _BIG, _BIG, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.0,
         0.0, 1.0, 0.0, -16.0]  # flags sentinel: dem=-1, all bits 0


def _decode_flags(f):
    """flags f32 -> (dem, cfib, static_bdry, fluid, rigid), exact for
    dem_id < 2^19 (the sentinel's dem = -1 decodes as such)."""
    dem = jnp.floor(f * (1.0 / 16.0))
    r = f - 16.0 * dem
    cfib = jnp.floor(r * 0.125)
    r = r - 8.0 * cfib
    sbdry = jnp.floor(r * 0.25)
    r = r - 4.0 * sbdry
    fluid = jnp.floor(r * 0.5)
    rigid = r - 2.0 * fluid
    return dem, cfib, sbdry, fluid, rigid


def fluid_flags(scene):
    """The packed per-particle flags field (f32 [N])."""
    fdt = scene.x.dtype
    return (scene.dem_id.astype(fdt) * 16.0
            + scene.contact_force_is_boundary * 8.0
            + scene.is_static_boundary.astype(fdt) * 4.0
            + scene.is_fluid.astype(fdt) * 2.0
            + scene.is_rigid.astype(fdt))


def pack_fluid_pallas(scene, grid: CellGrid, cfg: CellGridConfig):
    """[NC, M, 14] f32 pack + its field-major DMA view [NC+1, 14, lane]."""
    df = pack_fields(
        grid, cfg,
        [scene.x, scene.y, scene.z, scene.u, scene.v, scene.w,
         scene.m, scene.rho, scene.h, scene.p,
         scene.m_fsi, scene.rho_fsi, scene.p_fsi, fluid_flags(scene)],
        _SENT).astype(jnp.float32)
    NC, M, F = df.shape
    sent = jnp.broadcast_to(jnp.asarray(_SENT, df.dtype), (M, F))[None]
    dfT = jnp.swapaxes(jnp.concatenate([df, sent], axis=0), 1, 2)
    lane = -(-M // 128) * 128
    if M < lane:
        pad = jnp.broadcast_to(
            jnp.asarray(_SENT, df.dtype)[None, :, None],
            (NC + 1, F, lane - M))
        dfT = jnp.concatenate([dfT, pad], axis=2)
    return df, dfT


def pack_fluid_sorted(scene, cfg: CellGridConfig,
                      interpret: bool = False):
    """Sorted-pack fluid build: ONE cell sort carries the 14 pack
    fields as payload and a Pallas kernel expands them straight into
    the field-major ``dfT`` — no slot-major df, no [NC*M]-row pack
    gather (the same trick that cut 37 ms/step from the 1M contact
    path).  Returns ``(grid, dfT, sent_slot, pt)``; queries read dfT's
    own rows in-kernel (``cell_pair_pallas(df=None, ...)``), the dense
    column patches address ``dfT[:NC, col, :M]``, and ``pt`` (the
    sorted-pack tables) feeds the compact contact tail."""
    from . import pallas_pack
    from .cellpairs import build_cell_grid_packed

    payload = [scene.x, scene.y, scene.z, scene.u, scene.v, scene.w,
               scene.m, scene.rho, scene.h, scene.p,
               scene.m_fsi, scene.rho_fsi, scene.p_fsi,
               fluid_flags(scene)]
    grid, pt = build_cell_grid_packed(scene.x, scene.y, scene.z,
                                      scene.active, cfg, payload)
    dfT = pallas_pack.expand_dft_pallas(pt, grid.n_occupied, cfg, _SENT,
                                        interpret=interpret)
    return grid, dfT, jnp.minimum(grid.n_occupied, cfg.NC_max), pt


_B = 16  # cells per kernel program (amortizes Mosaic grid-step dispatch;
#         see pallas_contact._B)
_D = 8  # DMA pipeline depth (cells in flight).  The fluid passes'
#        per-cell compute is tiny (~0.1 us) compared to contact, so a
#        2-deep buffer leaves one full HBM round-trip (~0.7 us) exposed
#        per cell — measured scaffold-only 2.6 ms @3.8k cells.  _D
#        buffers keep _D-1 cells' stencil copies in flight; must divide
#        _B (buffer index b % _D must equal g % _D across programs) and
#        be <= _B + 1 (prefetch rows come only from programs c, c+1).


def _scaffold(compute, W, M, O, q_from_dft, n_occ_ref, q_ref, nbr_now,
              nbr_nxt, dft_hbm, out_ref, scratch, sems):
    """Generic pair kernel over _B cells per program: DMA each cell's
    stencil blocks (_D-deep revolving buffer, prefetch crossing program
    boundaries), hand (q [M, F], sL [F, OM]) to ``compute`` -> [M, W].

    ``q_from_dft``: the query block is dfT's own [F, lane] slot rows
    (the sorted-pack path, which never materializes a slot-major df) —
    one exact one-hot MXU placement per program turns all _B rows into
    [M, F] columns, exactly as ``pallas_contact._kernel`` does."""
    c = pl.program_id(0)
    n_occ = n_occ_ref[0]

    if q_from_dft:
        from .pallas_exact import dot_data_onehot
        F = q_ref.shape[1]
        lane = q_ref.shape[2]
        isel = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (M, lane), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (M, lane), 1),
            1.0, 0.0)
        q_all = q_ref[...].reshape(_B * F, lane)
        qT_all = dot_data_onehot(
            q_all, isel, (((1,), (1,)), ((), ())),
            data_is_lhs=False)  # [M, _B*F], exact copy

    def start_dmas(buf, nbr_row, row):
        for o in range(O):
            pltpu.make_async_copy(
                dft_hbm.at[nbr_row[row, o]], scratch.at[buf, o],
                sems.at[buf, o]).start()

    # program 0 warms the pipeline with cells 0.._D-2; for c > 0 the
    # previous program already started cells base..base+_D-2
    @pl.when(c == 0)
    def _():
        for j in range(_D - 1):
            @pl.when(j < n_occ)
            def _(j=j):
                start_dmas(j % _D, nbr_now, j)

    def active(b):
        buf = b % _D
        for o in range(O):
            pltpu.make_async_copy(
                dft_hbm.at[nbr_now[b, o]], scratch.at[buf, o],
                sems.at[buf, o]).wait()
        sL = jnp.concatenate([scratch[buf, o][:, :M] for o in range(O)],
                             axis=1)  # [F, OM]
        q = (qT_all[:, b * F:(b + 1) * F] if q_from_dft else q_ref[b])
        return compute(q, sL)

    base = c * _B
    for b in range(_B):
        g = base + b
        # keep _D-1 cells in flight: start cell g+_D-1's copies before
        # waiting on cell g's (row from this program's block or the
        # next one's; g+_D-1 < n_occ implies that program is within the
        # dynamic grid bound, so nbr_nxt's block is the real next row)
        ahead = b + _D - 1
        if ahead < _B:
            @pl.when(g + _D - 1 < n_occ)
            def _(b=b, ahead=ahead):
                start_dmas(ahead % _D, nbr_now, ahead)
        else:
            @pl.when(g + _D - 1 < n_occ)
            def _(b=b, ahead=ahead):
                start_dmas(ahead % _D, nbr_nxt, ahead - _B)
        # slots >= n_occ are never referenced by dense_pos: leave their
        # out block unwritten (unpack never gathers it)
        @pl.when(g < n_occ)
        def _(b=b):
            out_ref[b] = active(b)


def cell_pair_pallas(df, dfT, n_occ, nbr_slots, cfg: CellGridConfig,
                     compute, W: int, interpret: bool = False,
                     sent_slot=None):
    """Run ``compute(q, sL) -> [M, W]`` once per occupied cell; returns
    [NC, M, W] f32 (slots past ``n_occ`` are unwritten garbage — only
    ever read back through ``unpack``'s dense_pos gather, which skips
    them).

    ``df=None`` selects the dfT-only (sorted-pack) path: queries come
    from dfT's own slot rows through an in-kernel one-hot transpose,
    and ``sent_slot`` names dfT's all-sentinel row for missing-neighbor
    stencil entries (the gather-packed layout appends it at NC; the
    sorted pack always writes one at min(n_occ, NC))."""
    NC = cfg.NC_max
    M = cfg.M
    O = nbr_slots.shape[1]
    q_from_dft = df is None
    F = dfT.shape[1] if q_from_dft else df.shape[2]
    lane = -(-M // 128) * 128
    kern = functools.partial(_scaffold, compute, W, M, O, q_from_dft)
    NCp = -(-NC // _B) * _B
    nprog = NCp // _B
    if sent_slot is None:
        sent_slot = jnp.int32(NC)
    # dynamic grid bound: only programs covering occupied cells run
    n_occ_i = jnp.minimum(jnp.asarray(n_occ, jnp.int32), NCp)
    nprog_dyn = (jnp.maximum(n_occ_i, 0) + _B - 1) // _B
    q_spec = (pl.BlockSpec((_B, F, lane), lambda c, n: (c, 0, 0),
                           memory_space=pltpu.VMEM)
              if q_from_dft else
              pl.BlockSpec((_B, M, F), lambda c, n: (c, 0, 0),
                           memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprog_dyn,),
        in_specs=[
            q_spec,
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
            pltpu.VMEM((_D, O, F, lane), jnp.float32),
            pltpu.SemaphoreType.DMA((_D, O)),
        ],
    )
    slots = jnp.where(nbr_slots < NC, nbr_slots,
                      sent_slot).astype(jnp.int32)
    if NCp != NC:
        slots = jnp.concatenate(
            [slots, jnp.broadcast_to(jnp.asarray(sent_slot, jnp.int32),
                                     (NCp - NC, O))], axis=0)
    if q_from_dft:
        # dfT covers >= NCp+1 rows by construction (expand_dft_pallas
        # pads a full extra block) — its own rows are the query blocks
        q_in = dfT
        if dfT.shape[0] < NCp:
            q_in = jnp.concatenate(
                [dfT, jnp.broadcast_to(
                    jnp.asarray(_SENT, dfT.dtype)[None, :, None],
                    (NCp - dfT.shape[0], F, lane))], axis=0)
        dfT = q_in
    else:
        q_in = df
        if NCp != NC:
            q_in = jnp.concatenate(
                [df, jnp.broadcast_to(jnp.asarray(_SENT, df.dtype),
                                      (NCp - NC, M, F))], axis=0)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NCp, M, W), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(n_occ, jnp.int32).reshape(1), q_in, slots, slots, dfT)
    return out[:NC]


def _pair_geom(q, sL, kernel: Kernel):
    def qc(f):
        return q[:, f:f + 1]

    def sr(f):
        return sL[f:f + 1, :]

    xij = qc(_FX) - sr(_FX)
    yij = qc(_FY) - sr(_FY)
    zij = qc(_FZ) - sr(_FZ)
    r2 = xij * xij + yij * yij + zij * zij
    rij = jnp.sqrt(r2)
    hij = 0.5 * (qc(_FH) + sr(_FH))
    return qc, sr, xij, yij, zij, rij, r2, hij


def fluid_rates_pallas(scene, grid: CellGrid, cfg: CellGridConfig,
                       kernel: Kernel, df, dfT, nu_edac: float, c0: float,
                       edac: bool, has_rigid: bool,
                       interpret: bool = False, dense: bool = False,
                       sent_slot=None):
    """Pass R on the Pallas scaffold: per-particle (arho, ap)
    (``fluid_cell.fluid_rates_cell`` physics, reference
    ContinuityEquation + EDAC :67-141).  ``dense=True`` skips the
    unpack and returns the raw [NC, M, 2] f32 block (the fused kdkf
    step patches thermo columns in dense space and unpacks once)."""
    cutoff = cfg.radius
    cs2 = c0 * c0

    def compute(q, sL):
        qc, sr, xij, yij, zij, rij, r2, hij = _pair_geom(q, sL, kernel)
        in_range = rij <= cutoff
        _, _, _, q_fl, _ = _decode_flags(qc(_FFLAGS))
        _, _, s_sb, s_fl, s_rg = _decode_flags(sr(_FFLAGS))
        dest_fluid = q_fl == 1.0
        src_flbd = (s_fl == 1.0) | (s_sb == 1.0)
        src_rigid = s_rg == 1.0

        dw = kernel.gradw_scalar(rij, hij)
        dwx, dwy, dwz = dw * xij, dw * yij, dw * zij
        vdotdw = ((qc(_FU) - sr(_FU)) * dwx + (qc(_FV) - sr(_FV)) * dwy
                  + (qc(_FW) - sr(_FW)) * dwz)
        xdotdw = xij * dwx + yij * dwy + zij * dwz
        eps = 0.01 * hij * hij
        rhoi, pi, mi = qc(_FRHO), qc(_FP), qc(_FM)

        def rates(mj, rhoj, pj, gate):
            g = gate & dest_fluid & in_range
            arho = jnp.sum(jnp.where(g, rhoi * mj / rhoj * vdotdw, 0.0),
                           axis=1, keepdims=True)
            if not edac:
                return arho, jnp.zeros_like(arho)
            ap1 = rhoi / rhoj * cs2 * mj * vdotdw
            Vi = mi / rhoi
            Vj = mj / rhoj
            etaij = 2.0 * nu_edac * (rhoi * rhoj) / (rhoi + rhoj)
            tmp = (1.0 / jnp.maximum(mi, 1e-30)) * (Vi * Vi + Vj * Vj) \
                * etaij * xdotdw / (r2 + eps)
            ap = jnp.sum(jnp.where(g, ap1 + tmp * (pi - pj), 0.0),
                         axis=1, keepdims=True)
            return arho, ap

        arho, ap = rates(sr(_FM), sr(_FRHO), sr(_FP), src_flbd)
        if has_rigid:
            a2, p2 = rates(sr(_FMFSI), sr(_FRHOFSI), sr(_FPFSI), src_rigid)
            arho, ap = arho + a2, ap + p2
        return jnp.concatenate([arho, ap], axis=1)

    out = cell_pair_pallas(df, dfT, grid.n_occupied, grid.nbr_slots, cfg,
                           compute, 2, interpret=interpret,
                           sent_slot=sent_slot)
    if dense:
        return out
    n = scene.n
    out = unpack(grid, cfg, out, n, 0.0).astype(scene.x.dtype)
    return out[:, 0], out[:, 1]


def fluid_rates_wall_pallas(scene, grid: CellGrid, cfg: CellGridConfig,
                            kernel: Kernel, df, dfT, nu_edac: float,
                            c0: float, edac: bool, has_rigid: bool,
                            gx: float, gy: float, gz: float,
                            interpret: bool = False, dense: bool = False,
                            sent_slot=None):
    """Fused pass R+W: rates (fluid dests) AND the Adami wall-BC sums
    (solid dests) in ONE kernel sweep -> [NC, M, 7] (arho, ap, uf, vf,
    wf, sw, p_num).

    The two passes share the same pack and stencil, and their
    destination sets are disjoint (fluid vs wall/body), so running both
    per cell visit halves the stencil DMA-issue count — which is what
    the small fluid kernels are bound by (~0.1 us issue x 9 copies per
    cell; measured ~3.4 ms/pass at 3.8k cells while the copied bytes
    would take <0.5 ms at bandwidth).  Staging note: the fused pass
    evaluates the wall sums with the SOURCE fluid p/rho *before* the
    in-step continuity/EDAC update — exactly the reference's staging
    (its stage-2 wall BC runs before the stepper-stage-2 drift updates
    rho/p, ``code/rigid_fluid_coupling.py:691-743`` + GTVFFluidStep
    :281-291), where the split kdk passes feed the wall BC the
    already-drifted values."""
    cutoff = cfg.radius
    cs2 = c0 * c0

    def compute(q, sL):
        qc, sr, xij, yij, zij, rij, r2, hij = _pair_geom(q, sL, kernel)
        in_range = rij <= cutoff
        _, _, q_sb, q_fl, q_rg = _decode_flags(qc(_FFLAGS))
        _, _, s_sb, s_fl, s_rg = _decode_flags(sr(_FFLAGS))
        dest_fluid = q_fl == 1.0
        src_fluid = s_fl == 1.0
        src_flbd = src_fluid | (s_sb == 1.0)
        src_rigid = s_rg == 1.0

        w_all, dw = kernel.w_gradw(rij, hij)
        dwx, dwy, dwz = dw * xij, dw * yij, dw * zij
        vdotdw = ((qc(_FU) - sr(_FU)) * dwx + (qc(_FV) - sr(_FV)) * dwy
                  + (qc(_FW) - sr(_FW)) * dwz)
        xdotdw = xij * dwx + yij * dwy + zij * dwz
        eps = 0.01 * hij * hij
        rhoi, pi, mi = qc(_FRHO), qc(_FP), qc(_FM)

        def rates(mj, rhoj, pj, gate):
            g = gate & dest_fluid & in_range
            arho = jnp.sum(jnp.where(g, rhoi * mj / rhoj * vdotdw, 0.0),
                           axis=1, keepdims=True)
            if not edac:
                return arho, jnp.zeros_like(arho)
            ap1 = rhoi / rhoj * cs2 * mj * vdotdw
            Vi = mi / rhoi
            Vj = mj / rhoj
            etaij = 2.0 * nu_edac * (rhoi * rhoj) / (rhoi + rhoj)
            tmp = (1.0 / jnp.maximum(mi, 1e-30)) * (Vi * Vi + Vj * Vj) \
                * etaij * xdotdw / (r2 + eps)
            ap = jnp.sum(jnp.where(g, ap1 + tmp * (pi - pj), 0.0),
                         axis=1, keepdims=True)
            return arho, ap

        if has_rigid:
            # the fluid/boundary and FSI-rigid source classes are
            # DISJOINT, so one rates() over per-lane-selected source
            # quantities sums exactly the same pair terms as two
            # separate passes (one summation order instead of two —
            # inside the engines' f32 tolerance; saves ~18 VPU
            # ops/lane + 2 lane reductions)
            mj_e = jnp.where(src_rigid, sr(_FMFSI), sr(_FM))
            rhoj_e = jnp.where(src_rigid, sr(_FRHOFSI), sr(_FRHO))
            pj_e = jnp.where(src_rigid, sr(_FPFSI), sr(_FP))
            arho, ap = rates(mj_e, rhoj_e, pj_e, src_flbd | src_rigid)
        else:
            arho, ap = rates(sr(_FM), sr(_FRHO), sr(_FP), src_flbd)

        dest_solid = (q_sb == 1.0) | (q_rg == 1.0)
        gw = dest_solid & src_fluid & in_range
        w = jnp.where(gw, w_all, 0.0)

        def lsum(v):
            return jnp.sum(v, axis=1, keepdims=True)

        gdotx = gx * xij + gy * yij + gz * zij
        return jnp.concatenate(
            [arho, ap,
             lsum(sr(_FU) * w), lsum(sr(_FV) * w), lsum(sr(_FW) * w),
             lsum(w), lsum((sr(_FP) + sr(_FRHO) * gdotx) * w)], axis=1)

    out = cell_pair_pallas(df, dfT, grid.n_occupied, grid.nbr_slots, cfg,
                           compute, 7, interpret=interpret,
                           sent_slot=sent_slot)
    if dense:
        return out
    n = scene.n
    out = unpack(grid, cfg, out, n, 0.0).astype(scene.x.dtype)
    return tuple(out[:, i] for i in range(7))


def wall_bc_pallas(scene, grid: CellGrid, cfg: CellGridConfig,
                   kernel: Kernel, df, dfT, gx: float, gy: float,
                   gz: float, interpret: bool = False,
                   dense: bool = False, sent_slot=None):
    """Pass W: Shepard sums (uf, vf, wf, wij_sum, p_num) for solid
    destinations (``fluid_cell.wall_bc_cell``; Adami BC :145-226)."""
    cutoff = cfg.radius

    def compute(q, sL):
        qc, sr, xij, yij, zij, rij, r2, hij = _pair_geom(q, sL, kernel)
        _, _, q_sb, _, q_rg = _decode_flags(qc(_FFLAGS))
        _, _, _, s_fl, _ = _decode_flags(sr(_FFLAGS))
        dest_solid = (q_sb == 1.0) | (q_rg == 1.0)
        g = dest_solid & (s_fl == 1.0) & (rij <= cutoff)
        w = jnp.where(g, kernel.w(rij, hij), 0.0)

        def lsum(v):
            return jnp.sum(v, axis=1, keepdims=True)

        gdotx = gx * xij + gy * yij + gz * zij
        return jnp.concatenate(
            [lsum(sr(_FU) * w), lsum(sr(_FV) * w), lsum(sr(_FW) * w),
             lsum(w), lsum((sr(_FP) + sr(_FRHO) * gdotx) * w)], axis=1)

    out = cell_pair_pallas(df, dfT, grid.n_occupied, grid.nbr_slots, cfg,
                           compute, 5, interpret=interpret,
                           sent_slot=sent_slot)
    if dense:
        return out
    n = scene.n
    out = unpack(grid, cfg, out, n, 0.0).astype(scene.x.dtype)
    return out[:, 0], out[:, 1], out[:, 2], out[:, 3], out[:, 4]


def _forces_cols(q, sL, kernel: Kernel, cutoff, fluid_alpha, c0,
                 has_rigid):
    """Pass-F per-pair physics -> [M, 6] (au, av, aw, fx, fy, fz):
    pressure gradient + artificial viscosity + the two FSI force terms.
    Shared by the standalone F kernel and the fused F+C kernel so the
    two production paths cannot drift apart."""
    qc, sr, xij, yij, zij, rij, r2, hij = _pair_geom(q, sL, kernel)
    in_range = rij <= cutoff
    _, _, _, q_fl, q_rg = _decode_flags(qc(_FFLAGS))
    _, _, s_sb, s_fl, s_rg = _decode_flags(sr(_FFLAGS))
    dest_fluid = q_fl == 1.0
    dest_rigid = q_rg == 1.0
    src_fluid = s_fl == 1.0
    src_flbd = src_fluid | (s_sb == 1.0)
    src_rigid = s_rg == 1.0

    dw = kernel.gradw_scalar(rij, hij)
    dwx, dwy, dwz = dw * xij, dw * yij, dw * zij
    rhoi, rhoj = qc(_FRHO), sr(_FRHO)
    pi, pj = qc(_FP), sr(_FP)
    mj = sr(_FM)

    def lsum(v):
        return jnp.sum(v, axis=1, keepdims=True)

    if has_rigid:
        # fluid/boundary and FSI-rigid pressure-gradient source classes
        # are DISJOINT: one term over per-lane-selected (mj, rhoj, pj)
        # sums the same pairs as the two separate terms (one summation
        # order; saves ~12 VPU ops/lane + 3 lane reductions)
        mj_e = jnp.where(src_rigid, sr(_FMFSI), mj)
        rhoj_e = jnp.where(src_rigid, sr(_FRHOFSI), rhoj)
        pj_e = jnp.where(src_rigid, sr(_FPFSI), pj)
        g_pg = dest_fluid & (src_flbd | src_rigid) & in_range
    else:
        mj_e, rhoj_e, pj_e = mj, rhoj, pj
        g_pg = dest_fluid & src_flbd & in_range
    pij = pi / (rhoi * rhoi) + pj_e / (rhoj_e * rhoj_e)
    t = jnp.where(g_pg, -mj_e * pij, 0.0)
    au, av, aw = lsum(t * dwx), lsum(t * dwy), lsum(t * dwz)

    if abs(fluid_alpha) > 1e-14:
        uij = qc(_FU) - sr(_FU)
        vij = qc(_FV) - sr(_FV)
        wij_v = qc(_FW) - sr(_FW)
        vdotx = uij * xij + vij * yij + wij_v * zij
        eps = 0.01 * hij * hij
        muij = hij * vdotx / (r2 + eps)
        piij = jnp.where(
            (vdotx < 0.0) & dest_fluid & src_fluid & in_range,
            -fluid_alpha * c0 * muij * mj * (2.0 / (rhoi + rhoj)), 0.0)
        au = au + lsum(-piij * dwx)
        av = av + lsum(-piij * dwy)
        aw = aw + lsum(-piij * dwz)

    if has_rigid:
        g_fr = dest_rigid & src_fluid & in_range
        mfsi_i, rhofsi_i = qc(_FMFSI), qc(_FRHOFSI)
        t1 = pj / (rhoj * rhoj) + qc(_FPFSI) / jnp.maximum(
            rhofsi_i * rhofsi_i, 1e-30)
        fac = jnp.where(g_fr, -mfsi_i * mj * t1, 0.0)
        fx, fy, fz = lsum(fac * dwx), lsum(fac * dwy), lsum(fac * dwz)
    else:
        fx = jnp.zeros_like(au)
        fy, fz = fx, fx
    return jnp.concatenate([au, av, aw, fx, fy, fz], axis=1)


def fluid_forces_pallas(scene, grid: CellGrid, cfg: CellGridConfig,
                        kernel: Kernel, df, dfT, fluid_alpha: float,
                        c0: float, has_rigid: bool,
                        interpret: bool = False, dense: bool = False,
                        sent_slot=None):
    """Pass F: fluid au/av/aw (pressure gradient + artificial viscosity
    + rigid->fluid) and the fluid->rigid force
    (``fluid_cell.fluid_forces_cell``; reference :489-554).

    NOTE: ``df``/``dfT`` must be packed AFTER the wall-BC pressure
    update (p, p_fsi current) — the XLA engine patches stale columns
    instead; repacking is the fused equivalent."""
    cutoff = cfg.radius

    def compute(q, sL):
        return _forces_cols(q, sL, kernel, cutoff, fluid_alpha, c0,
                            has_rigid)

    out = cell_pair_pallas(df, dfT, grid.n_occupied, grid.nbr_slots, cfg,
                           compute, 6, interpret=interpret,
                           sent_slot=sent_slot)
    if dense:
        return out
    n = scene.n
    out = unpack(grid, cfg, out, n, 0.0).astype(scene.x.dtype)
    return tuple(out[:, i] for i in range(6))


def fluid_forces_contact_pallas(scene, grid: CellGrid,
                                cfg: CellGridConfig, kernel: Kernel,
                                df, dfT, fluid_alpha: float, c0: float,
                                has_rigid: bool, S: int,
                                init_dist: float,
                                interpret: bool = False,
                                sent_slot=None):
    """Fused pass F+C: the fluid momentum/FSI pass AND the full Mofidi
    contact pair pipeline (``pallas_contact._pair_body`` on the union
    layout) in ONE kernel sweep -> dense [NC, M, Wp + 6] f32 where the
    first Wp(=12S 128-aligned) columns are the contact outputs
    (cfn_x/y/z, wij-sum, dist, closest, 6 source picks — the layout
    ``pallas_contact._unpack_contact_out`` consumes) and the last 6 are
    (au, av, aw, fx, fy, fz).

    Both passes must run at the post-wall-BC state on the same grid
    (reference group order :726-797), and each would separately DMA the
    same 9/27 stencil blocks — the per-cell DMA issue cost that bounds
    all these kernels.  One sweep halves it; the contact math reads the
    fluid pack's m/rho/flags columns directly (no second pack)."""
    from .pallas_contact import _pair_body

    cutoff = cfg.radius
    W12 = 12 * S
    # the 6 force columns sit right after the 12S contact columns and
    # the whole block pads to a 128 multiple (misaligned VMEM->HBM
    # copy-out runs ~40x off bandwidth — see pallas_contact._pair_body's
    # padding note); for typical S the forces ride the contact block's
    # existing alignment pad at zero extra width
    Wtot = -(-(W12 + 6) // 128) * 128

    def compute(q, sL):
        force_cols = _forces_cols(q, sL, kernel, cutoff, fluid_alpha,
                                  c0, has_rigid)
        contact_cols = _pair_body(S, q.shape[0], cutoff, float(init_dist),
                                  kernel, q, sL, two_d=False, union=True)
        cols = jnp.concatenate([contact_cols[:, :W12], force_cols],
                               axis=1)
        if W12 + 6 < Wtot:
            cols = jnp.concatenate(
                [cols, jnp.zeros((q.shape[0], Wtot - W12 - 6),
                                 jnp.float32)], axis=1)
        return cols

    return cell_pair_pallas(df, dfT, grid.n_occupied, grid.nbr_slots,
                            cfg, compute, Wtot, interpret=interpret,
                            sent_slot=sent_slot)
