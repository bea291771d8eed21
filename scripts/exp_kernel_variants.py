"""Measure Pallas contact-kernel variants at BENCH_N on the real TPU.

Variants (all fed the identical sorted-path dfT/stencil inputs):
  base   — the committed kernel (2-deep DMA pipeline, 2-loop tie-break)
  deep   — D-deep revolving DMA buffer (start copies D-1 cells ahead)
  fuse   — single-loop closest-point tie-break (masks partition lanes,
           so each slot's min is final within its own iteration)
  both   — deep + fuse

Each variant's [NC, M, Wp] output is bit-compared against base.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import build_scene
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops import pallas_contact as pc
from rigid_body_2d_3d_pysph_tpu.ops import pallas_pack
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel

_B = pc._B
_BIG = pc._BIG


def _pair_body_fused(S, M, cutoff, init_dist, kernel, qT, sL, two_d=False):
    """_pair_body with the two tie-break loops merged into one."""
    if two_d:
        (FX, FY, FU, FV, FVOL, FH, FFLAGS) = range(7)
    else:
        (FX, FY, FZ, FU, FV, FW, FVOL, FH, FFLAGS) = range(9)

    def qcol(f):
        return qT[:, f:f + 1]

    def srow(f):
        return sL[f:f + 1, :]

    xij = qcol(FX) - srow(FX)
    yij = qcol(FY) - srow(FY)
    if two_d:
        rij = jnp.sqrt(xij * xij + yij * yij)
    else:
        zij = qcol(FZ) - srow(FZ)
        rij = jnp.sqrt(xij * xij + yij * yij + zij * zij)
    hij = 0.5 * (qcol(FH) + srow(FH))
    wij = kernel.w(rij, hij)

    s_dem, s_bdry, s_fluid, _ = pc._decode_flags(srow(FFLAGS))
    q_dem, _, _, q_rigid = pc._decode_flags(qcol(FFLAGS))
    gate = ((s_bdry == 1.0)
            & (s_dem != q_dem)
            & (s_fluid == 0.0)
            & (q_rigid == 1.0)
            & (rij <= cutoff))
    rinv = 1.0 / jnp.maximum(rij, 1e-30)
    t1 = jnp.where(gate, qcol(FVOL) * rinv * wij, 0.0)
    t2 = t1 * rij

    oh_rows = [s_dem == float(s_id) for s_id in range(S)]
    ohT = jnp.concatenate(
        [jnp.where(m, 1.0, 0.0) for m in oh_rows], axis=0)
    zcol = jnp.zeros((M, S), jnp.float32)
    if two_d:
        quant = jnp.concatenate(
            [t1 * xij, t1 * yij, t2, t2 * xij, t2 * yij], axis=0)
    else:
        quant = jnp.concatenate(
            [t1 * xij, t1 * yij, t1 * zij, t2,
             t2 * xij, t2 * yij, t2 * zij], axis=0)
    sums = jax.lax.dot_general(
        quant, ohT, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if two_d:
        q0, q1, q3 = sums[0 * M:1 * M], sums[1 * M:2 * M], sums[2 * M:3 * M]
        q4, q5 = sums[3 * M:4 * M], sums[4 * M:5 * M]
        q2 = q6 = zcol
    else:
        q0, q1, q2 = sums[0 * M:1 * M], sums[1 * M:2 * M], sums[2 * M:3 * M]
        q3, q4, q5, q6 = (sums[3 * M:4 * M], sums[4 * M:5 * M],
                          sums[5 * M:6 * M], sums[6 * M:7 * M])

    # ---- fused closest-source tie-break --------------------------------
    r_g = jnp.where(gate, rij, _BIG)
    lane = jax.lax.broadcasted_iota(jnp.int32, r_g.shape, 1
                                    ).astype(jnp.float32)
    mins, lane_b = [], jnp.zeros_like(r_g)
    for s_id, m in enumerate(oh_rows):
        r_m = jnp.where(m, r_g, _BIG)
        mn = jnp.min(r_m, axis=1, keepdims=True)
        mins.append(mn)
        ls = jnp.min(jnp.where(r_m <= mn, lane, _BIG), axis=1,
                     keepdims=True)
        lane_b = jnp.where(m, ls, lane_b)
    min_r = jnp.concatenate(mins, axis=1)
    pickf = jnp.where(gate & (lane == lane_b), 1.0, 0.0)

    src_fields = (FX, FY, FU, FV) if two_d else (FX, FY, FZ, FU, FV, FW)
    A = jnp.concatenate([srow(f) * ohT for f in src_fields], axis=0)
    srcs = jax.lax.dot_general(
        pickf, A, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if two_d:
        srcs = jnp.concatenate(
            [srcs[:, 0:S], srcs[:, S:2 * S], zcol,
             srcs[:, 2 * S:3 * S], srcs[:, 3 * S:4 * S], zcol], axis=1)

    has = q3 > 1e-12
    inv_w = jnp.where(has, 1.0 / jnp.maximum(q3, 1e-30), 0.0)
    mx, my, mz = q0 * inv_w, q1 * inv_w, q2 * inv_w
    mag = jnp.sqrt(mx * mx + my * my + mz * mz)
    inv_m = jnp.where(has & (mag > 0), 1.0 / jnp.maximum(mag, 1e-30), 0.0)
    cfn_x, cfn_y, cfn_z = mx * inv_m, my * inv_m, mz * inv_m
    num = cfn_x * q4 + cfn_y * q5 + cfn_z * q6
    dist = jnp.where(has, num / jnp.where(has, q3, 1.0), 0.0)
    foundf = jnp.where(min_r < init_dist, 1.0, 0.0)
    mind = jnp.minimum(min_r, init_dist)
    srcs = srcs * jnp.concatenate([foundf] * 6, axis=1)

    cols = jnp.concatenate(
        [cfn_x, cfn_y, cfn_z, q3, dist, mind, srcs], axis=1)
    W = 12 * S
    Wp = -(-W // 128) * 128
    if Wp != W:
        cols = jnp.concatenate(
            [cols, jnp.zeros((M, Wp - W), jnp.float32)], axis=1)
    return cols


def make_kernel(D, pair_body):
    """D-deep revolving-buffer variant of pc._kernel."""

    def _kernel(S, M, O, cutoff, init_dist, kernel, two_d,
                n_occ_ref, q_ref, nbr_now, nbr_nxt, dft_hbm, out_ref,
                scratch, sems):
        c = pl.program_id(0)
        n_occ = n_occ_ref[0]
        isel = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (M, 128), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1), 1.0, 0.0)

        def start_dmas(buf, nbr_row, row):
            for o in range(O):
                pltpu.make_async_copy(
                    dft_hbm.at[nbr_row[row, o]], scratch.at[buf, o],
                    sems.at[buf, o]).start()

        # prime the pipeline: program 0 starts cells 0..D-2
        @pl.when(c == 0)
        def _():
            for j in range(D - 1):
                @pl.when(j < n_occ)
                def _(j=j):
                    start_dmas(j % D, nbr_now, j)

        def compute(b):
            buf = b % D
            for o in range(O):
                pltpu.make_async_copy(
                    dft_hbm.at[nbr_now[b, o]], scratch.at[buf, o],
                    sems.at[buf, o]).wait()
            qT = jax.lax.dot_general(
                isel, q_ref[b], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            sL = jnp.concatenate(
                [scratch[buf, o][:, :M] for o in range(O)], axis=1)
            return pair_body(S, M, cutoff, init_dist, kernel, qT, sL,
                             two_d=two_d)

        base = c * _B
        for b in range(_B):
            g = base + b
            # start cell g+D-1's copies (the deepest prefetch)
            tgt = b + D - 1
            if tgt < _B:
                @pl.when(g + D - 1 < n_occ)
                def _(b=b, tgt=tgt):
                    start_dmas(tgt % D, nbr_now, tgt)
            else:
                @pl.when(g + D - 1 < n_occ)
                def _(b=b, tgt=tgt):
                    start_dmas(tgt % D, nbr_nxt, tgt - _B)
            @pl.when(g < n_occ)
            def _(b=b):
                out_ref[b] = compute(b)

    return _kernel


def contact_sums_variant(kern_body, D, src_l, n_occ, nbr_slots, cfg,
                         kernel, S, init_dist, sent_slot):
    NC, O = nbr_slots.shape
    M = cfg.M
    F = src_l.shape[1]
    kern = functools.partial(kern_body, S, M, O, cfg.radius,
                             float(init_dist), kernel, cfg.dim == 2)
    W = -(-12 * S // 128) * 128
    NCp = -(-NC // _B) * _B
    nprog = NCp // _B
    n_occ_i = jnp.minimum(jnp.asarray(n_occ, jnp.int32), NCp)
    nprog_dyn = (jnp.maximum(n_occ_i, 0) + _B - 1) // _B
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprog_dyn,),
        in_specs=[
            pl.BlockSpec((_B, F, 128), lambda c, n: (c, 0, 0),
                         memory_space=pltpu.VMEM),
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
            pltpu.VMEM((D, O, F, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((D, O)),
        ],
    )
    slots = jnp.where(nbr_slots < NC, nbr_slots, sent_slot).astype(jnp.int32)
    if NCp != NC:
        slots = jnp.concatenate(
            [slots, jnp.broadcast_to(jnp.asarray(sent_slot, jnp.int32),
                                     (NCp - NC, O))], axis=0)
    rows = src_l.shape[0]
    target = max(NCp, -(-rows // _B) * _B)
    if rows < target:
        src_l = jnp.concatenate(
            [src_l,
             jnp.broadcast_to(
                 jnp.asarray(pc.sent_fields(cfg.dim == 2),
                             src_l.dtype)[None, :, None],
                 (target - rows, F, 128))], axis=0)
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NCp, M, W), jnp.float32),
    )(jnp.asarray(n_occ, jnp.int32).reshape(1), src_l, slots, slots, src_l)
    return out[:NC]


def timeit(fn, *args, n=10, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    el = (time.perf_counter() - t0) / n * 1000
    print(f"{name:42s} {el:8.2f} ms", flush=True)
    return out, el


def main():
    scheme, scene = build_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    cfg = scheme.cell_config(scene, kernel)
    S = scene.meta.total_no_bodies
    init_dist = 4.0 * scene.meta.spacing0
    print(f"n={scene.n} NC_max={cfg.NC_max} M={cfg.M} S={S}")

    payload = pc.contact_payload(scene, cfg.dim == 2)
    buildj = jax.jit(lambda s: cellmod.build_cell_grid_packed(
        s.x, s.y, s.z, s.active, cfg, pc.contact_payload(s, cfg.dim == 2)))
    (grid, pt) = buildj(scene)
    jax.block_until_ready(grid)
    dftj = jax.jit(lambda p, n: pallas_pack.expand_dft_pallas(
        p, n, cfg, pc.sent_fields(cfg.dim == 2)))
    dfT = dftj(pt, grid.n_occupied)
    jax.block_until_ready(dfT)
    sent_slot = jnp.minimum(grid.n_occupied, cfg.NC_max)

    basej = jax.jit(lambda d, n, nb, ss: pc.contact_sums_pallas(
        d, n, nb, cfg, kernel, S, init_dist, sent_slot=ss))
    base, _ = timeit(basej, dfT, grid.n_occupied, grid.nbr_slots,
                     sent_slot, name="base (committed kernel)")

    variants = [
        ("deep D=4", make_kernel(4, pc._pair_body), 4),
        ("fuse tie-break D=2", make_kernel(2, _pair_body_fused), 2),
        ("both D=4+fuse", make_kernel(4, _pair_body_fused), 4),
        ("deep D=8", make_kernel(8, pc._pair_body), 8),
    ]
    for name, kb, D in variants:
        vj = jax.jit(lambda d, n, nb, ss, kb=kb, D=D: contact_sums_variant(
            kb, D, d, n, nb, cfg, kernel, S, init_dist, ss))
        out, _ = timeit(vj, dfT, grid.n_occupied, grid.nbr_slots,
                        sent_slot, name=name)
        nocc = int(grid.n_occupied)
        a = np.asarray(base[:nocc])
        b = np.asarray(out[:nocc])
        print(f"   bitsame vs base: {np.array_equal(a, b)}"
              f"  max|diff|={np.max(np.abs(a - b)):.3e}", flush=True)


if __name__ == "__main__" and not os.environ.get("ABLATE"):
    main()


# ---------------- timing-only ablations (NOT bit-valid) ----------------

def _pb_ablate(which):
    def body(S, M, cutoff, init_dist, kernel, qT, sL, two_d=False):
        (FX, FY, FU, FV, FVOL, FH, FFLAGS) = range(7)
        def qcol(f):
            return qT[:, f:f + 1]
        def srow(f):
            return sL[f:f + 1, :]
        xij = qcol(FX) - srow(FX)
        yij = qcol(FY) - srow(FY)
        rij = jnp.sqrt(xij * xij + yij * yij)
        hij = 0.5 * (qcol(FH) + srow(FH))
        wij = kernel.w(rij, hij) if which != "nokern" else rij * 0.5
        s_dem, s_bdry, s_fluid, _ = pc._decode_flags(srow(FFLAGS))
        q_dem, _, _, q_rigid = pc._decode_flags(qcol(FFLAGS))
        gate = ((s_bdry == 1.0) & (s_dem != q_dem) & (s_fluid == 0.0)
                & (q_rigid == 1.0) & (rij <= cutoff))
        rinv = 1.0 / jnp.maximum(rij, 1e-30)
        t1 = jnp.where(gate, qcol(FVOL) * rinv * wij, 0.0)
        t2 = t1 * rij
        oh_rows = [s_dem == float(s_id) for s_id in range(S)]
        ohT = jnp.concatenate(
            [jnp.where(m, 1.0, 0.0) for m in oh_rows], axis=0)
        zcol = jnp.zeros((M, S), jnp.float32)
        W = 12 * S
        Wp = -(-W // 128) * 128
        if which == "geom":
            out = jnp.sum(t2, axis=1, keepdims=True) + jnp.sum(
                t1 * xij + t1 * yij, axis=1, keepdims=True)
            return jnp.broadcast_to(out, (M, Wp))
        quant = jnp.concatenate(
            [t1 * xij, t1 * yij, t2, t2 * xij, t2 * yij], axis=0)
        sums = jax.lax.dot_general(
            quant, ohT, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        q0, q1, q3 = sums[0 * M:1 * M], sums[1 * M:2 * M], sums[2 * M:3 * M]
        q4, q5 = sums[3 * M:4 * M], sums[4 * M:5 * M]
        q2 = q6 = zcol
        if which in ("notie", "nokern"):
            min_r = jnp.concatenate([q0] * 1, axis=1) * 0 + init_dist
            srcs = jnp.zeros((M, 6 * S), jnp.float32)
        else:
            r_g = jnp.where(gate, rij, _BIG)
            lane = jax.lax.broadcasted_iota(
                jnp.int32, r_g.shape, 1).astype(jnp.float32)
            mins, min_b = [], jnp.full_like(r_g, _BIG)
            for s_id, m in enumerate(oh_rows):
                mn = jnp.min(jnp.where(m, r_g, _BIG), axis=1, keepdims=True)
                mins.append(mn)
                min_b = jnp.where(m, mn, min_b)
            min_r = jnp.concatenate(mins, axis=1)
            pick = gate & (r_g <= min_b)
            if which == "nolane":
                pickf = jnp.where(pick, 1.0, 0.0)
            else:
                lane_b = jnp.zeros_like(r_g)
                for m in oh_rows:
                    ls = jnp.min(jnp.where(pick & m, lane, _BIG), axis=1,
                                 keepdims=True)
                    lane_b = jnp.where(m, ls, lane_b)
                pickf = jnp.where(pick & (lane == lane_b), 1.0, 0.0)
            if which == "nopickmm":
                srcs = jnp.broadcast_to(
                    jnp.sum(pickf, axis=1, keepdims=True), (M, 6 * S))
            else:
                src_fields = (FX, FY, FU, FV)
                A = jnp.concatenate([srow(f) * ohT for f in src_fields],
                                    axis=0)
                srcs = jax.lax.dot_general(
                    pickf, A, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                srcs = jnp.concatenate(
                    [srcs[:, 0:S], srcs[:, S:2 * S], zcol,
                     srcs[:, 2 * S:3 * S], srcs[:, 3 * S:4 * S], zcol],
                    axis=1)
        has = q3 > 1e-12
        inv_w = jnp.where(has, 1.0 / jnp.maximum(q3, 1e-30), 0.0)
        mx, my, mz = q0 * inv_w, q1 * inv_w, q2 * inv_w
        mag = jnp.sqrt(mx * mx + my * my + mz * mz)
        inv_m = jnp.where(has & (mag > 0),
                          1.0 / jnp.maximum(mag, 1e-30), 0.0)
        cfn_x, cfn_y, cfn_z = mx * inv_m, my * inv_m, mz * inv_m
        num = cfn_x * q4 + cfn_y * q5 + cfn_z * q6
        dist = jnp.where(has, num / jnp.where(has, q3, 1.0), 0.0)
        foundf = jnp.where(min_r < init_dist, 1.0, 0.0)
        mind = jnp.minimum(min_r, init_dist)
        srcs = srcs * jnp.concatenate([foundf] * 6, axis=1)
        cols = jnp.concatenate(
            [cfn_x, cfn_y, cfn_z, q3, dist, mind, srcs], axis=1)
        if Wp != W:
            cols = jnp.concatenate(
                [cols, jnp.zeros((M, Wp - W), jnp.float32)], axis=1)
        return cols
    return body


def main_ablate():
    scheme, scene = build_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    cfg = scheme.cell_config(scene, kernel)
    S = scene.meta.total_no_bodies
    init_dist = 4.0 * scene.meta.spacing0
    print(f"n={scene.n} NC_max={cfg.NC_max} M={cfg.M} S={S}")
    buildj = jax.jit(lambda s: cellmod.build_cell_grid_packed(
        s.x, s.y, s.z, s.active, cfg, pc.contact_payload(s, cfg.dim == 2)))
    (grid, pt) = buildj(scene)
    jax.block_until_ready(grid)
    dftj = jax.jit(lambda p, n: pallas_pack.expand_dft_pallas(
        p, n, cfg, pc.sent_fields(cfg.dim == 2)))
    dfT = dftj(pt, grid.n_occupied)
    jax.block_until_ready(dfT)
    sent_slot = jnp.minimum(grid.n_occupied, cfg.NC_max)
    basej = jax.jit(lambda d, n, nb, ss: pc.contact_sums_pallas(
        d, n, nb, cfg, kernel, S, init_dist, sent_slot=ss))
    timeit(basej, dfT, grid.n_occupied, grid.nbr_slots, sent_slot,
           name="base (full)")
    for which in ("geom", "notie", "nokern", "nolane", "nopickmm"):
        kb = make_kernel(2, _pb_ablate(which))
        vj = jax.jit(lambda d, n, nb, ss, kb=kb: contact_sums_variant(
            kb, 2, d, n, nb, cfg, kernel, S, init_dist, ss))
        timeit(vj, dfT, grid.n_occupied, grid.nbr_slots, sent_slot,
               name=f"ablate:{which}")


if __name__ == "__main__" and os.environ.get("ABLATE"):
    main_ablate()


def make_kernel_nodma(pair_body, dmaonly=False):
    """Timing ablation: skip the stencil DMAs entirely (compute reads
    whatever is in scratch buf 0) or do ONLY the DMAs (write qT bcast)."""

    def _kernel(S, M, O, cutoff, init_dist, kernel, two_d,
                n_occ_ref, q_ref, nbr_now, nbr_nxt, dft_hbm, out_ref,
                scratch, sems):
        c = pl.program_id(0)
        n_occ = n_occ_ref[0]
        isel = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (M, 128), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1), 1.0, 0.0)

        def start_dmas(buf, nbr_row, row):
            for o in range(O):
                pltpu.make_async_copy(
                    dft_hbm.at[nbr_row[row, o]], scratch.at[buf, o],
                    sems.at[buf, o]).start()

        if dmaonly:
            @pl.when(c == 0)
            def _():
                start_dmas(0, nbr_now, 0)

        def compute(b):
            buf = b % 2
            if dmaonly:
                for o in range(O):
                    pltpu.make_async_copy(
                        dft_hbm.at[nbr_now[b, o]], scratch.at[buf, o],
                        sems.at[buf, o]).wait()
            qT = jax.lax.dot_general(
                isel, q_ref[b], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if dmaonly:
                W = -(-12 * S // 128) * 128
                s0 = scratch[buf, 0][:, :M]
                return jnp.broadcast_to(
                    jnp.sum(qT, axis=1, keepdims=True)
                    + jnp.sum(s0, axis=0, keepdims=True).T[:M], (M, W))
            sL = jnp.concatenate(
                [scratch[0, o][:, :M] for o in range(O)], axis=1)
            return pair_body(S, M, cutoff, init_dist, kernel, qT, sL,
                             two_d=two_d)

        base = c * _B
        for b in range(_B):
            g = base + b
            if dmaonly:
                if b + 1 < _B:
                    @pl.when(g + 1 < n_occ)
                    def _(b=b):
                        start_dmas((b + 1) % 2, nbr_now, b + 1)
                else:
                    @pl.when(g + 1 < n_occ)
                    def _():
                        start_dmas(0, nbr_nxt, 0)
            @pl.when(g < n_occ)
            def _(b=b):
                out_ref[b] = compute(b)

    return _kernel


def main_dma():
    scheme, scene = build_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    cfg = scheme.cell_config(scene, kernel)
    S = scene.meta.total_no_bodies
    init_dist = 4.0 * scene.meta.spacing0
    print(f"n={scene.n} NC_max={cfg.NC_max} M={cfg.M} O={cfg.O} S={S}")
    buildj = jax.jit(lambda s: cellmod.build_cell_grid_packed(
        s.x, s.y, s.z, s.active, cfg, pc.contact_payload(s, cfg.dim == 2)))
    (grid, pt) = buildj(scene)
    jax.block_until_ready(grid)
    dftj = jax.jit(lambda p, n: pallas_pack.expand_dft_pallas(
        p, n, cfg, pc.sent_fields(cfg.dim == 2)))
    dfT = dftj(pt, grid.n_occupied)
    jax.block_until_ready(dfT)
    sent_slot = jnp.minimum(grid.n_occupied, cfg.NC_max)
    basej = jax.jit(lambda d, n, nb, ss: pc.contact_sums_pallas(
        d, n, nb, cfg, kernel, S, init_dist, sent_slot=ss))
    timeit(basej, dfT, grid.n_occupied, grid.nbr_slots, sent_slot,
           name="base (full)")
    for name, kb in (("nodma (full compute)",
                      make_kernel_nodma(pc._pair_body)),
                     ("dmaonly (no pair math)",
                      make_kernel_nodma(None, dmaonly=True))):
        vj = jax.jit(lambda d, n, nb, ss, kb=kb: contact_sums_variant(
            kb, 2, d, n, nb, cfg, kernel, S, init_dist, ss))
        timeit(vj, dfT, grid.n_occupied, grid.nbr_slots, sent_slot,
               name=name)


if __name__ == "__main__" and os.environ.get("DMA"):
    main_dma()


def _pair_body_merged(S, M, cutoff, init_dist, kernel, qT, sL, two_d=False):
    """Exact variant: ONE dot_general for the quantity sums AND the
    closest-source pick (stacked lhs rows, stacked rhs rows, diagonal
    blocks sliced) — each output dot product is unchanged, so bit-same."""
    if two_d:
        (FX, FY, FU, FV, FVOL, FH, FFLAGS) = range(7)
    else:
        (FX, FY, FZ, FU, FV, FW, FVOL, FH, FFLAGS) = range(9)

    def qcol(f):
        return qT[:, f:f + 1]

    def srow(f):
        return sL[f:f + 1, :]

    xij = qcol(FX) - srow(FX)
    yij = qcol(FY) - srow(FY)
    if two_d:
        rij = jnp.sqrt(xij * xij + yij * yij)
    else:
        zij = qcol(FZ) - srow(FZ)
        rij = jnp.sqrt(xij * xij + yij * yij + zij * zij)
    hij = 0.5 * (qcol(FH) + srow(FH))
    wij = kernel.w(rij, hij)
    s_dem, s_bdry, s_fluid, _ = pc._decode_flags(srow(FFLAGS))
    q_dem, _, _, q_rigid = pc._decode_flags(qcol(FFLAGS))
    gate = ((s_bdry == 1.0) & (s_dem != q_dem) & (s_fluid == 0.0)
            & (q_rigid == 1.0) & (rij <= cutoff))
    rinv = 1.0 / jnp.maximum(rij, 1e-30)
    t1 = jnp.where(gate, qcol(FVOL) * rinv * wij, 0.0)
    t2 = t1 * rij

    oh_rows = [s_dem == float(s_id) for s_id in range(S)]
    ohT = jnp.concatenate(
        [jnp.where(m, 1.0, 0.0) for m in oh_rows], axis=0)
    zcol = jnp.zeros((M, S), jnp.float32)

    # tie-break first (pickf feeds the merged contraction)
    r_g = jnp.where(gate, rij, _BIG)
    lane = jax.lax.broadcasted_iota(jnp.int32, r_g.shape, 1
                                    ).astype(jnp.float32)
    mins, min_b = [], jnp.full_like(r_g, _BIG)
    for s_id, m in enumerate(oh_rows):
        mn = jnp.min(jnp.where(m, r_g, _BIG), axis=1, keepdims=True)
        mins.append(mn)
        min_b = jnp.where(m, mn, min_b)
    min_r = jnp.concatenate(mins, axis=1)
    pick = gate & (r_g <= min_b)
    lane_b = jnp.zeros_like(r_g)
    for m in oh_rows:
        ls = jnp.min(jnp.where(pick & m, lane, _BIG), axis=1,
                     keepdims=True)
        lane_b = jnp.where(m, ls, lane_b)
    pickf = jnp.where(pick & (lane == lane_b), 1.0, 0.0)

    if two_d:
        quant = jnp.concatenate(
            [t1 * xij, t1 * yij, t2, t2 * xij, t2 * yij], axis=0)
    else:
        quant = jnp.concatenate(
            [t1 * xij, t1 * yij, t1 * zij, t2,
             t2 * xij, t2 * yij, t2 * zij], axis=0)
    src_fields = (FX, FY, FU, FV) if two_d else (FX, FY, FZ, FU, FV, FW)
    A = jnp.concatenate([srow(f) * ohT for f in src_fields], axis=0)
    nq = quant.shape[0]
    lhs = jnp.concatenate([quant, pickf], axis=0)       # [nq+M, OM]
    rhs = jnp.concatenate([ohT, A], axis=0)             # [S+|src|*S, OM]
    big = jax.lax.dot_general(
        lhs, rhs, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # [nq+M, S(1+|src|)]
    sums = big[:nq, :S]
    srcs = big[nq:, S:]
    if two_d:
        q0, q1, q3 = sums[0 * M:1 * M], sums[1 * M:2 * M], sums[2 * M:3 * M]
        q4, q5 = sums[3 * M:4 * M], sums[4 * M:5 * M]
        q2 = q6 = zcol
        srcs = jnp.concatenate(
            [srcs[:, 0:S], srcs[:, S:2 * S], zcol,
             srcs[:, 2 * S:3 * S], srcs[:, 3 * S:4 * S], zcol], axis=1)
    else:
        q0, q1, q2 = sums[0 * M:1 * M], sums[1 * M:2 * M], sums[2 * M:3 * M]
        q3, q4, q5, q6 = (sums[3 * M:4 * M], sums[4 * M:5 * M],
                          sums[5 * M:6 * M], sums[6 * M:7 * M])

    has = q3 > 1e-12
    inv_w = jnp.where(has, 1.0 / jnp.maximum(q3, 1e-30), 0.0)
    mx, my, mz = q0 * inv_w, q1 * inv_w, q2 * inv_w
    mag = jnp.sqrt(mx * mx + my * my + mz * mz)
    inv_m = jnp.where(has & (mag > 0), 1.0 / jnp.maximum(mag, 1e-30), 0.0)
    cfn_x, cfn_y, cfn_z = mx * inv_m, my * inv_m, mz * inv_m
    num = cfn_x * q4 + cfn_y * q5 + cfn_z * q6
    dist = jnp.where(has, num / jnp.where(has, q3, 1.0), 0.0)
    foundf = jnp.where(min_r < init_dist, 1.0, 0.0)
    mind = jnp.minimum(min_r, init_dist)
    srcs = srcs * jnp.concatenate([foundf] * 6, axis=1)
    cols = jnp.concatenate(
        [cfn_x, cfn_y, cfn_z, q3, dist, mind, srcs], axis=1)
    W = 12 * S
    Wp = -(-W // 128) * 128
    if Wp != W:
        cols = jnp.concatenate(
            [cols, jnp.zeros((M, Wp - W), jnp.float32)], axis=1)
    return cols


def make_kernel_noisel(pair_body):
    """Timing ablation: constant qT (no per-cell transpose matmul)."""

    def _kernel(S, M, O, cutoff, init_dist, kernel, two_d,
                n_occ_ref, q_ref, nbr_now, nbr_nxt, dft_hbm, out_ref,
                scratch, sems):
        c = pl.program_id(0)
        n_occ = n_occ_ref[0]
        F = 7 if two_d else 9

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
            qT = (jax.lax.broadcasted_iota(jnp.int32, (M, F), 0)
                  .astype(jnp.float32) * 0.01
                  + jax.lax.broadcasted_iota(jnp.int32, (M, F), 1)
                  .astype(jnp.float32)
                  + q_ref[b, 0, 0])  # depends on input: not hoistable
            sL = jnp.concatenate(
                [scratch[buf, o][:, :M] for o in range(O)], axis=1)
            return pair_body(S, M, cutoff, init_dist, kernel, qT, sL,
                             two_d=two_d)

        base = c * _B
        for b in range(_B):
            g = base + b
            if b + 1 < _B:
                @pl.when(g + 1 < n_occ)
                def _(b=b):
                    start_dmas((b + 1) % 2, nbr_now, b + 1)
            else:
                @pl.when(g + 1 < n_occ)
                def _():
                    start_dmas(0, nbr_nxt, 0)
            @pl.when(g < n_occ)
            def _(b=b):
                out_ref[b] = compute(b)

    return _kernel


def main_mm():
    scheme, scene = build_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    cfg = scheme.cell_config(scene, kernel)
    S = scene.meta.total_no_bodies
    init_dist = 4.0 * scene.meta.spacing0
    print(f"n={scene.n} NC_max={cfg.NC_max} M={cfg.M} S={S}")
    buildj = jax.jit(lambda s: cellmod.build_cell_grid_packed(
        s.x, s.y, s.z, s.active, cfg, pc.contact_payload(s, cfg.dim == 2)))
    (grid, pt) = buildj(scene)
    jax.block_until_ready(grid)
    dftj = jax.jit(lambda p, n: pallas_pack.expand_dft_pallas(
        p, n, cfg, pc.sent_fields(cfg.dim == 2)))
    dfT = dftj(pt, grid.n_occupied)
    jax.block_until_ready(dfT)
    sent_slot = jnp.minimum(grid.n_occupied, cfg.NC_max)
    basej = jax.jit(lambda d, n, nb, ss: pc.contact_sums_pallas(
        d, n, nb, cfg, kernel, S, init_dist, sent_slot=ss))
    base, _ = timeit(basej, dfT, grid.n_occupied, grid.nbr_slots,
                     sent_slot, name="base (full)")
    kb = make_kernel(2, _pair_body_merged)
    vj = jax.jit(lambda d, n, nb, ss: contact_sums_variant(
        kb, 2, d, n, nb, cfg, kernel, S, init_dist, ss))
    out, _ = timeit(vj, dfT, grid.n_occupied, grid.nbr_slots, sent_slot,
                    name="merged-mm (exact)")
    nocc = int(grid.n_occupied)
    a, b = np.asarray(base[:nocc]), np.asarray(out[:nocc])
    print(f"   bitsame vs base: {np.array_equal(a, b)}"
          f"  max|diff|={np.max(np.abs(a - b)):.3e}")
    kb2 = make_kernel_noisel(pc._pair_body)
    vj2 = jax.jit(lambda d, n, nb, ss: contact_sums_variant(
        kb2, 2, d, n, nb, cfg, kernel, S, init_dist, ss))
    timeit(vj2, dfT, grid.n_occupied, grid.nbr_slots, sent_slot,
           name="ablate:noisel")
    kb3 = make_kernel_noisel(_pair_body_merged)
    vj3 = jax.jit(lambda d, n, nb, ss: contact_sums_variant(
        kb3, 2, d, n, nb, cfg, kernel, S, init_dist, ss))
    timeit(vj3, dfT, grid.n_occupied, grid.nbr_slots, sent_slot,
           name="ablate:noisel+merged")


if __name__ == "__main__" and os.environ.get("MM"):
    main_mm()
