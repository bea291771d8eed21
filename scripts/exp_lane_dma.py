"""Contact-kernel variant: lane-granular stencil DMAs.

The committed kernel copies each stencil slot's FULL [F, 128] dfT row
(112 of the lanes are sentinel pad) into a per-slot scratch block, then
assembles sL [F, OM] by concatenating O sliced [F, M] blocks — lane
shuffles on the VPU every cell.  This variant copies only the M real
lanes of each row and lands them DIRECTLY at lane window [o*M, (o+1)*M)
of a single [F, OM] scratch buffer: sL is then just scratch[buf] (no
concat, no slices) and the stencil DMA bandwidth drops 8x.

Bit-compared against the committed kernel on the bench scene.
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


def _kernel_lane(S, M, O, cutoff, init_dist, kernel, two_d,
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
                dft_hbm.at[nbr_row[row, o], :, pl.ds(0, M)],
                scratch.at[buf, :, pl.ds(o * M, M)],
                sems.at[buf, o]).start()

    @pl.when((c == 0) & (n_occ > 0))
    def _():
        start_dmas(0, nbr_now, 0)

    def compute(b):
        buf = b % 2
        for o in range(O):
            pltpu.make_async_copy(
                dft_hbm.at[nbr_now[b, o], :, pl.ds(0, M)],
                scratch.at[buf, :, pl.ds(o * M, M)],
                sems.at[buf, o]).wait()
        qT = jax.lax.dot_general(
            isel, q_ref[b], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        sL = scratch[buf]                       # [F, OM], no concat
        return pc._pair_body(S, M, cutoff, init_dist, kernel, qT, sL,
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


def contact_sums_lane(src_l, n_occ, nbr_slots, cfg, kernel, S, init_dist,
                      sent_slot):
    NC, O = nbr_slots.shape
    M = cfg.M
    F = src_l.shape[1]
    kern = functools.partial(_kernel_lane, S, M, O, cfg.radius,
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
            pltpu.VMEM((2, F, O * M), jnp.float32),
            pltpu.SemaphoreType.DMA((2, O)),
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
    base, _ = timeit(basej, dfT, grid.n_occupied, grid.nbr_slots,
                     sent_slot, name="base (committed kernel)")

    lanej = jax.jit(lambda d, n, nb, ss: contact_sums_lane(
        d, n, nb, cfg, kernel, S, init_dist, ss))
    out, _ = timeit(lanej, dfT, grid.n_occupied, grid.nbr_slots,
                    sent_slot, name="lane-DMA (no concat)")
    nocc = int(grid.n_occupied)
    a = np.asarray(base[:nocc])
    b = np.asarray(out[:nocc])
    print(f"   bitsame vs base: {np.array_equal(a, b)}"
          f"  max|diff|={np.max(np.abs(a - b)):.3e}", flush=True)


# NOTE: the lane-DMA variant FAILS to compile on v5e — Mosaic requires
# HBM slice shapes 128-lane aligned ("Slice shape along dimension 2 must
# be aligned to tiling (128), but is 16").  Lane-granular stencil DMAs
# are not expressible; kept for the record.

# ---- timing-only ablation: concat cost (sL <- free broadcast) ----------

def _kernel_noconcat(S, M, O, cutoff, init_dist, kernel, two_d,
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

    @pl.when((c == 0) & (n_occ > 0))
    def _():
        start_dmas(0, nbr_now, 0)

    def compute(b):
        buf = b % 2
        for o in range(O):
            pltpu.make_async_copy(
                dft_hbm.at[nbr_now[b, o]], scratch.at[buf, o],
                sems.at[buf, o]).wait()
        qT = jax.lax.dot_general(
            isel, q_ref[b], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # WRONG VALUES, timing only: two full 128-lane blocks (aligned
        # concat, no sub-128 shuffles) instead of the 16-block concat
        sL = jnp.concatenate([scratch[buf, 0], scratch[buf, 1]], axis=1)
        return pc._pair_body(S, M, cutoff, init_dist, kernel, qT, sL,
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


def contact_sums_noconcat(src_l, n_occ, nbr_slots, cfg, kernel, S,
                          init_dist, sent_slot):
    NC, O = nbr_slots.shape
    M = cfg.M
    F = src_l.shape[1]
    kern = functools.partial(_kernel_noconcat, S, M, O, cfg.radius,
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
            pltpu.VMEM((2, O, F, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, O)),
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


def main_ablate():
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
    ncj = jax.jit(lambda d, n, nb, ss: contact_sums_noconcat(
        d, n, nb, cfg, kernel, S, init_dist, ss))
    timeit(ncj, dfT, grid.n_occupied, grid.nbr_slots, sent_slot,
           name="ablate: no sL concat (wrong values)")


if os.environ.get("NOCONCAT"):
    main = main_ablate


if __name__ == "__main__":
    main_ablate() if os.environ.get("NOCONCAT") else main()
