"""Bisect the one-jit epilogue slowdown: which composition step makes
the fused program 3x the sum of its phases?"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

from bench import build_scene
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops import pallas_contact as pcops
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel


def timeit(fn, *args, n=10, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    el = (time.perf_counter() - t0) / n * 1000
    print(f"{name:52s} {el:8.2f} ms", flush=True)
    return out


def main():
    scheme, scene = build_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    cfg = scheme.cell_config(scene, kernel)
    S = scene.meta.total_no_bodies
    n = scene.n
    grid = jax.jit(lambda s: cellmod.build_cell_grid(
        s.x, s.y, s.z, s.active, cfg))(scene)
    df = jax.jit(lambda s, g: pcops.pack_for_contact(s, g, cfg))(scene, grid)
    NC, M, F = df.shape
    sent = jnp.broadcast_to(jnp.asarray(pcops.sent_fields(cfg.dim == 2), df.dtype), (M, F))[None]
    dfT = jnp.swapaxes(jnp.concatenate([df, sent], axis=0), 1, 2)
    if M < 128:
        pad = jnp.broadcast_to(
            jnp.asarray(pcops.sent_fields(cfg.dim == 2), df.dtype)[None, :, None],
            (NC + 1, F, 128 - M))
        dfT = jnp.concatenate([dfT, pad], axis=2)
    out = jax.jit(lambda b, c, d: pcops.contact_sums_pallas(
        b, c, d, cfg, kernel, S))(dfT, grid.n_occupied,
                                  grid.nbr_slots)
    jax.block_until_ready(out)
    init_dist = 4.0 * scene.meta.spacing0

    def norms(out):
        sums = out[..., 0:7 * S].reshape(NC, M, 7, S)
        min_r = out[..., 7 * S:8 * S]
        srcs = out[..., 8 * S:14 * S].reshape(NC, M, 6, S)
        sx, sy, sz = sums[:, :, 0], sums[:, :, 1], sums[:, :, 2]
        sw = sums[:, :, 3]
        has = sw > 1e-12
        inv_w = jnp.where(has, 1.0 / jnp.maximum(sw, 1e-30), 0.0)
        mx, my, mz = sx * inv_w, sy * inv_w, sz * inv_w
        mag = jnp.sqrt(mx * mx + my * my + mz * mz)
        inv_m = jnp.where(has & (mag > 0),
                          1.0 / jnp.maximum(mag, 1e-30), 0.0)
        cfn_x, cfn_y, cfn_z = mx * inv_m, my * inv_m, mz * inv_m
        num = (cfn_x * sums[:, :, 4] + cfn_y * sums[:, :, 5]
               + cfn_z * sums[:, :, 6])
        dist = jnp.where(has, num / jnp.where(has, sw, 1.0), 0.0)
        found = min_r < init_dist
        mind = jnp.minimum(min_r, init_dist)
        srcs = jnp.where(found[:, :, None, :], srcs, 0.0)
        return cfn_x, cfn_y, cfn_z, sw, dist, mind, srcs

    def stackcat(cfn_x, cfn_y, cfn_z, sw, dist, mind, srcs):
        stacked = jnp.concatenate(
            [jnp.stack([cfn_x, cfn_y, cfn_z, sw, dist, mind], axis=2),
             srcs], axis=2)
        return stacked.reshape(NC, M, 12 * S)

    timeit(jax.jit(norms), out, name="A: norms")
    timeit(jax.jit(lambda o: stackcat(*norms(o))), out,
           name="B: norms+stack")
    timeit(jax.jit(lambda o: jax.lax.optimization_barrier(
        stackcat(*norms(o)))), out, name="C: norms+stack+barrier")

    def with_unpack(o):
        st = stackcat(*norms(o))
        return cellmod.unpack(grid, cfg, st, n, 0.0)
    timeit(jax.jit(with_unpack), out, name="D: norms+stack+unpack(barrier)")

    def unp_only(st):
        return cellmod.unpack(grid, cfg, st, n, 0.0)
    st = jax.jit(lambda o: stackcat(*norms(o)))(out)
    jax.block_until_ready(st)
    timeit(jax.jit(unp_only), st, name="E: unpack alone (materialized)")

    # variant: barrier on each part before stacking
    def with_unpack_b(o):
        parts = jax.lax.optimization_barrier(norms(o))
        st = stackcat(*parts)
        return cellmod.unpack(grid, cfg, st, n, 0.0)
    timeit(jax.jit(with_unpack_b), out, name="F: barrier-after-norms too")


if __name__ == "__main__":
    main()
