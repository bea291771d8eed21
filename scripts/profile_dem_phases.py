"""Per-phase timing of the PALLAS DEM step at BENCH_N grains.

Phases timed as separate jits (sums exceed the fused step):
grid build / field+table pack / dfT transpose / kernel / unpack.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from bench import build_dem_scene
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops import pallas_dem as pdops


def timeit(fn, *args, n=10, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    el = (time.perf_counter() - t0) / n * 1000
    print(f"{name:46s} {el:8.2f} ms", flush=True)
    return out, el


def main():
    os.environ["BENCH_ENGINE"] = "pallas"
    scheme, scene = build_dem_scene()
    cfg = scheme.pallas_cell_config(scene)
    L = scene.tng_idx.shape[1]
    print(f"n={scene.n}  NC_max={cfg.NC_max}  M={cfg.M}  "
          f"cell={cfg.cell:.4g}  cutoff={cfg.cutoff:.4g}  L={L}",
          flush=True)
    dt = jnp.asarray(5e-6)

    step = scheme.make_step(scene)
    _, full = timeit(step, scene, dt, name="FULL pallas step")

    build = jax.jit(lambda s: cellmod.build_cell_grid(
        s.x, s.y, s.z, s.active, cfg))
    grid, _ = timeit(build, scene, name="build_cell_grid")
    print(f"n_occupied = {int(grid.n_occupied)}", flush=True)

    fdt = scene.x.dtype
    ident = jnp.arange(scene.n, dtype=jnp.int32)

    def pack_all(s, g):
        df = cellmod.pack_fields(
            g, cfg,
            [s.x, s.y, s.z, s.u, s.v, s.w, s.wx, s.wy, s.wz, s.rad_s,
             s.m, s.dem_id.astype(fdt), ident.astype(fdt)],
            pdops._SENT).astype(jnp.float32)
        tabs = [cellmod.pack_rows(g, cfg, s.tng_idx.astype(fdt), -1.0),
                cellmod.pack_rows(g, cfg, s.tng_idx_dem_id.astype(fdt), -1.0),
                cellmod.pack_rows(g, cfg, s.tng_x, 0.0),
                cellmod.pack_rows(g, cfg, s.tng_y, 0.0),
                cellmod.pack_rows(g, cfg, s.tng_z, 0.0)]
        return df, jnp.concatenate(tabs, axis=2).astype(jnp.float32)

    (df, tab), _ = timeit(jax.jit(pack_all), scene, grid,
                          name="pack (13 fields + 5 [N,L] tables)")

    def pack_fields_only(s, g):
        return cellmod.pack_fields(
            g, cfg,
            [s.x, s.y, s.z, s.u, s.v, s.w, s.wx, s.wy, s.wz, s.rad_s,
             s.m, s.dem_id.astype(fdt), ident.astype(fdt)],
            pdops._SENT).astype(jnp.float32)
    timeit(jax.jit(pack_fields_only), scene, grid, name="  pack fields only")

    def trans(df):
        NC, M, F = df.shape
        sent = jnp.broadcast_to(jnp.asarray(pdops._SENT, df.dtype),
                                (M, F))[None]
        dfT = jnp.swapaxes(jnp.concatenate([df, sent], axis=0), 1, 2)
        lane = -(-M // 128) * 128
        if M < lane:
            pad = jnp.broadcast_to(
                jnp.asarray(pdops._SENT, df.dtype)[None, :, None],
                (NC + 1, F, lane - M))
            dfT = jnp.concatenate([dfT, pad], axis=2)
        return dfT
    dfT, _ = timeit(jax.jit(trans), df, name="dfT transpose+pad")

    E = int(scene.dem_kn.shape[0])
    params = jnp.zeros((8, 8), jnp.float32)
    mat = jnp.stack([scene.dem_kn, scene.dem_kt, scene.dem_alpha,
                     scene.dem_mu], axis=1).astype(jnp.float32)
    params = params.at[:E, :4].set(mat)
    params = params.at[0, 4].set(jnp.asarray(dt, jnp.float32))

    kern = jax.jit(lambda df, tab, dfT: pdops.dem_sums_pallas(
        df, tab, dfT, params, grid.n_occupied, grid.nbr_slots, cfg, L, E))
    dense, _ = timeit(kern, df, tab, dfT, name="pallas kernel")

    unp = jax.jit(lambda d: (
        cellmod.unpack(grid, cfg, d[..., :8], scene.n, 0.0),
        cellmod.unpack(grid, cfg, d[..., 8:8 + 2 * L], scene.n, -1.0),
        cellmod.unpack(grid, cfg, d[..., 8 + 2 * L:], scene.n, 0.0)))
    timeit(unp, dense, name="unpack (8 + 5L cols)")


if __name__ == "__main__":
    main()
