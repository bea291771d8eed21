"""Per-phase timing of the ROW-WINDOW DEM path at BENCH_N grains.

Phases as separate jits (sums exceed the fused step): grid build /
two pack expansions / window kernel / unpack.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_dem_scene
from rigid_body_2d_3d_pysph_tpu.ops import pallas_dem as pdops
from rigid_body_2d_3d_pysph_tpu.ops import pallas_pack
from rigid_body_2d_3d_pysph_tpu.ops import rowwin as rw


def timeit(fn, *args, n=20, name=""):
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
    cfg = scheme.rowwin_config(scene)
    L = scene.tng_idx.shape[1]
    print(f"n={scene.n}  NCW={cfg.NC_max}  M={cfg.M}  R={cfg.R}  "
          f"max_run={cfg.max_run}  G={cfg.n_cells_total}", flush=True)
    dt = jnp.asarray(5e-6)

    step = scheme.make_step(scene)
    timeit(step, scene, dt, name="FULL rowwin step")

    fdt = scene.x.dtype
    ident = jnp.arange(scene.n, dtype=jnp.int32)
    src_fields = [scene.x, scene.y, scene.z, scene.u, scene.v, scene.w,
                  scene.wx, scene.wy, scene.wz, scene.rad_s, scene.m,
                  scene.dem_id.astype(fdt), ident.astype(fdt)]
    tab_cols = ([scene.tng_idx[:, l].astype(fdt) for l in range(L)]
                + [scene.tng_idx_dem_id[:, l].astype(fdt)
                   for l in range(L)]
                + [scene.tng_x[:, l] for l in range(L)]
                + [scene.tng_y[:, l] for l in range(L)]
                + [scene.tng_z[:, l] for l in range(L)])

    build = jax.jit(lambda s: rw.build_row_window_grid(
        s.x, s.y, s.z, s.active, cfg, src_fields + tab_cols))
    (grid, pt), _ = timeit(build, scene, name="build_row_window_grid")
    print(f"n_occupied = {int(grid.n_occupied)}", flush=True)

    zero = jnp.zeros((scene.n,), jnp.float32)
    pt_src = pt._replace(sorted_fields=pt.sorted_fields[:13]
                         + (zero, zero, zero))
    sent_src = pdops._SENT + [0.0, 0.0, 0.0]
    exp_s = jax.jit(lambda p, no: pallas_pack.expand_dft_pallas(
        p, no, cfg, sent_src, extra_rows=cfg.max_run))
    dfs, _ = timeit(exp_s, pt_src, grid.n_occupied, name="expand src (16)")

    pt_tab = pt._replace(sorted_fields=pt.sorted_fields[13:])
    sent_tab = [-1.0] * (2 * L) + [0.0] * (3 * L)
    exp_t = jax.jit(lambda p, no: pallas_pack.expand_dft_pallas(
        p, no, cfg, sent_tab))
    dft, _ = timeit(exp_t, pt_tab, grid.n_occupied, name="expand tab (5L)")

    full = jax.jit(lambda s: pdops.lvc_displacement_rowwin_pallas(
        s, cfg, dt, s.tng_idx, s.tng_idx_dem_id,
        s.tng_x, s.tng_y, s.tng_z))
    out, _ = timeit(full, scene, name="rowwin pipeline (build+kernel+unpack)")

    unp = jax.jit(lambda d, g: pdops._unpack_dem_out(
        d, g, cfg, scene.n, L, fdt))
    W = 8 + 5 * L
    Wp = -(-W // 128) * 128
    dense = jnp.zeros((cfg.NC_max, cfg.M, Wp), jnp.float32)
    timeit(unp, dense, grid, name="unpack")


if __name__ == "__main__":
    main()
