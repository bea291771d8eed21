"""Per-phase timing of the DEM cell-engine step at BENCH_N grains.

Attributes the step cost (ROADMAP round-2 item: 104k grains showed
kernel 317 ms / full step 809 ms / scanned 1830 ms with ~490 ms
unattributed).  Own jit per phase, block_until_ready; relative numbers.
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
from rigid_body_2d_3d_pysph_tpu.ops import dem as dops
from rigid_body_2d_3d_pysph_tpu.ops import dem_cell as dcops
from rigid_body_2d_3d_pysph_tpu.models.rigid_body import make_multi_step


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
    scheme, scene = build_dem_scene()
    cfg = scheme.cell_config(scene)
    print(f"n={scene.n}  NC_max={cfg.NC_max}  M={cfg.M}  "
          f"chunk={cfg.cell_chunk}  cell={cfg.cell:.4g}  "
          f"cutoff={cfg.cutoff:.4g}  L={scene.tng_idx.shape[1]}",
          flush=True)
    dt = jnp.asarray(5e-6)

    step = scheme.make_step(scene)
    _, full = timeit(step, scene, dt, name="FULL step")

    for chunk in (5, 25):
        multi = make_multi_step(step, chunk)
        _, el = timeit(multi, scene, dt, n=3,
                       name=f"scan({chunk}) [per-chunk]")
        print(f"{'  -> per step':46s} {el / chunk:8.2f} ms", flush=True)

    build = jax.jit(lambda s: cellmod.build_cell_grid(
        s.x, s.y, s.z, s.active, cfg))
    grid, _ = timeit(build, scene, name="build_cell_grid")

    def pack_all(s, g):
        df = cellmod.pack_fields(
            g, cfg,
            [s.x, s.y, s.z, s.u, s.v, s.w, s.wx, s.wy, s.wz, s.rad_s, s.m],
            dcops._F_SENT)
        di = cellmod.pack_fields(
            g, cfg, [s.dem_id, jnp.arange(s.n, dtype=jnp.int32)],
            dcops._I_SENT)
        t = [cellmod.pack_rows(g, cfg, s.tng_idx, -1),
             cellmod.pack_rows(g, cfg, s.tng_idx_dem_id, -1),
             cellmod.pack_rows(g, cfg, s.tng_x, 0.0),
             cellmod.pack_rows(g, cfg, s.tng_y, 0.0),
             cellmod.pack_rows(g, cfg, s.tng_z, 0.0)]
        return df, di, t
    timeit(jax.jit(pack_all), scene, grid, name="pack (fields + tables)")

    prune = jax.jit(lambda s: dops.prune_contact_table(
        s, s.tng_idx, s.tng_idx_dem_id, s.tng_x, s.tng_y, s.tng_z))
    timeit(prune, scene, name="prune_contact_table ([N,L] gathers)")

    disp = jax.jit(lambda s, g, ti, td, ta, tb, tc:
                   dcops.lvc_displacement_cell(s, g, cfg, dt,
                                               ti, td, ta, tb, tc))
    timeit(disp, scene, grid, scene.tng_idx, scene.tng_idx_dem_id,
           scene.tng_x, scene.tng_y, scene.tng_z,
           name="lvc_displacement_cell (pack+kernel+unpack)")


if __name__ == "__main__":
    main()
