"""Sweep the DEM Pallas grid (cell_factor x M) at BENCH_N grains.

The round-3 kernel changed the layout economics (spill grid, batched
programs, packed stencil runs) since the original cell_factor sweep in
models/dem.py; re-measure the full fused step per configuration.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def timestep(scheme, scene, factor, M):
    from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
    scheme.cell_factor = float(factor)
    scheme._pallas_cfg = cellmod.config_from_positions(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        2.0 * float(np.asarray(scene.rad_s).max()), scheme.dim,
        cell_factor=float(factor), M=M, spill=True)
    cfg = scheme._pallas_cfg
    step = scheme.make_step(scene)
    dt = jnp.asarray(5e-6)
    try:
        out = step(scene, dt)
        jax.block_until_ready(out.x)
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            out = step(scene, dt)
        jax.block_until_ready(out.x)
        el = (time.perf_counter() - t0) / n * 1000
        ovf = bool(out.nbr_overflow) if "nbr_overflow" in out else False
    except Exception as e:
        print(f"factor={factor:4.1f} M={M:3d} NC={cfg.NC_max} O={cfg.O} "
              f"FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
        return
    print(f"factor={factor:4.1f} M={M:3d} NC={cfg.NC_max:6d} O={cfg.O:3d} "
          f"OM={cfg.O*M:5d}  {el:7.2f} ms/step  ovf={ovf}", flush=True)


def main():
    os.environ["BENCH_ENGINE"] = "pallas"
    three_d = os.environ.get("SWEEP_3D")
    if three_d:
        from bench import build_dem_scene_3d
        scheme, scene = build_dem_scene_3d()
        # 3D: the 27-entry stencil makes the packed slot table wide;
        # smaller factors keep OM (candidate lanes/query) bounded.
        # Round 1 of the sweep: (2.0, 8) best at 89.8 ms @179k
        # ((1.5,8) 196, (2.5,8) 152, (3,8) 160, (2,16) 135, (2.5,16)
        # 105, (3,16) 92, (4,16) 141); round 2 refines around it.
        grid = [(1.8, 8), (2.0, 8), (2.2, 8), (2.4, 8)]
    else:
        from bench import build_dem_scene
        scheme, scene = build_dem_scene()
        grid = [(3.5, 16), (4.0, 16), (4.5, 16),
                (4.0, 24), (5.0, 24), (6.0, 24)]
    print(f"n={scene.n}", flush=True)
    for factor, M in grid:
        timestep(scheme, scene, factor, M)


if __name__ == "__main__":
    main()
