"""On-TPU check + timing of the DEM Pallas kernel at BENCH_N grains.

1. compiled equivalence vs the XLA cell engine (force/table agreement
   on the first step from a settledish random state),
2. step timing: single step, scan(25), scan(50) (the round-2 device
   fault hit scan chunks > 25 on the old program).

CELL_FACTOR env sweeps the DEM grid coarseness.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from bench import build_dem_scene
from rigid_body_2d_3d_pysph_tpu.models.rigid_body import make_multi_step


def timeit(fn, *args, n=10, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    el = (time.perf_counter() - t0) / n * 1000
    print(f"{name:40s} {el:8.2f} ms", flush=True)
    return out, el


def main():
    os.environ["BENCH_ENGINE"] = "pallas"
    scheme, scene = build_dem_scene()
    if os.environ.get("CELL_FACTOR"):
        scheme.cell_factor = float(os.environ["CELL_FACTOR"])
    cfg = scheme.pallas_cell_config(scene)
    print(f"n={scene.n}  NC_max={cfg.NC_max}  M={cfg.M}  "
          f"cell={cfg.cell:.4g}  cutoff={cfg.cutoff:.4g}", flush=True)
    dt = jnp.asarray(5e-6)

    step_p = scheme.make_step(scene)

    if os.environ.get("CHECK", "1") == "1":
        import copy
        scheme_c = copy.copy(scheme)
        scheme_c.engine = "cell"
        scheme_c._cell_cfg = None
        step_c = scheme_c.make_step(scene)
        s_p, s_c = scene, scene
        for i in range(5):
            s_p = step_p(s_p, dt)
            s_c = step_c(s_c, dt)
        for k in ("x", "y", "u", "v", "wz", "fx", "fy", "torz"):
            a, b = np.asarray(s_c[k]), np.asarray(s_p[k])
            err = np.max(np.abs(a - b)) / max(1e-30, np.max(np.abs(a)))
            print(f"  5-step rel err {k:5s}: {err:.3g}", flush=True)
        assert not bool(np.asarray(s_p.nbr_overflow)), "overflow (pallas)"

    timeit(step_p, scene, dt, name="pallas FULL step")
    for chunk in (25, 50):
        multi = make_multi_step(step_p, chunk)
        out, el = timeit(multi, scene, dt, n=3,
                         name=f"scan({chunk}) [per-chunk]")
        print(f"{'  -> per step':40s} {el / chunk:8.2f} ms", flush=True)
        assert np.isfinite(np.asarray(out.fields["x"])).all()
    print("OK", flush=True)


if __name__ == "__main__":
    main()
