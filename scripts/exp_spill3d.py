"""Measure the spillover grid + sorted-pack Pallas path on the 3D
(27-stencil) bench scene vs the committed classic-grid 3D pipeline.

The classic 3D grid sizes M from worst-cell occupancy (wide lanes,
~60% utilization); the spillover grid keeps M=16 and spends slots.
Checks:
  - perf: full pipeline ms on both layouts
  - exactness: sorted-Pallas vs XLA fused cell engine on the SAME
    spill grid (bit-compare of the unpacked contact outputs)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_scene_3d
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cm
from rigid_body_2d_3d_pysph_tpu.ops import contact_cell as ccops
from rigid_body_2d_3d_pysph_tpu.ops import pallas_contact as pc
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel


def timeit(fn, *args, n=10, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    el = (time.perf_counter() - t0) / n * 1000
    print(f"{name:48s} {el:8.2f} ms", flush=True)
    return out, el


def main():
    scheme, scene = build_scene_3d()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    cfg0 = scheme.cell_config(scene, kernel)
    print(f"n={scene.n} classic: NC_max={cfg0.NC_max} M={cfg0.M} "
          f"O={cfg0.O}", flush=True)
    cutoff = float(kernel.radius_scale * np.asarray(scene.h).max())
    cfg1 = cm.config_from_positions(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        cutoff, 3, spill=True)
    print(f"spill:  NC_max={cfg1.NC_max} M={cfg1.M} O={cfg1.O} "
          f"(lanes/cell {cfg1.O * cfg1.M} vs classic "
          f"{len(cfg0.stencil) * cfg0.M})", flush=True)
    S = scene.meta.total_no_bodies
    init_dist = 4.0 * scene.meta.spacing0

    # committed pipeline (classic grid + Pallas kernel)
    def classic(s):
        grid = cm.build_cell_grid(s.x, s.y, s.z, s.active, cfg0)
        return pc.contact_pipeline_cell_pallas(s, grid, cfg0, kernel)

    timeit(jax.jit(classic), scene, name="classic grid + Pallas (committed)")

    # spill grid + sorted-pack Pallas
    sortedj = jax.jit(lambda s: pc.contact_pipeline_sorted_pallas(
        s, cfg1, kernel))
    out_s, _ = timeit(sortedj, scene, name="spill grid + sorted-pack Pallas")

    # exactness: XLA fused engine on the SAME spill grid
    def xla_spill(s):
        grid = cm.build_cell_grid(s.x, s.y, s.z, s.active, cfg1)
        return ccops.contact_pipeline_cell_fused(s, grid, cfg1, kernel)

    out_x, _ = timeit(jax.jit(xla_spill), scene,
                      name="spill grid + XLA fused engine")

    names = ["cfn_x", "cfn_y", "cfn_z", "cfn_w"]
    ok = True
    for i, nm in enumerate(names):
        a, b = np.asarray(out_s[i]), np.asarray(out_x[i])
        same = np.array_equal(a, b)
        ok &= same
        if not same:
            print(f"  {nm}: MISMATCH max|d|={np.max(np.abs(a - b)):.3e}",
                  flush=True)
    for k in out_s[4]:
        a, b = np.asarray(out_s[4][k]), np.asarray(out_x[4][k])
        same = np.array_equal(a, b)
        ok &= same
        if not same:
            print(f"  {k}: MISMATCH max|d|={np.max(np.abs(a - b)):.3e}",
                  flush=True)
    print(f"bit-parity sorted-Pallas vs XLA (same spill grid): {ok}",
          flush=True)


if __name__ == "__main__":
    main()
