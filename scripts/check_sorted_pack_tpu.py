"""On-TPU check + timing of the sorted-pack Pallas fast path.

Compares contact_pipeline_sorted_pallas against the gather-packed
Pallas pipeline (compiled, f32) on the bench scene, then times both
full pipelines.  BENCH_N sets the scene size.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

from bench import build_scene
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops import pallas_contact as pcops
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel


def timeit(fn, *args, n=20, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    el = (time.perf_counter() - t0) / n * 1000
    print(f"{name:46s} {el:8.2f} ms", flush=True)
    return out


def main():
    scheme, scene = build_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    cfg = scheme.cell_config(scene, kernel)
    print(f"n={scene.n}  NC_max={cfg.NC_max}  M={cfg.M}  "
          f"spill={cfg.spill}")

    old = jax.jit(lambda s: pcops.contact_pipeline_cell_pallas(
        s, cellmod.build_cell_grid(s.x, s.y, s.z, s.active, cfg),
        cfg, kernel))
    new = jax.jit(lambda s: pcops.contact_pipeline_sorted_pallas(
        s, cfg, kernel))

    o = old(scene)
    nw = new(scene)
    names = ["cfn_x", "cfn_y", "cfn_z", "cfn_w"]
    for i, nm in enumerate(names):
        a, b = np.asarray(o[i]), np.asarray(nw[i])
        d = np.abs(a - b).max()
        print(f"{nm:8s} max|diff| = {d:.3e}  (bitsame={np.array_equal(a, b)})")
    for k in o[4]:
        a, b = np.asarray(o[4][k]), np.asarray(nw[4][k])
        d = np.abs(a - b).max()
        print(f"{k:30s} max|diff| = {d:.3e}  "
              f"(bitsame={np.array_equal(a, b)})")

    timeit(old, scene, name="OLD pipeline (build+gather pack+kernel)")
    timeit(new, scene, name="NEW pipeline (sorted pack fast path)")


if __name__ == "__main__" and not os.environ.get("PHASES"):
    main()


def phases():
    import jax.numpy as jnp
    from rigid_body_2d_3d_pysph_tpu.ops import pallas_pack as ppack

    scheme, scene = build_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    cfg = scheme.cell_config(scene, kernel)
    S = scene.meta.total_no_bodies
    payload = [p.astype(jnp.float32)
               for p in pcops.contact_payload(scene, cfg.dim == 2)]
    buildp = jax.jit(lambda s: cellmod.build_cell_grid_packed(
        s.x, s.y, s.z, s.active, cfg, payload))
    grid, pt = timeit(buildp, scene, name="build_cell_grid_packed")
    expand = jax.jit(lambda pt, no: ppack.expand_dft_pallas(
        pt, no, cfg, pcops.sent_fields(cfg.dim == 2)))
    dfT = timeit(expand, pt, grid.n_occupied, name="expand_dft_pallas")
    init_dist = 4.0 * scene.meta.spacing0
    sent_slot = jnp.minimum(grid.n_occupied, cfg.NC_max)
    kern = jax.jit(lambda dfT, no, tbl, ss: pcops.contact_sums_pallas(
        dfT, no, tbl, cfg, kernel, S, init_dist, sent_slot=ss))
    out = timeit(kern, dfT, grid.n_occupied, grid.nbr_slots, sent_slot,
                 name="contact_sums_pallas (sorted dfT)")
    unp = jax.jit(lambda o: cellmod.unpack(grid, cfg, o, scene.n, 0.0))
    timeit(unp, out, name="unpack")


if __name__ == "__main__" and os.environ.get("PHASES"):
    phases()
