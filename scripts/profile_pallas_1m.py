"""Attribute the Pallas contact pipeline's time at BENCH_N particles.

Phases (each own jit + block_until_ready; sums exceed the fused time):
pack_for_contact, dfT build (transpose+128-lane pad), the kernel itself,
and the epilogue (sums -> normals/dist/pick + unpack).
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
    print(f"n={scene.n}  NC_max={cfg.NC_max}  M={cfg.M}  S={S}")

    build = jax.jit(lambda s: cellmod.build_cell_grid(
        s.x, s.y, s.z, s.active, cfg))
    grid, _ = timeit(build, scene, name="build_cell_grid")
    print(f"n_occupied={int(grid.n_occupied)}")

    packf = jax.jit(lambda s, g: pcops.pack_for_contact(s, g, cfg))
    df, _ = timeit(packf, scene, grid, name="pack_for_contact")

    NC, M, F = df.shape

    def dft_build(df):
        sent = jnp.broadcast_to(
            jnp.asarray(pcops.sent_fields(cfg.dim == 2), df.dtype), (M, F))[None]
        dfT = jnp.swapaxes(jnp.concatenate([df, sent], axis=0), 1, 2)
        if M < 128:
            pad = jnp.broadcast_to(
                jnp.asarray(pcops.sent_fields(cfg.dim == 2), df.dtype)[None, :, None],
                (NC + 1, F, 128 - M))
            dfT = jnp.concatenate([dfT, pad], axis=2)
        return dfT

    dftj = jax.jit(dft_build)
    dfT, _ = timeit(dftj, df, name="dfT build (transpose + lane pad)")

    init_dist = 4.0 * scene.meta.spacing0
    kern = jax.jit(lambda dfT, n_occ, nbr: pcops.contact_sums_pallas(
        dfT, n_occ, nbr, cfg, kernel, S, init_dist))
    out, _ = timeit(kern, dfT, grid.n_occupied, grid.nbr_slots,
                    name="contact_sums_pallas (kernel, incl. epilogue)")

    epij = jax.jit(lambda o: cellmod.unpack(grid, cfg, o, scene.n, 0.0))
    timeit(epij, out, name="unpack [N,12S]")

    full = jax.jit(lambda s, g: pcops.contact_pipeline_cell_pallas(
        s, g, cfg, kernel))
    timeit(full, scene, grid, name="FULL pallas pipeline")


if __name__ == "__main__":
    main()
