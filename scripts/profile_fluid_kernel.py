"""Isolate where the coupling fluid passes' time goes: bare scaffold
(trivial compute) vs full compute vs unpack, at the sinking-box scale.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "cases"))

import jax
import jax.numpy as jnp
import numpy as np

from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops import pallas_fluid as pfops
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel


def timeit(fn, *args, n=30, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    el = (time.perf_counter() - t0) / n * 1000
    print(f"{name:44s} {el:8.3f} ms")
    return out, el


def main():
    from rigid_body_rotating_and_sinking_in_tank_2d import SinkingBox

    app = SinkingBox(fname="proffk")
    app.initialize()
    app.scheme = app.create_scheme()
    app.scheme.configure(dim=2)
    scheme = app.scheme.scheme
    scene = app.create_particles()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    ccfg = scheme.cell_config(scene, kernel)

    grid = jax.jit(lambda s: cellmod.build_cell_grid(
        s.x, s.y, s.z, s.active, ccfg))(scene)
    jax.block_until_ready(grid.slot2p)
    print(f"n={scene.n} NC_max={ccfg.NC_max} M={ccfg.M} "
          f"O={grid.nbr_slots.shape[1]} n_occ={int(grid.n_occupied)}")

    packf = jax.jit(lambda s, g: pfops.pack_fluid_pallas(s, g, ccfg))
    (df, dfT) = packf(scene, grid)
    jax.block_until_ready(df)

    # trivial compute: one add-reduce over the pair matrix
    def triv(q, sL):
        v = q[:, 0:1] - sL[0:1, :]
        return jnp.sum(v, axis=1, keepdims=True)

    bare = jax.jit(lambda df, dfT: pfops.cell_pair_pallas(
        df, dfT, grid.n_occupied, grid.nbr_slots, ccfg, triv, 1))
    timeit(bare, df, dfT, name="scaffold only (trivial compute)")

    # geometry only (sqrt + kernel eval, no physics)
    def geom(q, sL):
        qc, sr, xij, yij, zij, rij, r2, hij = pfops._pair_geom(q, sL, kernel)
        w = kernel.gradw_scalar(rij, hij)
        return jnp.sum(w, axis=1, keepdims=True)

    gk = jax.jit(lambda df, dfT: pfops.cell_pair_pallas(
        df, dfT, grid.n_occupied, grid.nbr_slots, ccfg, geom, 1))
    timeit(gk, df, dfT, name="scaffold + geometry + gradw")

    # full rates kernel WITHOUT unpack
    from rigid_body_2d_3d_pysph_tpu.ops.pallas_fluid import (
        fluid_rates_pallas, wall_bc_pallas, fluid_forces_pallas)

    rates_full = jax.jit(lambda s, g, df, dfT: fluid_rates_pallas(
        s, g, ccfg, kernel, df, dfT, scheme.edac_nu, scheme.c0,
        scheme.edac, True))
    timeit(rates_full, scene, grid, df, dfT, name="rates (kernel + unpack)")

    from rigid_body_2d_3d_pysph_tpu.ops.cellpairs import unpack
    NC, M, _ = df.shape
    out16 = jnp.ones((NC, M, 2), jnp.float32)
    unp = jax.jit(lambda o: unpack(grid, ccfg, o, scene.n, 0.0))
    timeit(unp, out16, name="unpack [NC,M,2] -> [N,2]")

    timeit(packf, scene, grid, name="pack_fluid_pallas")


if __name__ == "__main__":
    main()
