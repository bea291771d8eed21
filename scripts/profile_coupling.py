"""Per-phase timing of the coupling (sinking-box) step.

Phases are timed as separate jits (block_until_ready each); the fused
step hides overlap, so the sum exceeds the fused time — relative
attribution only.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops import pallas_fluid as pfops
from rigid_body_2d_3d_pysph_tpu.ops import pallas_contact as pcops
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel
from rigid_body_2d_3d_pysph_tpu.models import rigid_body as rb


def timeit(fn, *args, n=20, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    el = (time.perf_counter() - t0) / n * 1000
    print(f"{name:44s} {el:8.2f} ms")
    return out, el


def main():
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "cases"))
    from rigid_body_rotating_and_sinking_in_tank_2d import SinkingBox

    app = SinkingBox(fname="profcoup")
    app.initialize()
    app.scheme = app.create_scheme()
    app.scheme.configure(dim=2)
    scheme = app.scheme.scheme
    scene = app.create_particles()
    print(f"n={scene.n}  engine={scheme.engine}")

    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    ccfg = scheme.cell_config(scene, kernel)
    print(f"NC_max={ccfg.NC_max} M={ccfg.M} layout={getattr(ccfg, 'layout', '?')}")
    dt = jnp.asarray(5.9e-5)

    step = scheme.make_step(scene)
    scene2 = step(scene, dt)
    jax.block_until_ready(scene2.fields["x"])
    _, full = timeit(lambda s: step(s, dt), scene2, name="FULL fused step")

    multi = rb.make_multi_step(step, 20)
    s3 = multi(scene2, dt)
    jax.block_until_ready(s3.fields["x"])
    t0 = time.perf_counter()
    s3 = multi(s3, dt)
    jax.block_until_ready(s3.fields["x"])
    print(f"{'scanned step (chunk=20)':44s} {(time.perf_counter()-t0)/20*1000:8.2f} ms")

    # --- phases ---
    build = jax.jit(lambda s: cellmod.build_cell_grid(
        s.x, s.y, s.z, s.active, ccfg))
    grid, _ = timeit(build, scene2, name="build_cell_grid")

    packf = jax.jit(lambda s, g: pfops.pack_fluid_pallas(s, g, ccfg))
    (df, dfT), _ = timeit(packf, scene2, grid, name="pack_fluid_pallas (x3 per step)")

    rates = jax.jit(lambda s, g, df, dfT: pfops.fluid_rates_pallas(
        s, g, ccfg, kernel, df, dfT, scheme.edac_nu, scheme.c0,
        scheme.edac, True))
    timeit(rates, scene2, grid, df, dfT, name="fluid_rates_pallas")

    wall = jax.jit(lambda s, g, df, dfT: pfops.wall_bc_pallas(
        s, g, ccfg, kernel, df, dfT, scheme.gx, scheme.gy, scheme.gz))
    timeit(wall, scene2, grid, df, dfT, name="wall_bc_pallas")

    forces = jax.jit(lambda s, g, df, dfT: pfops.fluid_forces_pallas(
        s, g, ccfg, kernel, df, dfT, scheme.fluid_alpha, scheme.c0, True))
    timeit(forces, scene2, grid, df, dfT, name="fluid_forces_pallas")

    pipeline = scheme._cell_pipeline()
    cont = jax.jit(lambda s, g: pipeline(s, g, ccfg, kernel))
    timeit(cont, scene2, grid, name="contact pipeline (pallas)")


if __name__ == "__main__":
    main()
