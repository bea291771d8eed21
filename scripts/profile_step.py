"""Per-phase timing of the cell-engine contact step at BENCH_N particles.

Times each phase of the fused step separately (own jit, block_until_ready)
to find where the ms/step go.  Phases overlap less when fused, so the sum
exceeds the fused step time — use for *relative* attribution only.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from bench import build_scene
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops import contact_cell as ccops
from rigid_body_2d_3d_pysph_tpu.ops import contact as cops
from rigid_body_2d_3d_pysph_tpu.ops import rigid as rops
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
    print(f"{name:42s} {el:8.2f} ms")
    return out, el


def main():
    scheme, scene = build_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    cfg = scheme.cell_config(scene, kernel)
    print(f"n={scene.n}  NC_max={cfg.NC_max}  M={cfg.M}  "
          f"chunk={cfg.cell_chunk}  S={scene.meta.total_no_bodies}")
    dt = jnp.asarray(1e-4)
    params = dict(kr=scheme.kr, kf=scheme.kf, fric_coeff=scheme.fric_coeff,
                  gx=scheme.gx, gy=scheme.gy, gz=scheme.gz)

    step = scheme.make_step(scene)
    _, full = timeit(step, scene, dt, name="FULL fused step")

    build = jax.jit(lambda s: cellmod.build_cell_grid(
        s.x, s.y, s.z, s.active, cfg))
    grid, _ = timeit(build, scene, name="build_cell_grid")

    pack = jax.jit(lambda s, g: ccops.pack_scene(s, g, cfg))
    (df, di), _ = timeit(pack, scene, grid, name="pack_scene")

    S = scene.meta.total_no_bodies
    normals = jax.jit(lambda s, g, df, di: ccops.contact_normals_cell(
        s, g, cfg, kernel, S, df, di))
    (cfx, cfy, cfz, sw), _ = timeit(normals, scene, grid, df, di,
                                    name="contact_normals_cell (pass 1)")

    distf = jax.jit(lambda s, g, df, di, a, b, c: ccops.contact_distance_cell(
        s, g, cfg, kernel, S, df, di, a, b, c, scene.meta.spacing0))
    dinfo_d, _ = timeit(distf, scene, grid, df, di, cfx, cfy, cfz,
                        name="contact_distance_cell (pass 2)")

    fused = jax.jit(lambda s, g, df, di: ccops.contact_sums_fused(
        s, g, cfg, kernel, S, df, di, scene.meta.spacing0))
    timeit(fused, scene, grid, df, di, name="contact_sums_fused (both passes)")

    fusedu = jax.jit(lambda s, g: ccops.contact_pipeline_cell_fused(
        s, g, cfg, kernel))
    timeit(fusedu, scene, grid, name="fused pipeline incl. pack+unpack")

    if os.environ.get("PROFILE_PALLAS", "1") == "1":
        from rigid_body_2d_3d_pysph_tpu.ops import pallas_contact as pcops
        pp = jax.jit(lambda s, g: pcops.contact_pipeline_cell_pallas(
            s, g, cfg, kernel))
        timeit(pp, scene, grid, name="PALLAS pipeline incl. pack+unpack")

    def unpack_all(g, cfx, cfy, cfz, sw, dinfo_d):
        up = lambda d, fill=0.0: cellmod.unpack(g, cfg, d, scene.n, fill)
        dinfo = {k: up(v) for k, v in dinfo_d.items()}
        return up(cfx), up(cfy), up(cfz), up(sw), dinfo
    unpk = jax.jit(unpack_all)
    (cfn_x, cfn_y, cfn_z, cfn_w, dinfo), _ = timeit(
        unpk, grid, cfx, cfy, cfz, sw, dinfo_d, name="unpack (all outputs)")

    force = jax.jit(lambda s, a, b, c, di: cops.contact_force(
        s, dt, params["kr"], params["kf"], params["fric_coeff"],
        a, b, c, di, s.delta_lt_x, s.delta_lt_y, s.delta_lt_z,
        s.fn_x, s.fn_y, s.fn_z))
    _, _ = timeit(force, scene, cfn_x, cfn_y, cfn_z, dinfo,
                  name="contact_force ([N,S] slot map)")

    sumup = jax.jit(lambda s: rops.sum_up_external_forces(
        s, s.fx, s.fy, s.fz))
    timeit(sumup, scene, name="sum_up_external_forces")

    integ = jax.jit(lambda s: rb._particles_from_body_position(
        rb._body_drift(rb._body_half_kick(s, dt, True), dt, True)))
    timeit(integ, scene, name="integrator (kick+drift+particles)")


if __name__ == "__main__":
    main()
