"""Profile the step's post-kernel tail at BENCH_N: unpack ->
contact_force -> sum_up -> integrator, as composed in the production
step, plus layout/fusion variants of the [N,S] slot math.

The Pallas kernel is ~64 ms of the ~104 ms step at 1M; the tail is the
next ~22 ms.  This script attributes it.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

from bench import build_scene
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops import contact as cops
from rigid_body_2d_3d_pysph_tpu.ops import pallas_contact as pcops
from rigid_body_2d_3d_pysph_tpu.ops import pallas_pack
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
    print(f"{name:52s} {el:8.2f} ms", flush=True)
    return out, el


def main():
    scheme, scene = build_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    cfg = scheme.cell_config(scene, kernel)
    S = scene.meta.total_no_bodies
    init_dist = 4.0 * scene.meta.spacing0
    dt = jnp.asarray(1e-4, scene.x.dtype)
    params = dict(kr=scheme.kr, kf=scheme.kf, fric_coeff=scheme.fric_coeff,
                  gx=scheme.gx, gy=scheme.gy, gz=scheme.gz)
    print(f"n={scene.n} NC_max={cfg.NC_max} M={cfg.M} S={S}")

    # produce the kernel output once (inputs to the tail)
    @jax.jit
    def run_kernel(s):
        payload = pcops.contact_payload(s, cfg.dim == 2)
        grid, pt = cellmod.build_cell_grid_packed(
            s.x, s.y, s.z, s.active, cfg, payload)
        dfT = pallas_pack.expand_dft_pallas(pt, grid.n_occupied, cfg,
                                            pcops.sent_fields(cfg.dim == 2))
        sent_slot = jnp.minimum(grid.n_occupied, cfg.NC_max)
        out = pcops.contact_sums_pallas(dfT, grid.n_occupied, grid.nbr_slots,
                                        cfg, kernel, S, init_dist,
                                        sent_slot=sent_slot)
        return out, grid

    (out, grid), _ = timeit(run_kernel, scene, name="build+pack+kernel")

    # ---- tail as composed in the production step ----------------------
    def tail(s, out, grid):
        cfn_x, cfn_y, cfn_z, cfn_w, dinfo = pcops._unpack_contact_out(
            out, grid, cfg, s, S)
        s = rb._contact_force_tail(s, cfn_x, cfn_y, cfn_z, cfn_w, dinfo,
                                   params, dt)
        s = rb._body_drift(s, dt, True)
        s = rb._particles_from_body_position(s)
        s = rb._body_half_kick(s, dt, True)
        s = rb._particles_from_body_velocity(s)
        return s

    timeit(jax.jit(tail), scene, out, grid, name="TAIL (unpack..integrate)")

    # pieces
    unp = jax.jit(lambda s, o, g: pcops._unpack_contact_out(o, g, cfg, s, S))
    (cfn_x, cfn_y, cfn_z, cfn_w, dinfo), _ = timeit(
        unp, scene, out, grid, name="  unpack")

    cf = jax.jit(lambda s, a, b, c, di: cops.contact_force(
        s, dt, params["kr"], params["kf"], params["fric_coeff"],
        a, b, c, di, s.delta_lt_x, s.delta_lt_y, s.delta_lt_z,
        s.fn_x, s.fn_y, s.fn_z))
    timeit(cf, scene, cfn_x, cfn_y, cfn_z, dinfo, name="  contact_force")

    sumup = jax.jit(lambda s, fx, fy, fz: rops.sum_up_external_forces(
        s, fx, fy, fz))
    fx0 = scene.fx
    timeit(sumup, scene, fx0, fx0, fx0, name="  sum_up_external_forces")

    integ = jax.jit(lambda s: rb._particles_from_body_velocity(
        rb._body_half_kick(s, dt, True), ))
    timeit(integ, scene, name="  half_kick+particles_vel")

    integ2 = jax.jit(lambda s: rb._particles_from_body_position(
        rb._body_drift(s, dt, True)))
    timeit(integ2, scene, name="  drift+particles_pos")

    # one-hot gather probe
    bid = jnp.where(scene.is_rigid, scene.body_id, 0)
    g1 = jax.jit(lambda r, b: rops.gather_body_rows(r, b, scene.meta.nb))
    timeit(g1, scene.omega, bid, name="  gather_body_rows [N,3]")

    rot = jax.jit(lambda R, b, x, y, z: rops.rotate_body_frame_vectors(
        R, b, x, y, z))
    timeit(rot, scene.R, bid, scene.dx0, scene.dy0, scene.dz0,
           name="  rotate_body_frame_vectors")


if __name__ == "__main__":
    main()
