"""Bisect the compact tail's cost at BENCH_N."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
from bench import build_scene
from rigid_body_2d_3d_pysph_tpu.ops import pallas_contact as pc
from rigid_body_2d_3d_pysph_tpu.ops import contact as cops
from rigid_body_2d_3d_pysph_tpu.ops import rigid as rops
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
    return out, el


def main():
    scheme, scene = build_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    cfg = scheme.cell_config(scene, kernel)
    S = scene.meta.total_no_bodies
    ni = scheme.ni_max(cfg)
    n = scene.n
    dt = jnp.float32(1e-4)
    print(f"n={n} NC={cfg.NC_max} ni={ni} L={ni * cfg.M}", flush=True)

    pipe = jax.jit(lambda s: pc.contact_pipeline_compact_pallas(
        s, cfg, kernel, ni))
    out_c, pid, (u_c, v_c, w_c), grid, ovf = pipe(scene)
    jax.block_until_ready(out_c)
    L = ni * cfg.M
    fdt = scene.x.dtype

    pidf = pid.reshape(L)
    pclip = jnp.minimum(pidf, n - 1)
    valid = pidf < n
    tgt = jnp.where(valid, pidf, n)

    @jax.jit
    def spr_gather(s, pclip, valid):
        spr = jnp.concatenate(
            [s.delta_lt_x, s.delta_lt_y, s.delta_lt_z,
             s.fn_x, s.fn_y, s.fn_z], axis=1)
        return jnp.where(valid[:, None], spr.at[pclip].get(mode="clip"), 0.0)
    spr_c, _ = timeit(spr_gather, scene, pclip, valid, name="spring row gather [L,54]")

    allv = jnp.zeros((L, 25 * S), jnp.float32)

    @jax.jit
    def scat_rows(allv, tgt):
        return jnp.zeros((n + 1, allv.shape[1]), fdt).at[tgt].set(
            allv, mode="drop", unique_indices=True)[:n]
    scat, _ = timeit(scat_rows, allv, tgt, name="row scatter [L,225]->[N,225]")

    @jax.jit
    def split(scat):
        return [scat[:, i * S:(i + 1) * S] for i in range(25)]
    timeit(split, scat, name="split 25 x [N,S]")

    @jax.jit
    def sumup(s, fx, fy, fz):
        return rops.sum_up_external_forces(s, fx, fy, fz)
    fx = scene.m * 0.0
    timeit(sumup, scene, fx, fx, fx, name="sum_up_external_forces [N]")

    @jax.jit
    def core(u, v, w, m, bid, eta, cf, dinfo_stack, spr_c):
        dinfo = dict(contact_force_dist=dinfo_stack[0],
                     closest_point_dist_to_source=dinfo_stack[1],
                     x_source=dinfo_stack[2], y_source=dinfo_stack[3],
                     z_source=dinfo_stack[4], vx_source=dinfo_stack[5],
                     vy_source=dinfo_stack[6], vz_source=dinfo_stack[7])
        return cops.contact_force_core(
            u, v, w, m, bid, eta, scene.meta.nb, scene.meta.spacing0,
            dt, 1e5, 1e3, 0.5, cf[0], cf[1], cf[2], dinfo,
            spr_c[:, 0:S], spr_c[:, S:2 * S], spr_c[:, 2 * S:3 * S],
            spr_c[:, 3 * S:4 * S], spr_c[:, 4 * S:5 * S],
            spr_c[:, 5 * S:6 * S])
    zL = jnp.zeros((L,), jnp.float32)
    zLS = jnp.zeros((L, S), jnp.float32)
    cf = jnp.stack([zLS] * 3)
    dstack = jnp.stack([zLS] * 8)
    timeit(core, zL, zL, zL, zL, zL.astype(jnp.int32), scene.eta, cf,
           dstack, spr_c, name="contact_force_core [L,S]")


if __name__ == "__main__":
    main()
