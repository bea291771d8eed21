"""Compact-path bisection with device_get-anchored timing (on this
platform block_until_ready can report async-queued work as done for
some program shapes — every timing here folds outputs into a scalar
accumulator that the host fetches at the end)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
from bench import build_scene
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cm
from rigid_body_2d_3d_pysph_tpu.ops import pallas_contact as pc
from rigid_body_2d_3d_pysph_tpu.ops import pallas_pack as pk
from rigid_body_2d_3d_pysph_tpu.ops import contact as cops
from rigid_body_2d_3d_pysph_tpu.ops import rigid as rops
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel
from rigid_body_2d_3d_pysph_tpu.models import rigid_body as rb


def leafsum(x):
    if isinstance(x, (tuple, list)):
        return sum(leafsum(v) for v in x)
    if isinstance(x, dict):
        return sum(leafsum(v) for v in x.values())
    if hasattr(x, "fields"):
        return leafsum(list(x.fields.values()))
    if hasattr(x, "_asdict"):
        return leafsum(list(x._asdict().values()))
    if hasattr(x, "dtype"):
        if x.dtype == jnp.bool_:
            return jnp.sum(x.astype(jnp.float32)) * 1e-30
        return jnp.sum(x.astype(jnp.float32)) * 1e-30
    return 0.0


def timeit(fn, *args, n=10, name=""):
    acc0 = jnp.zeros((), jnp.float32)

    @jax.jit
    def wrapped(acc, *a):
        return acc + leafsum(fn(*a))

    acc = wrapped(acc0, *args)
    float(acc)
    t0 = time.perf_counter()
    for _ in range(n):
        acc = wrapped(acc, *args)
    float(acc)
    el = (time.perf_counter() - t0) / n * 1000
    print(f"{name:52s} {el:8.2f} ms", flush=True)


def main():
    scheme, scene = build_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    cfg = scheme.cell_config(scene, kernel)
    S = scene.meta.total_no_bodies
    two_d = cfg.dim == 2
    ni = scheme.ni_max(cfg)
    n = scene.n
    M = cfg.M
    L = ni * M
    fdt = scene.x.dtype
    dt = jnp.float32(1e-4)
    params = dict(kr=scheme.kr, kf=scheme.kf, fric_coeff=scheme.fric_coeff,
                  gx=scheme.gx, gy=scheme.gy, gz=scheme.gz)
    print(f"n={n} NC={cfg.NC_max} ni={ni} L={L}", flush=True)

    timeit(lambda s: scheme.make_step(scene)(s, dt), scene, n=5,
           name="FULL compact step")
    timeit(lambda s: rb.rigid_contact_force_eval_compact(
        s, cfg, kernel, params, dt, ni), scene, n=5,
        name="eval_compact")
    timeit(lambda s: pc.contact_pipeline_compact_pallas(
        s, cfg, kernel, ni), scene, n=5, name="pipeline_compact")

    # tail pieces on realistic inputs
    pipe = jax.jit(lambda s: pc.contact_pipeline_compact_pallas(
        s, cfg, kernel, ni))
    out_c, pid, uvw, grid, ovf = pipe(scene)
    jax.block_until_ready(pid)
    pidf = pid.reshape(L)
    valid = pidf < n
    pclip = jnp.minimum(pidf, n - 1)
    tgt = jnp.where(valid, pidf, n)

    timeit(lambda o: o[:, :, :12 * S].astype(fdt).reshape(L, 12, S),
           out_c, name="out_c slice+reshape")

    def spr_gather(s, pclip, valid):
        spr = jnp.concatenate(
            [s.delta_lt_x, s.delta_lt_y, s.delta_lt_z,
             s.fn_x, s.fn_y, s.fn_z], axis=1)
        return jnp.where(valid[:, None], spr.at[pclip].get(mode="clip"), 0.0)
    timeit(spr_gather, scene, pclip, valid, name="spring gather [L,54]")

    allv = jnp.zeros((L, 25 * S), jnp.float32)

    def scat_split(allv, tgt):
        scat = jnp.zeros((n + 1, allv.shape[1]), fdt).at[tgt].set(
            allv, mode="drop", unique_indices=True)[:n]
        return [scat[:, i * S:(i + 1) * S] for i in range(25)]
    timeit(scat_split, allv, tgt, name="scatter [L,225] + split 25")

    zL = jnp.zeros((L,), jnp.float32)
    timeit(lambda s, fx: rops.sum_up_external_forces(s, fx, fx, fx),
           scene, scene.m * 0.0, name="sum_up_external_forces")

    spr_c = jnp.zeros((L, 6 * S), jnp.float32)
    zLS = jnp.zeros((L, S), jnp.float32)
    dstack = [zLS] * 8

    def core(u, m, bid, spr_c):
        dinfo = dict(contact_force_dist=dstack[0],
                     closest_point_dist_to_source=dstack[1],
                     x_source=dstack[2], y_source=dstack[3],
                     z_source=dstack[4], vx_source=dstack[5],
                     vy_source=dstack[6], vz_source=dstack[7])
        return cops.contact_force_core(
            u, u, u, m, bid, scene.eta, scene.meta.nb,
            scene.meta.spacing0, dt, 1e5, 1e3, 0.5, zLS, zLS, zLS, dinfo,
            spr_c[:, 0:S], spr_c[:, S:2 * S], spr_c[:, 2 * S:3 * S],
            spr_c[:, 3 * S:4 * S], spr_c[:, 4 * S:5 * S],
            spr_c[:, 5 * S:6 * S])
    timeit(core, zL, zL, zL.astype(jnp.int32), spr_c,
           name="contact_force_core [L,S]")

    def pid_meta(s, pid):
        pidf = pid.reshape(L)
        valid = pidf < n
        pclip = jnp.minimum(pidf, n - 1)
        m_c = jnp.where(valid, s.m.at[pclip].get(mode="clip"), 0.0)
        bid_c = jnp.where(valid, s.body_id.at[pclip].get(mode="clip"), 0)
        return m_c, bid_c
    timeit(pid_meta, scene, pid, name="pid m/bid element gathers")


if __name__ == "__main__":
    main()
