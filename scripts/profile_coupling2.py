"""kdkf coupling step bisection with device_get-anchored timing at
BENCH_N (block_until_ready alone can report queued work as done on this
platform — every timing folds outputs into a fetched scalar)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
from bench import build_coupling_scene
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops import pallas_fluid as pfops
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel


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
        return jnp.sum(x.astype(jnp.float32)) * 1e-30
    return 0.0


def timeit(fn, *args, n=10, name=""):
    @jax.jit
    def wrapped(acc, *a):
        return acc + leafsum(fn(*a))
    acc = wrapped(jnp.zeros((), jnp.float32), *args)
    float(acc)
    t0 = time.perf_counter()
    for _ in range(n):
        acc = wrapped(acc, *args)
    float(acc)
    el = (time.perf_counter() - t0) / n * 1000
    print(f"{name:48s} {el:8.2f} ms", flush=True)


def main():
    scheme, scene, dt_f = build_coupling_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    ccfg = scheme.cell_config(scene, kernel)
    dt = jnp.float32(dt_f)
    S = scene.meta.total_no_bodies
    init_dist = 4.0 * scene.meta.spacing0
    NC = ccfg.NC_max
    print(f"n={scene.n} NC={NC} M={ccfg.M} O={ccfg.O}", flush=True)

    step = scheme.make_step(scene)
    timeit(step, scene, dt, n=5, name="FULL kdkf step")

    timeit(lambda s: pfops.pack_fluid_sorted(s, ccfg), scene, n=5,
           name="pack_fluid_sorted (grid+pack)")

    pk = jax.jit(lambda s: pfops.pack_fluid_sorted(s, ccfg))
    grid, dfT, sent = pk(scene)
    jax.block_until_ready(dfT)

    timeit(lambda s, dfT: pfops.fluid_rates_wall_pallas(
        s, grid, ccfg, kernel, None, dfT, scheme.edac_nu, scheme.c0,
        scheme.edac, True, scheme.gx, scheme.gy, scheme.gz,
        dense=True, sent_slot=sent), scene, dfT, n=5,
        name="fluid_rates_wall_pallas")

    timeit(lambda s, dfT: pfops.fluid_forces_contact_pallas(
        s, grid, ccfg, kernel, None, dfT, scheme.fluid_alpha, scheme.c0,
        True, S, init_dist, sent_slot=sent), scene, dfT, n=5,
        name="fluid_forces_contact_pallas")

    timeit(lambda s, dfT: pfops.fluid_forces_pallas(
        s, grid, ccfg, kernel, None, dfT, scheme.fluid_alpha, scheme.c0,
        True, dense=True, sent_slot=sent), scene, dfT, n=5,
        name="fluid_forces_pallas (no contact)")

    big = jnp.zeros((NC, ccfg.M, 7 + 12 * S + 6), jnp.float32)
    timeit(lambda b: cellmod.unpack(grid, ccfg, b, scene.n, 0.0),
           big, n=5, name=f"unpack [N, {7 + 12 * S + 6}]")

    # contact tail ([N, S] math + 25 field stores)
    from rigid_body_2d_3d_pysph_tpu.models.rigid_body import (
        _contact_force_tail)
    params = dict(kr=scheme.kr, kf=scheme.kf,
                  fric_coeff=scheme.fric_coeff, gx=scheme.gx,
                  gy=scheme.gy, gz=scheme.gz)
    zNS = jnp.zeros((scene.n, S), jnp.float32)
    dinfo = dict(contact_force_dist=zNS,
                 closest_point_dist_to_source=zNS,
                 x_source=zNS, y_source=zNS, z_source=zNS,
                 vx_source=zNS, vy_source=zNS, vz_source=zNS)
    timeit(lambda s: _contact_force_tail(
        s, zNS, zNS, zNS, zNS, dinfo, params, dt), scene, n=5,
        name="_contact_force_tail [N,S]")


if __name__ == "__main__":
    main()
