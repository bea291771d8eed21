"""Per-phase timing of the COMPACT pipeline at BENCH_N."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
from bench import build_scene
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cm
from rigid_body_2d_3d_pysph_tpu.ops import pallas_contact as pc
from rigid_body_2d_3d_pysph_tpu.ops import pallas_pack as pk
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
    print(f"{name:46s} {el:8.2f} ms", flush=True)
    return out, el


def main():
    scheme, scene = build_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    cfg = scheme.cell_config(scene, kernel)
    S = scene.meta.total_no_bodies
    two_d = cfg.dim == 2
    ni = scheme.ni_max(cfg)
    print(f"n={scene.n}  NC_max={cfg.NC_max}  M={cfg.M} O={cfg.O} "
          f"ni_max={ni}", flush=True)
    dt = jnp.float32(1e-4)
    params = dict(kr=scheme.kr, kf=scheme.kf, fric_coeff=scheme.fric_coeff,
                  gx=scheme.gx, gy=scheme.gy, gz=scheme.gz)

    step = scheme.make_step(scene)
    timeit(step, scene, dt, name="FULL fused production step (compact)")

    ev = jax.jit(lambda s: rb.rigid_contact_force_eval_compact(
        s, cfg, kernel, params, dt, ni))
    timeit(ev, scene, name="rigid_contact_force_eval_compact")

    pipe = jax.jit(lambda s: pc.contact_pipeline_compact_pallas(
        s, cfg, kernel, ni))
    (out_c, pid, uvw, grid, ovf), _ = timeit(
        pipe, scene, name="contact_pipeline_compact_pallas")

    build = jax.jit(lambda s: cm.build_cell_grid_packed(
        s.x, s.y, s.z, s.active, cfg, pc.contact_payload(s, two_d),
        want_dense_pos=False))
    (grid, pt), _ = timeit(build, scene, name="build (no dense_pos)")

    expand = jax.jit(lambda pt, no: pk.expand_dft_pallas(
        pt, no, cfg, pc.sent_fields(two_d)))
    dfT, _ = timeit(expand, pt, grid.n_occupied, name="expand_dft_pallas")

    cull = jax.jit(lambda dfT, sc: pc._cull_interesting_slots(dfT, sc, cfg))
    (interesting, islot), _ = timeit(cull, dfT, pt.slot_cid, name="cull")
    print(f"n_int={int(jnp.sum(interesting.astype(jnp.int32)))}",
          flush=True)

    # tail alone (via a closure over precomputed pipeline outputs is hard
    # to isolate; instead time eval minus pipeline)


if __name__ == "__main__":
    main()
