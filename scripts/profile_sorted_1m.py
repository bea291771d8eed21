"""Per-phase timing of the PRODUCTION sorted-pack Pallas path at
BENCH_N particles (each phase its own jit; sums exceed the fused
step — relative attribution only)."""
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
    init_dist = 4.0 * scene.meta.spacing0
    two_d = cfg.dim == 2
    print(f"n={scene.n}  NC_max={cfg.NC_max}  M={cfg.M} O={cfg.O}",
          flush=True)
    dt = jnp.float32(1e-4)

    step = scheme.make_step(scene)
    _, full = timeit(step, scene, dt, name="FULL fused production step")

    build = jax.jit(lambda s: cm.build_cell_grid_packed(
        s.x, s.y, s.z, s.active, cfg, pc.contact_payload(s, two_d)))
    (grid, pt), _ = timeit(build, scene, name="build_cell_grid_packed")
    print(f"n_occupied={int(grid.n_occupied)}", flush=True)

    expand = jax.jit(lambda pt, no: pk.expand_dft_pallas(
        pt, no, cfg, pc.sent_fields(two_d)))
    dfT, _ = timeit(expand, pt, grid.n_occupied, name="expand_dft_pallas")

    kern = jax.jit(lambda dfT, no, nbr: pc.contact_sums_pallas(
        dfT, no, nbr, cfg, kernel, S, init_dist,
        sent_slot=jnp.minimum(no, cfg.NC_max)))
    out, _ = timeit(kern, dfT, grid.n_occupied, grid.nbr_slots,
                    name="contact_sums_pallas (kernel+epilogue)")

    unp = jax.jit(lambda out, grid, s: pc._unpack_contact_out(
        out, grid, cfg, s, S))
    res, _ = timeit(unp, out, grid, scene, name="unpack")

    # tail: contact_force + body sums + integrate (as one jit)
    params = dict(kr=scheme.kr, kf=scheme.kf, fric_coeff=scheme.fric_coeff,
                  gx=scheme.gx, gy=scheme.gy, gz=scheme.gz)
    cfn_x, cfn_y, cfn_z, cfn_w, dinfo = res

    @jax.jit
    def tail(s, cfn_x, cfn_y, cfn_z, cfn_w, dinfo):
        return rb._contact_force_tail(s, cfn_x, cfn_y, cfn_z, cfn_w,
                                      dinfo, params, dt)
    timeit(tail, scene, cfn_x, cfn_y, cfn_z, cfn_w, dinfo,
           name="contact_force tail (+sumup)")


if __name__ == "__main__":
    main()
