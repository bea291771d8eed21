"""kdkf phase timing with MINIMAL anchoring: each phase accumulates one
element of its (pallas-opaque) output into a fetched scalar — the
kernels cannot be elided, and the anchor adds ~nothing (unlike a
full-output leafsum, which re-reads every [N,S] array and inflates
S-minor-heavy phases)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
from bench import build_coupling_scene
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops import pallas_fluid as pfops
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel


def timeit(fn, *args, n=10, name=""):
    @jax.jit
    def wrapped(acc, *a):
        out = fn(*a)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype") and x.size > 0]
        return acc + sum(jnp.ravel(x)[0].astype(jnp.float32) * 1e-30
                         for x in leaves)
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
    print(f"n={scene.n} NC={NC} M={ccfg.M} O={ccfg.O} "
          f"G={ccfg.n_cells_total}", flush=True)

    step = scheme.make_step(scene)
    timeit(step, scene, dt, n=5, name="FULL kdkf step")

    timeit(lambda s: pfops.pack_fluid_sorted(s, ccfg), scene, n=5,
           name="pack_fluid_sorted (grid+pack)")

    pk = jax.jit(lambda s: pfops.pack_fluid_sorted(s, ccfg))
    grid, dfT, sent, pt = pk(scene)
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

    from rigid_body_2d_3d_pysph_tpu.ops import pallas_contact as pcops
    timeit(lambda dfT: pcops._cull_interesting_slots(
        dfT, pt.slot_cid, ccfg, union=True), dfT, n=5,
        name="union cull")

    big = jnp.zeros((NC, ccfg.M, 13), jnp.float32)
    timeit(lambda b: jnp.sum(cellmod.unpack(grid, ccfg, b, scene.n, 0.0)),
           big, n=5, name="unpack [N,13] (full-read anchor)")


if __name__ == "__main__":
    main()
