"""How much do [M, OM] lane reductions cost inside the fluid Pallas
scaffold?  Runs compute variants with K VPU reductions (K=0 returns a
constant column), and an MXU ones-contraction variant that computes 8
sums in one dot.  BENCH_N sets the scene size."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
from bench import build_coupling_scene
from rigid_body_2d_3d_pysph_tpu.ops import pallas_fluid as pfops
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel


def timeit(fn, *args, n=20, name=""):
    @jax.jit
    def wrapped(acc, *a):
        out = fn(*a)
        return acc + jnp.ravel(out)[0].astype(jnp.float32) * 1e-30
    acc = wrapped(jnp.zeros((), jnp.float32), *args)
    float(acc)
    t0 = time.perf_counter()
    for _ in range(n):
        acc = wrapped(acc, *args)
    float(acc)
    el = (time.perf_counter() - t0) / n * 1000
    print(f"{name:44s} {el:8.2f} ms", flush=True)


def main():
    scheme, scene, dt_f = build_coupling_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    ccfg = scheme.cell_config(scene, kernel)
    pk = jax.jit(lambda s: pfops.pack_fluid_sorted(s, ccfg))
    grid, dfT, sent, pt = pk(scene)
    jax.block_until_ready(dfT)
    print(f"n={scene.n} NC={ccfg.NC_max}", flush=True)

    def make_compute(k_red):
        def compute(q, sL):
            qc, sr, xij, yij, zij, rij, r2, hij = pfops._pair_geom(
                q, sL, kernel)
            cols = []
            for i in range(k_red):
                v = xij * (1.0 + 0.001 * i) + yij
                cols.append(jnp.sum(v, axis=1, keepdims=True))
            if not cols:
                cols = [qc(0)]
            return jnp.concatenate(cols, axis=1) if len(cols) > 1 \
                else cols[0]
        return compute

    def compute_mxu8(q, sL):
        qc, sr, xij, yij, zij, rij, r2, hij = pfops._pair_geom(
            q, sL, kernel)
        M = q.shape[0]
        OM = xij.shape[1]
        quants = [xij * (1.0 + 0.001 * i) + yij for i in range(8)]
        big = jnp.concatenate(quants, axis=0)          # [8M, OM]
        ones = jnp.ones((OM, 128), jnp.float32)
        s = jax.lax.dot_general(big, ones,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jnp.concatenate([s[i * M:(i + 1) * M, :1]
                                for i in range(8)], axis=1)

    for k in (0, 2, 4, 8):
        timeit(lambda dfT, k=k: pfops.cell_pair_pallas(
            None, dfT, grid.n_occupied, grid.nbr_slots, ccfg,
            make_compute(k), max(k, 1), sent_slot=sent), dfT,
            name=f"scaffold + {k} VPU lane reductions")
    timeit(lambda dfT: pfops.cell_pair_pallas(
        None, dfT, grid.n_occupied, grid.nbr_slots, ccfg,
        compute_mxu8, 8, sent_slot=sent), dfT,
        name="scaffold + 8 sums via ONE MXU dot")


if __name__ == "__main__":
    main()
