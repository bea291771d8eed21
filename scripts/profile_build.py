"""Attribute build_cell_grid_packed's time at BENCH_N: the payload
sort, the spill-grid finisher (compaction sort, cummax expansions,
stencil table), the dense_pos sort, and the pack-table math."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

from bench import build_scene
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cm
from rigid_body_2d_3d_pysph_tpu.ops import pallas_contact as pc
from rigid_body_2d_3d_pysph_tpu.ops import pallas_pack
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel


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
    print(f"n={scene.n} NC_max={cfg.NC_max} M={cfg.M} O={cfg.O} "
          f"G={cfg.n_cells_total}")
    payload = pc.contact_payload(scene, cfg.dim == 2)

    full = jax.jit(lambda s: cm.build_cell_grid_packed(
        s.x, s.y, s.z, s.active, cfg, pc.contact_payload(s, cfg.dim == 2)))
    (grid, pt), _ = timeit(full, scene, name="build_cell_grid_packed (full)")

    dft = jax.jit(lambda p, n: pallas_pack.expand_dft_pallas(
        p, n, cfg, pc.sent_fields(cfg.dim == 2)))
    timeit(dft, pt, grid.n_occupied, name="expand_dft_pallas")

    # 1) keys
    keys = jax.jit(lambda s: cm._cell_keys(s.x, s.y, s.z, s.active, cfg))
    (key, dov, G), _ = timeit(keys, scene, name="  _cell_keys")
    G = int(G)

    # 2) the payload sort alone
    n = scene.n
    idx = jnp.arange(n, dtype=jnp.int32)

    def do_sort(key, s):
        ops = (key,) + tuple(jnp.asarray(p, jnp.float32)
                             for p in pc.contact_payload(s, cfg.dim == 2)) \
            + (idx,)
        return jax.lax.sort(ops, num_keys=1)

    sj = jax.jit(do_sort)
    res, _ = timeit(sj, key, scene, name="  payload sort (9 operands)")

    sj2 = jax.jit(lambda key: jax.lax.sort((key, idx), num_keys=1))
    timeit(sj2, key, name="  bare sort (2 operands)")

    ks, order = res[0], res[-1]
    valid_s = ks < jnp.asarray(G)
    head = valid_s & jnp.concatenate(
        [jnp.ones(1, bool), ks[1:] != ks[:-1]])

    # 3) finisher (everything after the sort)
    fin = jax.jit(lambda ks, order, valid_s, head: cm._finish_spill_grid(
        cfg, n, G, ks, order, valid_s, head, idx, dov, want_pack=True))
    timeit(fin, ks, order, valid_s, head, name="  _finish_spill_grid")

    # 3a) dense_pos sort alone (inside finisher when want_pack)
    dps = jax.jit(lambda order, d: jax.lax.sort_key_val(order, d))
    dpos_sorted = jnp.where(valid_s, jnp.clip(jnp.cumsum(
        head.astype(jnp.int32)) - 1, 0, cfg.NC_max - 1) * cfg.M, 0)
    timeit(dps, order, dpos_sorted, name="    dense_pos sort (2 operands)")

    # 3b) compaction sort alone (4 operands)
    key2 = jnp.where(head, jnp.cumsum(head.astype(jnp.int32)) - 1,
                     jnp.int32(2 ** 30))
    cs = jax.jit(lambda a, b, c, d: jax.lax.sort((a, b, c, d), num_keys=1))
    timeit(cs, key2, ks, dpos_sorted, idx, name="    compaction sort (4 ops)")


if __name__ == "__main__":
    main()
