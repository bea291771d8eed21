"""Probe the interest cull at BENCH_N: how many slots survive, and what
the theoretical minimum is (slots whose stencil truly contains a
foreign-dem boundary source within cutoff of some lane)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
from bench import build_scene
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cm
from rigid_body_2d_3d_pysph_tpu.ops import pallas_contact as pc
from rigid_body_2d_3d_pysph_tpu.ops import pallas_pack as pk
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel


def main():
    scheme, scene = build_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    cfg = scheme.cell_config(scene, kernel)
    two_d = cfg.dim == 2
    print(f"n={scene.n} NC_max={cfg.NC_max} M={cfg.M} O={cfg.O} "
          f"cell={cfg.cell:.3e} dims={cfg.dims}", flush=True)

    @jax.jit
    def probe(s):
        payload = pc.contact_payload(s, two_d)
        grid, pt = cm.build_cell_grid_packed(s.x, s.y, s.z, s.active,
                                             cfg, payload)
        dfT = pk.expand_dft_pallas(pt, grid.n_occupied, cfg,
                                   pc.sent_fields(two_d))
        interesting, islot = pc._cull_interesting_slots(dfT, pt.slot_cid,
                                                        cfg)
        return grid.n_occupied, jnp.sum(interesting.astype(jnp.int32))

    n_occ, n_int = probe(scene)
    print(f"n_occupied={int(n_occ)} n_interesting={int(n_int)} "
          f"ratio={int(n_occ) / max(int(n_int), 1):.2f}x", flush=True)


if __name__ == "__main__":
    main()
