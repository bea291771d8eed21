"""Ablate the slab step's overhead at BENCH_N on a 1-device mesh:
full slab step vs a variant with the halo exchange force-disabled
(H=8 tiny buffers) vs the plain step."""
import os, sys, time, dataclasses
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
from bench import build_scene
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel
from rigid_body_2d_3d_pysph_tpu.parallel import slab as slabmod
from rigid_body_2d_3d_pysph_tpu.parallel.sharded import make_mesh


def time_chain(stepfn, state, dt, n=100):
    out = stepfn(state, dt)
    jax.block_until_ready(out.fields["x"])
    t0 = time.perf_counter()
    s = out
    for _ in range(n):
        s = stepfn(s, dt)
    jax.block_until_ready(s.fields["x"])
    el = (time.perf_counter() - t0) / n * 1000
    assert not bool(np.asarray(s.nbr_overflow).any())
    return el


def main():
    scheme, scene = build_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    base = scheme.cell_config(scene, kernel)
    dt = jnp.asarray(1e-4)
    plain = scheme.make_step(scene)
    print(f"plain: {time_chain(plain, scene, dt):.2f} ms", flush=True)

    mesh = make_mesh(1)
    for name, patch in (("full", {}), ("tiny-halo", {"halo_cap": 8})):
        cfg = slabmod.make_slab_config(scene, base, 1)
        if patch:
            cfg = dataclasses.replace(cfg, **patch)
        dec = slabmod.shard_slab_scene(
            slabmod.slab_decompose(scene, cfg,
                                   use_blob=scheme._compact_enabled()),
            mesh)
        step = slabmod.make_slab_step(scheme, dec, mesh, cfg)
        print(f"slab {name}: {time_chain(step, dec, dt):.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
