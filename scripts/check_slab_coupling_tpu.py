"""On-TPU check: the slab-sharded COUPLING step (shard_map + ppermute +
the Pallas fluid/contact kernels) lowers and runs on a real chip.

A 1-device mesh exercises the pallas-under-shard_map composition for
the fluid pair kernels — the piece `check_slab_pallas_tpu.py` covers
for contact only.  Runs both stagings (kdk two-build, kdkf fused) and
compares each against the corresponding unsharded step.
"""

import os
import sys

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_here, ".."))
sys.path.insert(0, os.path.join(_here, "..", "tests"))

import jax
import jax.numpy as jnp

from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel
from rigid_body_2d_3d_pysph_tpu.parallel import slab as slabmod
from rigid_body_2d_3d_pysph_tpu.parallel.sharded import make_mesh


def run(ordering):
    from test_slab_coupling import _wide_tank_scene

    scheme, scene = _wide_tank_scene()
    scheme.engine = "pallas"
    scheme.gtvf_ordering = ordering
    f32 = jnp.float32
    fields = {k: (v.astype(f32) if hasattr(v, "dtype")
                  and v.dtype in (jnp.float64, jnp.float32) else v)
              for k, v in scene.fields.items()}
    scene = type(scene)(fields, scene.meta)
    base = scheme.cell_config(scene, get_kernel(scheme.kernel_name,
                                                scheme.dim))
    mesh = make_mesh(1)
    cfg = slabmod.make_slab_config(scene, base, 1)
    dec = slabmod.shard_slab_scene(slabmod.slab_decompose(scene, cfg),
                                   mesh)
    step = slabmod.make_slab_coupling_step(scheme, dec, mesh, cfg)
    dt = jnp.asarray(1e-4, f32)
    s = step(dec, dt)
    jax.block_until_ready(s.fields["x"])
    assert not bool(np.asarray(s.nbr_overflow)), f"{ordering}: overflow"

    plain = scheme.make_step(scene)
    p = plain(scene, dt)
    act = np.asarray(s.active)
    a = np.lexsort((np.asarray(s.y)[act], np.asarray(s.x)[act]))
    b = np.lexsort((np.asarray(p.y), np.asarray(p.x)))
    for k in ("x", "y", "u", "v", "rho", "p", "p_fsi"):
        va = np.asarray(s[k])[act][a]
        vb = np.asarray(p[k])[b]
        np.testing.assert_allclose(va, vb, atol=5e-5,
                                   err_msg=f"{ordering}:{k}")
    print(f"slab coupling ({ordering}) + pallas fluid kernels, "
          f"1-device mesh: ok, matches plain step", flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    run("kdk")
    run("kdkf")
    print("SLAB_COUPLING_TPU OK", flush=True)


if __name__ == "__main__":
    main()
