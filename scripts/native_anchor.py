"""Single-thread native C++ timing anchor (PySPH stand-in).

PySPH is not installable in this image; the nearest native baseline is
the repo's independent C++ engine (csrc/rbnative.cpp, -O3, cell-list
neighbors, quintic/Mofidi contact, f64).  This script times full GTVF
steps (rb_gtvf_step_n) on the bench.py 100k-particle contact scene and
prints one JSON line.  Multiply by the reference's intended 24-core
OpenMP parallelism (automate.py:17-19) for an ideal-scaling
reference-class CPU number.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("RB_TPU_PLATFORM", "cpu")

import numpy as np  # noqa: E402


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from bench import build_scene
    from rigid_body_2d_3d_pysph_tpu.native import gtvf_step_n

    scheme, scene = build_scene()
    # start in contact so the pair work is representative
    y = np.asarray(scene.y)
    rig = np.asarray(scene.is_rigid)
    import jax.numpy as jnp
    scene = scene.replace(
        y=jnp.asarray(np.where(rig, y - 0.28, y), scene.y.dtype))

    n_steps = int(os.environ.get("ANCHOR_STEPS", 3))
    t0 = time.perf_counter()
    gtvf_step_n(scene, kr=scheme.kr, kf=scheme.kf,
                fric_coeff=scheme.fric_coeff, gx=0.0, gy=-9.81, gz=0.0,
                dt=1e-4, n_steps=n_steps, two_d=True)
    el = (time.perf_counter() - t0) / n_steps
    print(json.dumps({
        "metric": f"native C++ single-thread GTVF steps/sec @ {scene.n}",
        "value": round(1.0 / el, 4),
        "ms_per_step": round(el * 1000, 1),
        "n": scene.n,
    }))


if __name__ == "__main__":
    main()
