"""Sweep the spillover-grid lane width M for the contact fast path at
BENCH_N particles.

Motivation: the fused kernel's stencil DMA bookkeeping issues O_p
copies per SLOT; doubling M halves both the slot count NC and the
packed stencil width O_p (each neighbor cell needs half the slots), so
the total DMA-issue count drops ~4x while the candidate pair-lane total
(N x O_p*128/M lanes ... per-query lanes O_p*M) stays invariant.
BASELINE.md's nodma ablation put the DMA overhead at ~9 ms of the
64 ms pre-cull kernel at 1M.

Each configuration is bit-compared against the M=16 production output.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

from bench import build_scene
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops import pallas_contact as pcops
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel


def run_cfg(scheme, scene, kernel, M, ref=None, n=10):
    cfg = cellmod.config_from_positions(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        float(kernel.radius_scale * np.asarray(scene.h).max()),
        scheme.dim, M=M, spill=True,
        capacity_boost=scheme.capacity_boost)
    pipe = jax.jit(lambda s: pcops.contact_pipeline_sorted_pallas(
        s, cfg, kernel))
    try:
        out = pipe(scene)
        jax.block_until_ready(out[0])
        grid = out[-1]
        assert not bool(np.asarray(grid.overflow)), "overflow"
        t0 = time.perf_counter()
        for _ in range(n):
            out = pipe(scene)
        jax.block_until_ready(out[0])
        el = (time.perf_counter() - t0) / n * 1000
        tag = ""
        if ref is not None:
            # lane layout changes the f32 accumulation grouping, so
            # compare within tolerance (not bit-equal across M)
            md = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                     for a, b in zip(ref[:4], out[:4]))
            tag = f"  max|d|={md:.2e}" + ("  OK" if md < 1e-4
                                          else "  MISMATCH")
        print(f"M={M:3d} NC={cfg.NC_max:6d} O_p={cfg.O:3d} "
              f"OM={cfg.O * M:5d}  {el:7.2f} ms{tag}", flush=True)
        return out
    except Exception as e:
        print(f"M={M:3d} FAILED: {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        return None


def main():
    os.environ.setdefault("BENCH_ENGINE", "pallas")
    scheme, scene = build_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    print(f"n={scene.n}", flush=True)
    ref = run_cfg(scheme, scene, kernel, 16)
    for M in (8, 24, 32, 48):
        run_cfg(scheme, scene, kernel, M, ref=ref)


if __name__ == "__main__":
    main()
