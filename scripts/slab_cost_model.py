"""Measure the slab step's cost split on the REAL chip and write
SLABMODEL.json — the constants that make the v5e-8 extrapolation
falsifiable (VERDICT r4 item 7).

Model: per-device slab step wall time ~= fixed_ms + per_particle_ns * n
(n = particles in the device's shard).  Measured by running the
1-device-mesh slab step at several BENCH_N sizes; comm bytes per
exchange are the static halo-buffer sizes the step actually ppermutes.

The dryrun (__graft_entry__.dryrun_multichip) folds these constants
into its report; BASELINE.md carries the resulting projection formula.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SIZES = [int(s) for s in os.environ.get(
    "SLABMODEL_SIZES", "30000,60000,105000,200000").split(",")]


def measure_one(n):
    """One slab-bench measurement in a fresh process (each size builds
    its own scene/configs; a fresh process also isolates compile state
    on this tunneled host)."""
    env = dict(os.environ, BENCH_WORKLOAD="slab", BENCH_N=str(n),
               BENCH_SKIP_CPU="1")
    out = subprocess.run([sys.executable, "bench.py"], env=env,
                         capture_output=True, text=True, timeout=2400,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    for line in out.stdout.strip().splitlines()[::-1]:
        try:
            r = json.loads(line)
            return r
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"no bench line at n={n}:\n{out.stdout[-2000:]}\n"
                       f"{out.stderr[-1000:]}")


def comm_bytes():
    """Static halo-exchange bytes per device per step, per scheme (what
    the step ppermutes: send buffers both faces)."""
    import numpy as np
    import bench as bench_mod
    from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel
    from rigid_body_2d_3d_pysph_tpu.parallel import slab as slabmod

    out = {}
    # rigid contact scheme at the headline size
    os.environ["BENCH_N"] = "105000"
    scheme, scene = bench_mod.build_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    base = scheme.cell_config(scene, kernel)
    cfg = slabmod.make_slab_config(scene, base, 8)
    ncols = len(slabmod.GHOST_FIELDS) + 3
    out["rigid"] = dict(
        halo_cap_per_face=cfg.halo_cap,
        bytes_per_exchange=2 * cfg.halo_cap * ncols * 4,
        note="2 faces x halo_cap x (ghost fields + valid/dem/fluid) f32")
    return out


def main():
    rows = []
    for n in SIZES:
        r = measure_one(n)
        rows.append(dict(n=r["value"] and r.get("n", n) or n,
                         steps_per_sec=r["value"],
                         ms_per_step=1000.0 / r["value"],
                         plain_steps_per_sec=round(
                             r["value"] / r["vs_baseline"], 2)
                         if r.get("vs_baseline") else None))
        print(f"n~{n}: {r['value']:.1f} steps/s", flush=True)

    # least-squares fit ms = fixed + k * n
    import numpy as np
    ns = np.array(SIZES, float)
    ms = np.array([row["ms_per_step"] for row in rows])
    A = np.stack([np.ones_like(ns), ns], axis=1)
    (fixed_ms, k), *_ = np.linalg.lstsq(A, ms, rcond=None)
    per_particle_ns = k * 1e6

    model = dict(
        measured=rows,
        fixed_ms=round(float(fixed_ms), 3),
        per_particle_ns=round(float(per_particle_ns), 2),
        comm=comm_bytes(),
        projection=(
            "aggregate steps/s on D chips of an N-particle scene ~= "
            "1000 / (fixed_ms + per_particle_ns*1e-6 * N/D); ICI hop "
            "latency is NOT in the 1-device measurement — it adds to "
            "fixed_ms on real multi-chip hardware (two ring "
            "ppermutes/step of bytes_per_exchange each)"),
        host="v5e (1 chip, tunneled)",
    )
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SLABMODEL.json")
    with open(path, "w") as f:
        json.dump(model, f, indent=1)
    print(json.dumps(dict(fixed_ms=model["fixed_ms"],
                          per_particle_ns=model["per_particle_ns"])),
          flush=True)


if __name__ == "__main__":
    main()
