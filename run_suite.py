"""Experiment-suite runner — the ``automate.py`` (automan) equivalent.

Runs the case matrix as subprocesses, skipping completed cases
(idempotent re-runs, like automan's Simulation machinery; reference
``automate.py:76-1308``).  Each case writes its own ``*_output`` dir +
info JSON; ``--force`` re-runs everything.

Usage:
  python run_suite.py                 # run every registered case
  python run_suite.py benchmark_1 benchmark_5_2d
  python run_suite.py --list
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
CASES = os.path.join(HERE, "cases")

# case name -> (script, extra argv)
MATRIX = {
    "benchmark_1": ("benchmark_1_rigid_body_rotating_and_translating_freely.py", []),
    "benchmark_2": ("benchmark_2_multiple_rigid_bodies_colliding.py", []),
    "benchmark_2_same_array": (
        "benchmark_2_multiple_rigid_bodies_colliding_same_particle_array.py", []),
    "benchmark_3": (
        "benchmark_3_multiple_rigid_bodies_colliding_same_particle_array.py", []),
    "benchmark_4_en_1.0": ("benchmark_4_rigid_cube_bouncing_on_a_wall.py",
                           ["--coeff-of-restitution", "1.0"]),
    "benchmark_4_en_0.8": ("benchmark_4_rigid_cube_bouncing_on_a_wall.py",
                           ["--coeff-of-restitution", "0.8"]),
    "benchmark_4_en_0.5": ("benchmark_4_rigid_cube_bouncing_on_a_wall.py",
                           ["--coeff-of-restitution", "0.5"]),
    "benchmark_5_2d_two": ("benchmark_5_steady_cubes_on_a_wall_2d.py",
                           ["--two-cubes"]),
    "benchmark_5_2d_three": ("benchmark_5_steady_cubes_on_a_wall_2d.py",
                             ["--three-cubes"]),
    "benchmark_5_2d_pyramid": ("benchmark_5_steady_cubes_on_a_wall_2d.py",
                               ["--pyramid-cubes"]),
    "benchmark_5_3d_one": ("benchmark_5_steady_cubes_on_a_wall_3d.py",
                           ["--one-cube"]),
    "benchmark_5_3d_two": ("benchmark_5_steady_cubes_on_a_wall_3d.py",
                           ["--two-cubes"]),
    "benchmark_5_3d_three": ("benchmark_5_steady_cubes_on_a_wall_3d.py",
                             ["--three-cubes"]),
    "benchmark_5_3d_pyramid": ("benchmark_5_steady_cubes_on_a_wall_3d.py",
                               ["--pyramid-cubes"]),
    "stack_of_cylinders": ("stack_of_cylinders.py", []),
    "stack_of_cylinders_test_1": ("stack_of_cylinders_test_1.py", []),
    "sinking_box": ("rigid_body_rotating_and_sinking_in_tank_2d.py", []),
    "dem_column_collapse": ("dem_granular_column_collapse.py", []),
}


def run_case(name: str, force: bool = False, extra=()) -> bool:
    script, argv = MATRIX[name]
    outdir = os.path.join(HERE, f"{name}_output")
    done_marker = [f for f in (os.listdir(outdir) if os.path.isdir(outdir)
                               else []) if f.endswith(".info.json")]
    if done_marker and not force:
        print(f"[skip] {name} (completed; --force to re-run)")
        return True
    cmd = [sys.executable, os.path.join(CASES, script),
           "-d", outdir, "--quiet"] + argv + list(extra)
    print(f"[run ] {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    r = subprocess.run(cmd)
    ok = r.returncode == 0
    print(f"[{'ok  ' if ok else 'FAIL'}] {name} ({time.time() - t0:.1f}s)",
          flush=True)
    return ok


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cases", nargs="*", help="subset of case names")
    p.add_argument("--list", action="store_true")
    p.add_argument("--force", action="store_true")
    p.add_argument("--max-steps", type=int, default=None,
                   help="cap steps per case (smoke runs)")
    p.add_argument("--validate", action="store_true",
                   help="after the runs, execute validate.py over every "
                        "case and write the evidence artifact")
    p.add_argument("--validate-json", metavar="JSON",
                   default="VALIDATE.json",
                   help="path for the --validate artifact")
    args = p.parse_args()

    if args.list:
        print("\n".join(MATRIX))
        return 0

    names = args.cases or list(MATRIX)
    extra = (["--max-steps", str(args.max_steps)] if args.max_steps else [])
    results = {n: run_case(n, args.force, extra) for n in names}
    print(json.dumps(results, indent=2))
    rc = 0 if all(results.values()) else 1
    if args.validate:
        r = subprocess.run([sys.executable,
                            os.path.join(HERE, "validate.py"),
                            "--json", args.validate_json])
        rc = rc or r.returncode
    return rc


if __name__ == "__main__":
    sys.exit(main())
