"""Application/Solver integration smoke tests: run real case apps for a
few steps in-process (CLI parsing, setup, solve loop, snapshots, info
JSON, resume)."""

import json
import os
import sys

import numpy as np
import pytest

CASES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "cases")
sys.path.insert(0, CASES)


def test_benchmark_1_app_smoke(tmp_path):
    from benchmark_1_rigid_body_rotating_and_translating_freely import Case0

    out = str(tmp_path / "b1")
    app = Case0(fname="b1")
    app.run(["-d", out, "--max-steps", "3", "--pfreq", "1", "--quiet"])
    files = sorted(os.listdir(out))
    assert any(f.startswith("snapshot_") for f in files)
    info = json.load(open(app.info_filename))
    assert info["completed"] is True
    res = app.post_process()
    assert len(res["t"]) >= 3


def test_benchmark_2_app_smoke(tmp_path):
    from benchmark_2_multiple_rigid_bodies_colliding import Benchmark2

    out = str(tmp_path / "b2")
    app = Benchmark2(fname="b2")
    scene = app.run(["-d", out, "--max-steps", "2", "--pfreq", "1",
                     "--quiet"])
    # two groups present with opposite velocities
    v1 = np.asarray(scene.vcm)
    assert v1[0, 0] > 0.4 and v1[1, 0] < -0.4


def test_resume_continues(tmp_path):
    from benchmark_1_rigid_body_rotating_and_translating_freely import Case0

    out = str(tmp_path / "b1r")
    app = Case0(fname="b1r")
    app.run(["-d", out, "--max-steps", "2", "--pfreq", "1", "--quiet"])
    app2 = Case0(fname="b1r")
    app2.run(["-d", out, "--max-steps", "4", "--pfreq", "1", "--quiet",
              "--resume"])
    assert app2.solver.count == 4
    # xcm advanced 4 steps of dt=1e-3 at v=0.5
    np.testing.assert_allclose(np.asarray(app2.scene.xcm)[0, 0],
                               0.5 * 4e-3, atol=1e-9)
