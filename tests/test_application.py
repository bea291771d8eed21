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


@pytest.mark.slow
def test_overflow_triggers_grid_rebuild(tmp_path):
    """Free-falling grains with a deliberately TIGHT initial domain:
    the fall exits it within a few chunks -> dom_overflow -> the Solver
    must rebuild the grid from the chunk-start positions and re-run the
    chunk (PySPH's NNPS grows dynamically; here growth is a host-side
    rebuild — see Solver.solve)."""
    import jax.numpy as jnp

    from rigid_body_2d_3d_pysph_tpu.app.application import Solver
    from rigid_body_2d_3d_pysph_tpu.models.dem import DEMScheme
    from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
    from rigid_body_2d_3d_pysph_tpu.state import (
        make_group, build_scene, ROLE_RIGID,
    )

    r = 1e-3
    xs, ys = np.meshgrid(np.arange(4) * 2.1e-3, np.arange(4) * 2.1e-3)
    g = make_group("sand", xs.ravel(), ys.ravel(), m=1e-3, h=2 * r,
                   rho=2600.0, rad_s=r, role=ROLE_RIGID,
                   body_id=np.arange(16, dtype=np.int32), dem_id=0)
    scene = build_scene([g], dim=2, total_no_bodies=1, spacing0=2.1e-3)
    scheme = DEMScheme(granular_particles=["sand"], boundaries=[], dim=2,
                       kn=1e5, en=0.5, gy=-9.81)
    scheme.engine = "cell"
    scene = scheme.setup(scene)
    # tight domain: zero extent slack (only the 2*cutoff pad) — a dt=1e-3
    # free fall exits it after ~30 steps
    cutoff = 2.0 * r
    scheme._cell_cfg = cellmod.config_from_positions(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        cutoff, 2, slack=0.0)

    solver = Solver(scheme, scene, dt=1e-3, tf=0.06, pfreq=10,
                    output_dir=str(tmp_path / "ovf"))
    out = solver.solve(quiet=True)
    # completed the full run: 60 steps of 9.81 m/s^2 free fall
    assert solver.count == 60
    y = np.asarray(out.y)
    # DEM kick-drift-kick with stored forces: step 1's half-kick sees
    # zero stored force, so y_n = -g dt^2 n(n-1)/2 exactly
    expect = ys.ravel() - 0.5 * 9.81 * 1e-6 * 60 * 59
    np.testing.assert_allclose(y, expect, rtol=1e-4)
    # the tight grid was replaced (at least one rebuild happened):
    # the rebuilt domain is recentered below the start height
    assert scheme._cell_cfg is not None
    assert float(scheme._cell_cfg.origin[1]) < -4 * r


def test_refresh_configs_grow_widens_boost():
    from rigid_body_2d_3d_pysph_tpu.models.rigid_body import (
        RigidBody3DScheme,
    )

    s = RigidBody3DScheme(rigid_bodies=["b"], boundaries=[], dim=3)
    assert s.capacity_boost == 1.0
    s.refresh_configs(None, grow=True)
    assert s.capacity_boost == 1.5
    s.refresh_configs(None, grow=True)
    assert s.capacity_boost == 2.25


def test_scheme_chooser_refresh_delegates():
    """refresh_configs through a SchemeChooser must clear the SELECTED
    scheme's cached configs (a setattr on the chooser would shadow its
    __getattr__ and leave the inner scheme's stale grid live)."""
    from rigid_body_2d_3d_pysph_tpu.models.base import SchemeChooser
    from rigid_body_2d_3d_pysph_tpu.models.rigid_body import (
        RigidBody2DScheme,
    )

    inner = RigidBody2DScheme(rigid_bodies=["b"], boundaries=[], dim=2)
    inner._cell_cfg = object()  # pretend a grid config is cached
    ch = SchemeChooser(default="rb2d", rb2d=inner)
    ch.refresh_configs(None, grow=True)
    assert inner._cell_cfg is None
    assert inner.capacity_boost == 1.5
    assert ch.capacity_boost == 1.5
    assert "_cell_cfg" not in ch.__dict__
