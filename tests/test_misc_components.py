"""Coverage for the remaining component surface: RK2 integrator, the
Canelas Hertzian pair op, checkpoint/resume, and the one-shot evaluator."""

import os

import numpy as np
import jax.numpy as jnp

from rigid_body_2d_3d_pysph_tpu.app import checkpoint as ckpt
from rigid_body_2d_3d_pysph_tpu.geom import get_2d_block
from rigid_body_2d_3d_pysph_tpu.models.rigid_body import (
    RigidBody3DScheme, make_multi_step,
)
from rigid_body_2d_3d_pysph_tpu.ops import contact as cops
from rigid_body_2d_3d_pysph_tpu.ops import neighbors as nbmod
from rigid_body_2d_3d_pysph_tpu.state import (
    make_group, build_scene, ROLE_RIGID,
)
from rigid_body_2d_3d_pysph_tpu.state import rigid_setup as rs


def _free_body(integrator="gtvf"):
    dx, rho = 0.1, 10.0
    x, y = get_2d_block(dx, 1.0, 1.0)
    m = np.full(len(x), rho * dx * dx)
    g = make_group("body", x, y, m=m, h=dx, rho=rho, rad_s=dx / 2,
                   role=ROLE_RIGID, body_id=np.zeros(len(x), np.int32),
                   dem_id=np.zeros(len(x), np.int32))
    scene = build_scene([g], dim=2, total_no_bodies=1, spacing0=dx)
    scheme = RigidBody3DScheme(rigid_bodies=["body"], boundaries=None,
                               dim=2)
    scheme.integrator = integrator
    scene = scheme.setup(scene)
    scene = scheme.set_linear_velocity(scene, np.array([0.5, 0.5, 0.0]))
    scene = scheme.set_angular_velocity(scene, np.array([0.0, 0.0, 1.0]))
    return scheme, scene


def test_rk2_free_body_conserves():
    scheme, scene = _free_body("rk2")
    step = scheme.make_step(scene)
    multi = make_multi_step(step, 100)
    s = multi(scene, jnp.asarray(1e-3))
    m = np.asarray(s.m)
    ke = 0.5 * np.sum(m * (np.asarray(s.u) ** 2 + np.asarray(s.v) ** 2))
    ke0 = 0.5 * np.sum(m * (np.asarray(scene.u) ** 2
                            + np.asarray(scene.v) ** 2))
    assert abs(ke - ke0) / ke0 < 1e-5
    np.testing.assert_allclose(np.asarray(s.xcm)[0, :2], [0.05, 0.05],
                               atol=1e-8)
    R = np.asarray(s.R)[0]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)


def test_canelas_pair_force_oracle():
    """Two overlapping particles of different bodies: F = kn d^1.5 with
    kn = 4/3 E* sqrt(r*) (reference rigid_body_common.py:308-315)."""
    r = 0.05
    overlap = 0.01
    gap = 2 * r - overlap
    g = make_group("b", [0.0, gap], [0.0, 0.0], m=1.0, h=0.2, rho=1000.0,
                   rad_s=r, role=ROLE_RIGID,
                   body_id=np.arange(2, dtype=np.int32),
                   dem_id=np.arange(2, dtype=np.int32),
                   E=np.full(2, 69e9), poisson_ratio=np.full(2, 0.3))
    scene = build_scene([g], dim=2, total_no_bodies=2, spacing0=r)
    scene = rs.setup_body_state(scene)
    nbrs = nbmod.brute_force_neighbors(scene.x, scene.y, scene.z,
                                       scene.active, 1.0, 8)
    fx, fy, fz = cops.canelas_pair_force(scene, nbrs)
    E_eff = 1.0 / (2 * (1 - 0.3**2) / 69e9)
    r_eff = r / 2.0
    kn = 4.0 / 3.0 * E_eff * np.sqrt(r_eff)
    expect = kn * overlap**1.5
    np.testing.assert_allclose(float(fx[0]), -expect, rtol=1e-10)
    np.testing.assert_allclose(float(fx[1]), expect, rtol=1e-10)


def test_checkpoint_roundtrip(tmp_path):
    scheme, scene = _free_body()
    step = scheme.make_step(scene)
    s1 = step(scene, jnp.asarray(1e-3))
    p = os.path.join(tmp_path, "checkpoint.npz")
    ckpt.save_checkpoint(p, s1, t=1e-3, count=1)
    restored, t, count = ckpt.load_checkpoint(p, scene)
    assert t == 1e-3 and count == 1
    for k in ("x", "u", "vcm", "R", "delta_lt_x"):
        np.testing.assert_array_equal(np.asarray(restored[k]),
                                      np.asarray(s1[k]))
    # resumed trajectory == uninterrupted trajectory
    a = step(restored, jnp.asarray(1e-3))
    b = step(s1, jnp.asarray(1e-3))
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))


def test_evaluator_one_shot():
    from rigid_body_2d_3d_pysph_tpu.app.evaluator import evaluate_once
    from rigid_body_2d_3d_pysph_tpu.ops.boundary import (
        boundary_identification,
    )

    scheme, scene = _free_body()

    def fn(scene, nbrs, kernel):
        n, isb = boundary_identification(scene, nbrs, kernel,
                                         scene.active, scene.active)
        return dict(normal=n, is_boundary=isb)

    out = evaluate_once(scene, fn)
    isb = np.asarray(out.is_boundary).astype(bool)
    x = np.asarray(out.x)
    y = np.asarray(out.y)
    on_edge = np.isclose(np.abs(x), 0.5) | np.isclose(np.abs(y), 0.5)
    np.testing.assert_array_equal(isb, on_edge)
