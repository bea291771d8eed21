"""Benchmark-1 physics oracle: a single rigid body translating and
rotating freely (no gravity, no contacts) must conserve kinetic energy
and move its COM in a straight line (reference
``code/benchmark_1_rigid_body_rotating_and_traslating_freely.py``,
post-processing checks at :140-178)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rigid_body_2d_3d_pysph_tpu.geom import get_2d_block
from rigid_body_2d_3d_pysph_tpu.state import make_group, build_scene, ROLE_RIGID
from rigid_body_2d_3d_pysph_tpu.models.rigid_body import (
    RigidBody2DScheme,
    RigidBody3DScheme,
    make_multi_step,
)


def _free_body_scene(scheme):
    dx, rho = 0.1, 10.0
    x, y = get_2d_block(dx, 1.0, 1.0)
    m = np.full(len(x), rho * dx * dx)
    g = make_group("body", x, y, m=m, h=dx, rho=rho, rad_s=dx / 2,
                   role=ROLE_RIGID, body_id=np.zeros(len(x), np.int32),
                   dem_id=np.zeros(len(x), np.int32))
    scene = build_scene([g], dim=2, total_no_bodies=1, spacing0=dx)
    scene = scheme.setup(scene)
    scene = scheme.set_linear_velocity(scene, np.array([0.5, 0.5, 0.0]))
    scene = scheme.set_angular_velocity(scene, np.array([0.0, 0.0, 1.0]))
    return scene


def _ke(scene):
    m = np.asarray(scene.m)
    u = np.asarray(scene.u)
    v = np.asarray(scene.v)
    return 0.5 * np.sum(m * (u**2 + v**2))


@pytest.mark.parametrize("cls", [RigidBody2DScheme, RigidBody3DScheme])
def test_free_body_conservation(cls):
    scheme = cls(rigid_bodies=["body"], boundaries=None, dim=2)
    scene = _free_body_scene(scheme)
    ke0 = _ke(scene)

    step = scheme.make_step(scene)
    multi = make_multi_step(step, 100)
    dt = 1e-3
    scene1 = multi(scene, jnp.asarray(dt))
    scene2 = multi(scene1, jnp.asarray(dt))

    for s, nstep in ((scene1, 100), (scene2, 200)):
        t = nstep * dt
        xcm = np.asarray(s.xcm)[0]
        # straight-line COM at velocity (0.5, 0.5)
        np.testing.assert_allclose(xcm[:2], [0.5 * t, 0.5 * t], atol=1e-10)
        # energy conserved
        assert abs(_ke(s) - ke0) / ke0 < 1e-6
        # omega stays (0,0,1)
        np.testing.assert_allclose(np.asarray(s.omega)[0], [0, 0, 1],
                                   atol=1e-8)
        # R orthonormal and equal to rotation by t (O(dt^2) integrator error)
        R = np.asarray(s.R)[0]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        c, si = np.cos(t), np.sin(t)
        R_exact = np.array([[c, -si, 0], [si, c, 0], [0, 0, 1]])
        np.testing.assert_allclose(R, R_exact, atol=5e-4)
        # particles carried rigidly: |r - xcm| preserved
        r0 = np.hypot(np.asarray(scene.x) - 0.0, np.asarray(scene.y) - 0.0)
        r1 = np.hypot(np.asarray(s.x) - xcm[0], np.asarray(s.y) - xcm[1])
        np.testing.assert_allclose(np.sort(r0), np.sort(r1), atol=1e-9)


def test_boundary_identification_square():
    """On a square lattice, exactly the outer ring is flagged as boundary."""
    scheme = RigidBody2DScheme(rigid_bodies=["body"], boundaries=None, dim=2)
    scene = _free_body_scene(scheme)
    isb = np.asarray(scene.is_boundary).astype(bool)
    x = np.asarray(scene.x)
    y = np.asarray(scene.y)
    on_edge = (np.isclose(np.abs(x), 0.5) | np.isclose(np.abs(y), 0.5))
    np.testing.assert_array_equal(isb, on_edge)


def test_leapfrog_free_body():
    """LeapFrogRigidBody3DStep port (reference rigid_body_3d.py:228-405,
    dead code there): free body conserves KE and translates straight."""
    scheme = RigidBody3DScheme(rigid_bodies=["body"], boundaries=None,
                               dim=2)
    scheme.integrator = "leapfrog"
    scene = _free_body_scene(scheme)
    ke0 = _ke(scene)
    step = scheme.make_step(scene)
    multi = make_multi_step(step, 100)
    s = multi(scene, jnp.asarray(1e-3))
    xcm = np.asarray(s.xcm)[0]
    np.testing.assert_allclose(xcm[:2], [0.05, 0.05], atol=1e-8)
    assert abs(_ke(s) - ke0) / ke0 < 1e-5
    R = np.asarray(s.R)[0]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s.omega)[0], [0, 0, 1],
                               atol=1e-7)
