"""Scene construction + rigid-body setup math vs analytic/numpy oracles,
and the eta (restitution damping) matrix ported from the reference's unit
tests (``code/test_setup_damping_coefficient.py``)."""

import numpy as np
from math import log, pi

from rigid_body_2d_3d_pysph_tpu.geom import get_2d_block
from rigid_body_2d_3d_pysph_tpu.state import (
    make_group,
    build_scene,
    ROLE_RIGID,
    ROLE_BOUNDARY,
)
from rigid_body_2d_3d_pysph_tpu.state import rigid_setup as rs


def _cube_scene(nbody=1, rho=10.0, dx=0.1):
    xs, ys, bid = [], [], []
    for b in range(nbody):
        x, y = get_2d_block(dx, 1.0, 1.0)
        xs.append(x + 3.0 * b)
        ys.append(y)
        bid.append(np.full(len(x), b, np.int32))
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    bid = np.concatenate(bid)
    m = np.full(len(x), rho * dx * dx)
    g = make_group(
        "body", x, y, m=m, h=dx, rho=rho, rad_s=dx / 2,
        role=ROLE_RIGID, body_id=bid, dem_id=bid,
    )
    scene = build_scene([g], dim=2, total_no_bodies=nbody, spacing0=dx)
    return rs.setup_body_state(scene)


def test_total_mass_and_com():
    s = _cube_scene(nbody=2)
    # 11x11 particles of m = 10*0.01 = 0.1 -> 12.1 per body
    np.testing.assert_allclose(np.asarray(s.total_mass), [12.1, 12.1], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s.xcm)[0], [0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(s.xcm)[1], [3, 0, 0], atol=1e-12)


def test_inertia_tensor_lattice():
    s = _cube_scene()
    # Sum m*(y^2) for the 11x11 lattice: per-axis spread = 0.1*sum_k (k*0.1)^2
    xs = np.linspace(-0.5, 0.5, 11)
    spread = 0.1 * (xs**2).sum() * 11  # m * x'^2 summed over the lattice
    I = np.asarray(s.inertia_tensor_body_frame)[0]
    np.testing.assert_allclose(I[0, 0], spread, rtol=1e-12)  # Ixx from y
    np.testing.assert_allclose(I[1, 1], spread, rtol=1e-12)
    np.testing.assert_allclose(I[2, 2], 2 * spread, rtol=1e-12)
    np.testing.assert_allclose(I[0, 1], 0.0, atol=1e-12)
    Iinv = np.asarray(s.inertia_tensor_inverse_body_frame)[0]
    np.testing.assert_allclose(Iinv @ I, np.eye(3), atol=1e-10)
    np.testing.assert_allclose(np.asarray(s.izz)[0], 2 * spread, rtol=1e-12)


def test_body_frame_vectors():
    s = _cube_scene()
    np.testing.assert_allclose(
        np.asarray(s.dx0), np.asarray(s.x) - np.asarray(s.xcm)[0, 0], atol=1e-12
    )


def test_set_angular_velocity_particle_field():
    s = _cube_scene()
    s = rs.set_linear_velocity(s, np.array([0.5, 0.5, 0.0]))
    s = rs.set_angular_velocity(s, np.array([0.0, 0.0, 1.0]))
    # u = vcm + omega x r  ->  u = 0.5 - y, v = 0.5 + x
    np.testing.assert_allclose(
        np.asarray(s.u), 0.5 - np.asarray(s.y), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(s.v), 0.5 + np.asarray(s.x), atol=1e-12
    )
    # ang_mom = I_global @ omega
    I = np.asarray(s.inertia_tensor_global_frame)[0]
    np.testing.assert_allclose(
        np.asarray(s.ang_mom)[0], I @ np.array([0, 0, 1.0]), rtol=1e-12
    )


# ---------------------------------------------------------------------------
# eta matrix: ported from the reference's test_setup_damping_coefficient.py.
# The reference *implementation* computes eta = -2 ln(e) sqrt(1/(ln^2 e+pi^2))
# — the m_star factor is dropped (rigid_body_common.py:227-228,238-239) and
# re-applied at force time.  Tests 1-5 of the reference use m_star == 1 so
# the oracles below match it verbatim; the boundary-branch oracles are
# adjusted to the implementation (the repo's own tests there are stale).
# ---------------------------------------------------------------------------

def _eta_scalar(e):
    t1 = log(e)
    return -2.0 * t1 * (1.0 / (t1**2 + pi**2)) ** 0.5


def test_eta_single_rigid_body():
    coeff = np.array([[0.8]])
    eta = rs.compute_eta(coeff, np.array([True]))
    np.testing.assert_array_almost_equal(eta, [[_eta_scalar(0.8)]])


def test_eta_two_bodies():
    coeff = np.array([[1.0, 0.8], [0.8, 1.0]])
    eta = rs.compute_eta(coeff, np.array([True, True]))
    t3 = _eta_scalar(0.8)
    np.testing.assert_array_almost_equal(eta, [[0.0, t3], [t3, 0.0]])


def test_eta_five_bodies():
    coeff = np.where(np.eye(5, dtype=bool), 1.0, 0.8)
    eta = rs.compute_eta(coeff, np.ones(5, bool))
    t3 = _eta_scalar(0.8)
    expected = np.where(np.eye(5, dtype=bool), 0.0, t3)
    np.testing.assert_array_almost_equal(eta, expected)


def test_eta_body_plus_boundary_slots():
    # 1 rigid body (dem 0) + boundary (dem 1); slot 2 unused -> stays zero
    coeff = np.array([[1.0, 0.8, 0.5]])
    eta = rs.compute_eta(coeff, np.array([True, True, False]))
    np.testing.assert_array_almost_equal(
        eta, [[0.0, _eta_scalar(0.8), 0.0]]
    )


def test_eta_through_scene_setup():
    """End-to-end: two bodies + tank boundary, coeff matrix like
    benchmark_4 (``code/benchmark_4...py:141-145``)."""
    dx = 0.05
    xb, yb = get_2d_block(dx, 0.2, 0.2)
    x = np.concatenate([xb, xb + 0.4])
    y = np.concatenate([yb, yb])
    bid = np.concatenate([np.zeros(len(xb), np.int32), np.ones(len(xb), np.int32)])
    body = make_group("body", x, y, m=1.0, h=dx, rho=2000.0, rad_s=dx / 2,
                      role=ROLE_RIGID, body_id=bid, dem_id=bid)
    xt, yt = get_2d_block(dx, 1.0, 0.1)
    tank = make_group("tank", xt, yt - 1.0, m=1.0, h=dx, rho=2000.0,
                      rad_s=dx / 2, role=ROLE_BOUNDARY, dem_id=2)
    scene = build_scene([body, tank], dim=2, total_no_bodies=3, spacing0=dx)
    coeff = np.full((2, 3), 0.6)
    scene = rs.setup_body_state(scene, coeff_of_rest=coeff)
    t = _eta_scalar(0.6)
    np.testing.assert_array_almost_equal(
        np.asarray(scene.eta), np.full((2, 3), t)
    )
    assert scene.meta.nb == 2
    assert scene.meta.total_no_bodies == 3
