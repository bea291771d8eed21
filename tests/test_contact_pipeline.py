"""Unit tests of the Mofidi contact pipeline ops against hand-computed
oracles (reference math: ``code/rigid_body_common.py:631-1032``), plus an
end-to-end symmetric-collision check (benchmark-2 physics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rigid_body_2d_3d_pysph_tpu.geom import get_2d_block
from rigid_body_2d_3d_pysph_tpu.models.rigid_body import (
    RigidBody3DScheme, make_multi_step,
)
from rigid_body_2d_3d_pysph_tpu.ops import contact as cops
from rigid_body_2d_3d_pysph_tpu.ops import neighbors as nbmod
from rigid_body_2d_3d_pysph_tpu.ops.kernels import QuinticSpline
from rigid_body_2d_3d_pysph_tpu.state import (
    make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY,
)
from rigid_body_2d_3d_pysph_tpu.state import rigid_setup as rs


def _mini_scene():
    """One rigid particle (dem 0) + a wall row of 5 particles (dem 1)
    directly below at gap 0.5*dx."""
    dx = 0.1
    xw = np.arange(5) * dx - 2 * dx
    yw = np.full(5, -0.55 * dx)
    body = make_group("body", [0.0], [0.0], m=1.0, h=dx, rho=10.0,
                      rad_s=dx / 2, role=ROLE_RIGID,
                      body_id=[0], dem_id=[0])
    wall = make_group("wall", xw, yw, m=1.0, h=dx, rho=10.0, rad_s=dx / 2,
                      role=ROLE_BOUNDARY, dem_id=1)
    scene = build_scene([body, wall], dim=2, total_no_bodies=2, spacing0=dx)
    scene = rs.setup_body_state(scene)
    from rigid_body_2d_3d_pysph_tpu.models.rigid_body import (
        _attach_contact_fields,
    )
    scene = _attach_contact_fields(scene)
    # wall is a contact surface
    cfib = np.zeros(scene.n)
    cfib[1:] = 1.0
    scene = scene.replace(
        contact_force_is_boundary=jnp.asarray(cfib, scene.x.dtype))
    return scene, dx


@pytest.fixture(scope="module")
def mini():
    scene, dx = _mini_scene()
    kernel = QuinticSpline(dim=2)
    nbrs = nbmod.brute_force_neighbors(scene.x, scene.y, scene.z,
                                       scene.active, 3 * dx, 16)

    @jax.jit
    def run(scene):
        cx, cy, cz, cw = cops.contact_force_normals(scene, nbrs, kernel)
        dinfo = cops.contact_force_distance(scene, nbrs, kernel, cx, cy, cz)
        return cx, cy, cz, cw, dinfo

    cx, cy, cz, cw, dinfo = run(scene)
    return scene, dx, kernel, nbrs, tuple(
        np.asarray(a) for a in (cx, cy, cz, cw)), {
        k: np.asarray(v) for k, v in dinfo.items()}


def test_contact_normal_points_away_from_wall(mini):
    scene, dx, kernel, nbrs, (cx, cy, cz, cw), dinfo = mini
    # slot 1 of particle 0 (the body particle): normal must be +y
    # (xij = x_body - x_wall points up), slot 0 empty
    assert cw[0, 1] > 0
    np.testing.assert_allclose(cx[0, 1], 0.0, atol=1e-12)
    np.testing.assert_allclose(cy[0, 1], 1.0, atol=1e-12)
    assert cw[0, 0] == 0.0
    # wall particles see the body in THEIR slot 0? no: body has
    # contact_force_is_boundary = 0 here, so wall rows stay empty
    assert (cw[1:, :] == 0).all()


def test_contact_distance_oracle(mini):
    scene, dx, kernel, nbrs, (cx, cy, cz, cw), dinfo = mini
    # hand-compute eq. 21: dist = sum(n.xij m/rho W) / sum(m/rho W)
    xw = np.asarray(scene.x)[1:]
    yw = np.asarray(scene.y)[1:]
    xij = 0.0 - xw
    yij = 0.0 - yw
    rij = np.hypot(xij, yij)
    W = np.asarray(kernel.w(rij, dx))
    keep = rij <= 3 * dx
    tmp = (1.0 / 10.0) * W
    proj = yij  # normal is (0,1)
    expect = np.sum((proj * tmp)[keep]) / np.sum(tmp[keep])
    np.testing.assert_allclose(dinfo["contact_force_dist"][0, 1], expect,
                               rtol=1e-12)
    # closest source: the wall particle right below (x=0)
    np.testing.assert_allclose(dinfo["x_source"][0, 1], 0.0, atol=1e-12)
    np.testing.assert_allclose(dinfo["y_source"][0, 1], -0.55 * dx,
                               rtol=1e-12)


def test_contact_force_static_overlap(mini):
    scene, dx, kernel, nbrs, (cx, cy, cz, cw), dinfo = mini
    kr, kf, mu = 1e5, 1e3, 0.5
    dt = 1e-4

    @jax.jit
    def run(scene):
        return cops.contact_force(
            scene, dt, kr, kf, mu,
            jnp.asarray(cx), jnp.asarray(cy), jnp.asarray(cz),
            {k: jnp.asarray(v) for k, v in dinfo.items()},
            scene.delta_lt_x, scene.delta_lt_y, scene.delta_lt_z,
            scene.fn_x, scene.fn_y, scene.fn_z)

    dfx, dfy, dfz, slots = run(scene)
    dist = dinfo["contact_force_dist"][0, 1]
    overlap = dx - dist
    assert overlap > 0
    # at rest: vij = 0 -> moving=False -> ft=0 and fn stays stale (zero)
    np.testing.assert_allclose(np.asarray(dfy)[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(slots["overlap"])[0, 1], overlap,
                               rtol=1e-12)

    # give the body a downward velocity: fn = (kr*overlap - eta*v.n) n
    scene2 = scene.replace(v=scene.v.at[0].set(-1.0))
    dfx2, dfy2, dfz2, slots2 = run(scene2)
    vdotn = -1.0 * 1.0  # v . n with n = +y
    expect_fn = kr * overlap - 0.0 * vdotn  # eta = 0 (coeff_of_rest = 1)
    np.testing.assert_allclose(np.asarray(slots2["fn_y"])[0, 1], expect_fn,
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dfy2)[0], expect_fn, rtol=1e-12)


def test_symmetric_collision_benchmark2():
    """Two cubes approach at +-0.5 m/s; total momentum stays ~0 and the
    collision is symmetric (benchmark-2 invariant, reference
    ``code/benchmark_2...py:109-110``)."""
    dx = 0.05  # coarse: 5x5 cubes
    xb, yb = get_2d_block(dx, 0.2, 0.2)
    x = np.concatenate([xb, xb + 0.4])
    y = np.concatenate([yb, yb])
    bid = np.concatenate([np.zeros(len(xb), np.int32),
                          np.ones(len(xb), np.int32)])
    m = 2000.0 * dx * dx
    body = make_group("body", x, y, m=m, h=1.3 * dx, rho=2000.0,
                      rad_s=dx / 2, role=ROLE_RIGID, body_id=bid,
                      dem_id=bid)
    scene = build_scene([body], dim=2, total_no_bodies=2, spacing0=dx)
    scheme = RigidBody3DScheme(rigid_bodies=["body"], boundaries=None, dim=2)
    scene = scheme.setup(scene)
    scene = scheme.set_linear_velocity(
        scene, np.array([[0.5, 0, 0], [-0.5, 0, 0]]))

    step = scheme.make_step(scene)
    multi = make_multi_step(step, 100)
    dt = jnp.asarray(1.6e-4)
    s = scene
    for _ in range(30):  # 3000 steps ~ t=0.5
        s = multi(s, dt)
    vcm = np.asarray(s.vcm)
    xcm = np.asarray(s.xcm)
    # total momentum zero; x-symmetry about 0.2
    np.testing.assert_allclose(vcm[0] + vcm[1], 0.0, atol=1e-8)
    np.testing.assert_allclose(xcm[0, 0] + xcm[1, 0], 0.4, atol=1e-8)
    # the bodies collided and separated: velocities reversed
    assert vcm[0, 0] < -0.05
    assert vcm[1, 0] > 0.05
    # no interpenetration left
    assert xcm[1, 0] - xcm[0, 0] > 0.2
