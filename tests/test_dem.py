"""DEM scheme tests: head-on LVC collision (momentum + restitution),
tangential history registration/pruning (reference physics:
``code/dem.py`` LVCDisplacement + UpdateTangentialContacts)."""

import numpy as np
import jax.numpy as jnp

from rigid_body_2d_3d_pysph_tpu.models.dem import DEMScheme
from rigid_body_2d_3d_pysph_tpu.models.rigid_body import make_multi_step
from rigid_body_2d_3d_pysph_tpu.state import make_group, build_scene, ROLE_RIGID


def _two_spheres(vy0=0.0):
    r = 0.1
    m = 1.0
    x = np.array([-0.25, 0.25])
    y = np.array([0.0, 0.0])
    g = make_group("sand", x, y, m=m, h=2 * r, rho=1000.0, rad_s=r,
                   role=ROLE_RIGID,
                   body_id=np.arange(2, dtype=np.int32),
                   dem_id=np.arange(2, dtype=np.int32))
    scene = build_scene([g], dim=2, total_no_bodies=2, spacing0=r)
    scheme = DEMScheme(granular_particles=["sand"], boundaries=[], dim=2,
                       kn=1e5, en=0.5)
    scene = scheme.setup(scene)
    scene = scene.replace(
        u=jnp.asarray(np.array([1.0, -1.0]), scene.u.dtype),
        v=jnp.asarray(np.array([vy0, 0.0]), scene.v.dtype),
    )
    return scheme, scene


def test_head_on_collision_momentum_and_restitution():
    scheme, scene = _two_spheres()
    step = scheme.make_step(scene)
    multi = make_multi_step(step, 100)
    dt = jnp.asarray(1e-4)
    s = scene
    # gap = 0.5 - 2r = 0.3, closing speed 2 -> contact at t = 0.15;
    # run to t = 0.3 so the spheres collide and fully separate
    for _ in range(30):
        s = multi(s, dt)
    u = np.asarray(s.u)
    x = np.asarray(s.x)
    # momentum conserved (symmetric)
    np.testing.assert_allclose(u[0] + u[1], 0.0, atol=1e-10)
    # separated and moving apart
    assert x[1] - x[0] > 0.2
    assert u[0] < 0 and u[1] > 0
    # restitution ~ en = 0.5 for the Luding linear model
    e_measured = abs(u[0]) / 1.0
    assert 0.35 < e_measured < 0.65, e_measured
    # contact table empty again after separation
    assert int(np.asarray(s.total_tng_contacts).sum()) == 0


def test_oblique_collision_generates_spin_and_tracks_contact():
    scheme, scene = _two_spheres(vy0=0.0)
    # offset the second sphere slightly so the impact is oblique
    y = np.asarray(scene.y).copy()
    y[1] = 0.05
    scene = scene.replace(y=jnp.asarray(y, scene.y.dtype))
    step = scheme.make_step(scene)
    multi = make_multi_step(step, 100)
    dt = jnp.asarray(1e-4)
    s = scene
    max_contacts = 0
    for _ in range(30):
        s = multi(s, dt)
        max_contacts = max(max_contacts,
                           int(np.asarray(s.total_tng_contacts).max()))
    # the tangential table saw the contact
    assert max_contacts >= 1
    # oblique friction imparts spin
    assert abs(float(np.asarray(s.wz)[0])) > 1e-3
    # linear momentum still conserved
    np.testing.assert_allclose(np.asarray(s.u).sum(), 0.0, atol=1e-8)


def test_lvc_force_model_head_on():
    """The LVCForce variant (tangential-force springs) conserves momentum
    and produces a damped rebound (reference dem.py:296-505; unreachable
    through the reference's scheme due to its duplicated elif — exposed
    here as contact_model='LVCForce')."""
    from rigid_body_2d_3d_pysph_tpu.models.dem import DEMScheme
    from rigid_body_2d_3d_pysph_tpu.state import (
        make_group, build_scene, ROLE_RIGID,
    )

    r = 0.1
    x = np.array([-0.25, 0.25])
    g = make_group("sand", x, np.zeros(2), m=1.0, h=2 * r, rho=1000.0,
                   rad_s=r, role=ROLE_RIGID,
                   body_id=np.arange(2, dtype=np.int32),
                   dem_id=np.arange(2, dtype=np.int32))
    scene = build_scene([g], dim=2, total_no_bodies=2, spacing0=r)
    scheme = DEMScheme(granular_particles=["sand"], boundaries=[], dim=2,
                       kn=1e5, en=0.5, contact_model="LVCForce")
    scene = scheme.setup(scene)
    scene = scene.replace(u=jnp.asarray(np.array([1.0, -1.0]),
                                        scene.u.dtype))
    step = scheme.make_step(scene)
    multi = make_multi_step(step, 100)
    dt = jnp.asarray(1e-4)
    s = scene
    for _ in range(30):
        s = multi(s, dt)
    u = np.asarray(s.u)
    np.testing.assert_allclose(u[0] + u[1], 0.0, atol=1e-10)
    assert u[0] < 0 and u[1] > 0
    x = np.asarray(s.x)
    assert x[1] - x[0] > 0.2
