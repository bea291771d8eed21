"""Direct unit tests of the DEM tangential contact table ops
(register -> persist -> prune), the fixed-slot re-design of the
reference's compacting list (``code/dem.py:208-293``)."""

import numpy as np
import jax
import jax.numpy as jnp

from rigid_body_2d_3d_pysph_tpu.models.dem import DEMScheme
from rigid_body_2d_3d_pysph_tpu.ops import dem as dops
from rigid_body_2d_3d_pysph_tpu.ops import neighbors as nbmod
from rigid_body_2d_3d_pysph_tpu.state import make_group, build_scene, ROLE_RIGID


def _scene(positions, velocities=None):
    n = len(positions)
    x = np.array([p[0] for p in positions], float)
    y = np.array([p[1] for p in positions], float)
    g = make_group("sand", x, y, m=1.0, h=0.4, rho=1000.0, rad_s=0.1,
                   role=ROLE_RIGID, body_id=np.arange(n, dtype=np.int32),
                   dem_id=np.arange(n, dtype=np.int32))
    scene = build_scene([g], dim=2, total_no_bodies=n, spacing0=0.1)
    scheme = DEMScheme(granular_particles=["sand"], boundaries=[], dim=2,
                       kn=1e4, en=0.5, max_tng_contacts_limit=4)
    scene = scheme.setup(scene)
    if velocities is not None:
        u = jnp.asarray([v[0] for v in velocities], scene.u.dtype)
        v_ = jnp.asarray([v[1] for v in velocities], scene.v.dtype)
        scene = scene.replace(u=u, v=v_)
    return scheme, scene


def _lvc_once(scene, dt=1e-4):
    nbrs = nbmod.brute_force_neighbors(scene.x, scene.y, scene.z,
                                       scene.active, 0.8, 8)

    @jax.jit
    def run(scene):
        return dops.lvc_displacement(
            scene, nbrs, dt, scene.tng_idx, scene.tng_idx_dem_id,
            scene.tng_x, scene.tng_y, scene.tng_z)

    return run(scene)


def test_contact_registration_and_slot_identity():
    # particles 0-1 overlap (gap 0.15 < 2r = 0.2); particle 2 far away
    scheme, scene = _scene([(0.0, 0.0), (0.15, 0.0), (5.0, 0.0)],
                           velocities=[(0.1, 0.05), (-0.1, 0.0), (0, 0)])
    out = _lvc_once(scene)
    tng_idx, tng_dem, cnt = np.asarray(out[6]), np.asarray(out[7]), \
        np.asarray(out[11])
    assert cnt[0] == 1 and cnt[1] == 1 and cnt[2] == 0
    # slot records the partner's index and dem id
    assert 1 in tng_idx[0]
    assert 0 in tng_idx[1]
    s0 = list(tng_idx[0]).index(1)
    assert tng_dem[0][s0] == 1
    # new contacts exert no tangential force this step (reference
    # dem.py:140-148): torque must be zero
    np.testing.assert_allclose(np.asarray(out[5]), 0.0, atol=1e-14)


def test_spring_grows_then_prunes_on_separation():
    scheme, scene = _scene([(0.0, 0.0), (0.15, 0.0)],
                           velocities=[(0.0, 0.2), (0.0, -0.2)])
    dt = 1e-4
    # step 1: register
    out = _lvc_once(scene, dt)
    scene = scene.replace(tng_idx=out[6], tng_idx_dem_id=out[7],
                          tng_x=out[8], tng_y=out[9], tng_z=out[10],
                          total_tng_contacts=out[11])
    # step 2: spring accumulates tangential displacement vt*dt
    out2 = _lvc_once(scene, dt)
    ty = np.asarray(out2[9])
    s0 = list(np.asarray(out2[6])[0]).index(1)
    np.testing.assert_allclose(ty[0][s0], 0.4 * dt, rtol=1e-9)
    # tangential friction -> torque appears
    assert abs(float(np.asarray(out2[5])[0])) > 0
    scene = scene.replace(tng_idx=out2[6], tng_idx_dem_id=out2[7],
                          tng_x=out2[8], tng_y=out2[9], tng_z=out2[10],
                          total_tng_contacts=out2[11])

    # separate the particles -> prune frees the slots and zeroes springs
    scene = scene.replace(x=jnp.asarray([0.0, 3.0], scene.x.dtype))

    @jax.jit
    def prune(scene):
        return dops.prune_contact_table(
            scene, scene.tng_idx, scene.tng_idx_dem_id,
            scene.tng_x, scene.tng_y, scene.tng_z)

    ti, td, ta, tb, tc, cnt = prune(scene)
    assert int(np.asarray(cnt).sum()) == 0
    assert (np.asarray(ti) == -1).all()
    np.testing.assert_allclose(np.asarray(tb), 0.0, atol=0)
