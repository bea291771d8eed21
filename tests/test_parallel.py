"""Multi-device SPMD: the sharded step must reproduce the single-device
step (8-device virtual CPU mesh, particle-axis sharding)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rigid_body_2d_3d_pysph_tpu.geom import get_2d_block
from rigid_body_2d_3d_pysph_tpu.models.rigid_body import RigidBody2DScheme
from rigid_body_2d_3d_pysph_tpu.parallel.sharded import (
    make_mesh, pad_scene, shard_scene, make_sharded_step,
)
from rigid_body_2d_3d_pysph_tpu.state import (
    make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY,
)


def _contact_scene():
    dx = 0.04
    xb, yb = get_2d_block(dx, 0.2, 0.2)
    x = np.concatenate([xb, xb + 0.25])
    y = np.concatenate([yb, yb]) + 0.2
    bid = np.concatenate([np.zeros(len(xb), np.int32),
                          np.ones(len(xb), np.int32)])
    xw = np.arange(-8, 20) * dx
    yw = np.full(len(xw), -0.02)
    m = 2000 * dx * dx
    body = make_group("body", x, y, m=m, h=1.3 * dx, rho=2000.0,
                      rad_s=dx / 2, role=ROLE_RIGID, body_id=bid,
                      dem_id=bid)
    wall = make_group("wall", xw, yw, m=m, h=1.3 * dx, rho=2000.0,
                      rad_s=dx / 2, role=ROLE_BOUNDARY, dem_id=2)
    scene = build_scene([body, wall], dim=2, total_no_bodies=3, spacing0=dx)
    scheme = RigidBody2DScheme(rigid_bodies=["body"], boundaries=["wall"],
                               gy=-9.81, dim=2)
    scene = scheme.setup(scene)
    return scheme, scene


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    scheme, scene = _contact_scene()
    dt = jnp.asarray(1e-4)

    step = scheme.make_step(scene)
    # run the single-device reference on the PADDED scene so shapes match
    mesh = make_mesh(8)
    padded = pad_scene(scene, 8)
    ref = step(padded, dt)

    sharded_scene = shard_scene(scene, mesh)
    sstep = make_sharded_step(scheme, sharded_scene, mesh)
    out = sstep(sharded_scene, dt)

    for k in ("x", "y", "u", "v", "fx", "fy"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-9, err_msg=k)
    np.testing.assert_allclose(np.asarray(out.force), np.asarray(ref.force),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(out.xcm), np.asarray(ref.xcm),
                               atol=1e-12)
    # shards really exist
    assert len(out.fields["x"].sharding.device_set) == 8
