"""Fused Pallas contact kernel vs the XLA cell engine (interpret mode).

The kernel is f32-only (TPU production path); the XLA reference is run
in f32 here too, so tolerances are f32-scale.  On-TPU compiled
equivalence is exercised by the bench/validation runs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rigid_body_2d_3d_pysph_tpu.geom import get_2d_block
from rigid_body_2d_3d_pysph_tpu.models.rigid_body import (
    _attach_contact_fields,
)
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops import contact_cell as ccops
from rigid_body_2d_3d_pysph_tpu.ops import pallas_contact as pcops
from rigid_body_2d_3d_pysph_tpu.ops.kernels import QuinticSpline
from rigid_body_2d_3d_pysph_tpu.state import (
    make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY,
)
from rigid_body_2d_3d_pysph_tpu.state import rigid_setup as rs


def _scene_f32():
    dx = 0.05
    xb, yb = get_2d_block(dx, 0.2, 0.2)
    x = np.concatenate([xb, xb + 0.2 + 0.6 * dx])
    y = np.concatenate([yb, yb])
    bid = np.concatenate([np.zeros(len(xb), np.int32),
                          np.ones(len(xb), np.int32)])
    xw = np.arange(-10, 20) * dx
    yw = np.full(len(xw), yb.min() - 0.7 * dx)
    body = make_group("body", x, y, m=2000 * dx * dx, h=1.3 * dx,
                      rho=2000.0, rad_s=dx / 2, role=ROLE_RIGID,
                      body_id=bid, dem_id=bid)
    wall = make_group("wall", xw, yw, m=2000 * dx * dx, h=1.3 * dx,
                      rho=2000.0, rad_s=dx / 2, role=ROLE_BOUNDARY,
                      dem_id=2)
    scene = build_scene([body, wall], dim=2, total_no_bodies=3, spacing0=dx)
    scene = rs.setup_body_state(scene)
    scene = _attach_contact_fields(scene)
    rng = np.random.default_rng(7)
    n = scene.n
    f32 = jnp.float32
    # run the whole comparison in f32 (the kernel's dtype)
    fields = {k: (v.astype(f32) if hasattr(v, "dtype")
                  and v.dtype in (jnp.float64, jnp.float32) else v)
              for k, v in scene.fields.items()}
    scene = type(scene)(fields, scene.meta)
    scene = scene.replace(
        contact_force_is_boundary=jnp.ones(n, f32),
        u=jnp.asarray(rng.uniform(-1, 1, n), f32),
        v=jnp.asarray(rng.uniform(-1, 1, n), f32),
    )
    return scene, dx


def test_pallas_contact_matches_xla_fused():
    scene, dx = _scene_f32()
    kernel = QuinticSpline(dim=2)
    cutoff = 3 * 1.3 * dx
    cfg = cellmod.config_from_positions(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        cutoff, 2, cell_chunk=16)

    @jax.jit
    def run(scene):
        grid = cellmod.build_cell_grid(scene.x, scene.y, scene.z,
                                       scene.active, cfg)
        xla = ccops.contact_pipeline_cell_fused(scene, grid, cfg, kernel)
        pls = pcops.contact_pipeline_cell_pallas(scene, grid, cfg, kernel,
                                                 interpret=True)
        return grid.overflow, xla, pls

    ovf, (cx, cy, cz, cw, dx_), (px, py, pz, pw, dp) = run(scene)
    assert not bool(ovf)
    # f32 pair math + factored slot sums: tolerances at f32 scale
    np.testing.assert_allclose(np.asarray(px), np.asarray(cx), atol=2e-4)
    np.testing.assert_allclose(np.asarray(py), np.asarray(cy), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pz), np.asarray(cz), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pw), np.asarray(cw),
                               rtol=2e-4, atol=1e-8)
    for k in dx_:
        np.testing.assert_allclose(np.asarray(dp[k]), np.asarray(dx_[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)


def _scene_3d_f32():
    from rigid_body_2d_3d_pysph_tpu.geom import get_3d_block

    dx = 0.05
    xb, yb, zb = get_3d_block(dx, 0.2, 0.2, 0.2)
    x = np.concatenate([xb, xb + 0.2 + 0.6 * dx])
    y = np.concatenate([yb, yb])
    z = np.concatenate([zb, zb])
    bid = np.concatenate([np.zeros(len(xb), np.int32),
                          np.ones(len(xb), np.int32)])
    # floor slab under both bodies
    xw, yw = np.meshgrid(np.arange(-6, 16) * dx, np.arange(-6, 16) * dx)
    xw, yw = xw.ravel(), yw.ravel()
    zw = np.full(len(xw), zb.min() - 0.7 * dx)
    body = make_group("body", x, y, m=2000 * dx**3, h=1.3 * dx,
                      rho=2000.0, rad_s=dx / 2, role=ROLE_RIGID,
                      body_id=bid, dem_id=bid, z=z)
    wall = make_group("wall", xw, yw, m=2000 * dx**3, h=1.3 * dx,
                      rho=2000.0, rad_s=dx / 2, role=ROLE_BOUNDARY,
                      dem_id=2, z=zw)
    scene = build_scene([body, wall], dim=3, total_no_bodies=3, spacing0=dx)
    scene = rs.setup_body_state(scene)
    scene = _attach_contact_fields(scene)
    rng = np.random.default_rng(11)
    n = scene.n
    f32 = jnp.float32
    fields = {k: (v.astype(f32) if hasattr(v, "dtype")
                  and v.dtype in (jnp.float64, jnp.float32) else v)
              for k, v in scene.fields.items()}
    scene = type(scene)(fields, scene.meta)
    scene = scene.replace(
        contact_force_is_boundary=jnp.ones(n, f32),
        u=jnp.asarray(rng.uniform(-1, 1, n), f32),
        v=jnp.asarray(rng.uniform(-1, 1, n), f32),
        w=jnp.asarray(rng.uniform(-1, 1, n), f32),
    )
    return scene, dx


@pytest.mark.slow
def test_pallas_contact_matches_xla_fused_3d():
    """27-cell stencil path (O=27): the 3D schemes' production kernel."""
    scene, dx = _scene_3d_f32()
    kernel = QuinticSpline(dim=3)
    cutoff = 3 * 1.3 * dx
    cfg = cellmod.config_from_positions(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        cutoff, 3, cell_chunk=16)

    @jax.jit
    def run(scene):
        grid = cellmod.build_cell_grid(scene.x, scene.y, scene.z,
                                       scene.active, cfg)
        xla = ccops.contact_pipeline_cell_fused(scene, grid, cfg, kernel)
        pls = pcops.contact_pipeline_cell_pallas(scene, grid, cfg, kernel,
                                                 interpret=True)
        return grid.overflow, xla, pls

    ovf, (cx, cy, cz, cw, dx_), (px, py, pz, pw, dp) = run(scene)
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(px), np.asarray(cx), atol=2e-4)
    np.testing.assert_allclose(np.asarray(py), np.asarray(cy), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pz), np.asarray(cz), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pw), np.asarray(cw),
                               rtol=2e-4, atol=1e-8)
    for k in dx_:
        np.testing.assert_allclose(np.asarray(dp[k]), np.asarray(dx_[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
