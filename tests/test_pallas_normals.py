"""Pallas contact-normals kernel vs the XLA cell engine (interpret mode
on CPU; compiled when a TPU is the default backend)."""

import numpy as np
import jax
import jax.numpy as jnp

from rigid_body_2d_3d_pysph_tpu.geom import get_2d_block
from rigid_body_2d_3d_pysph_tpu.models.rigid_body import (
    _attach_contact_fields,
)
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops import contact_cell as ccops
from rigid_body_2d_3d_pysph_tpu.ops import pallas_normals as pnk
from rigid_body_2d_3d_pysph_tpu.ops.kernels import QuinticSpline
from rigid_body_2d_3d_pysph_tpu.state import (
    make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY,
)
from rigid_body_2d_3d_pysph_tpu.state import rigid_setup as rs


def test_pallas_normal_sums_match_xla():
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
    scene = scene.replace(
        contact_force_is_boundary=jnp.ones(scene.n, scene.x.dtype))

    kernel = QuinticSpline(dim=2)
    cutoff = 3 * 1.3 * dx
    cfg = cellmod.config_from_positions(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        cutoff, 2, cell_chunk=16)
    grid = jax.jit(lambda s: cellmod.build_cell_grid(
        s.x, s.y, s.z, s.active, cfg))(scene)

    # XLA engine reference sums (pre-normalization): recompute them from
    # the normalized outputs is lossy, so compare against the raw sums by
    # reusing its block math through the public pipeline inputs
    S = 3
    df, di = ccops.pack_scene(scene, grid, cfg)
    cfx, cfy, cfz, sw = ccops.contact_normals_cell(
        scene, grid, cfg, kernel, S, df, di)

    dfp = pnk.pack_for_pallas(scene, grid, cfg)
    interpret = jax.default_backend() != "tpu"
    sums = pnk.pallas_contact_normal_sums(dfp, grid.nbr_slots, cfg, kernel,
                                          S, interpret=interpret)
    sums = np.asarray(sums, np.float64)
    sx, sy, sz, swp = (sums[..., 0], sums[..., 1], sums[..., 2],
                       sums[..., 3])
    # normalize exactly like contact_normals_cell
    has = swp > 1e-12
    inv_w = np.where(has, 1.0 / np.maximum(swp, 1e-300), 0.0)
    mx, my = sx * inv_w, sy * inv_w
    mz = sz * inv_w
    mag = np.sqrt(mx**2 + my**2 + mz**2)
    inv_m = np.where(has & (mag > 0), 1.0 / np.maximum(mag, 1e-300), 0.0)

    # interpret mode is bit-comparable; compiled TPU differs by f32
    # transcendental lowering near the kernel-support edge (~1e-3 rel on
    # near-zero sums)
    if interpret:
        rtol, atol = 2e-6, 1e-9
    else:
        rtol, atol = 5e-3, 2e-3
    np.testing.assert_allclose(swp, np.asarray(sw), rtol=rtol, atol=atol)
    np.testing.assert_allclose(mx * inv_m, np.asarray(cfx),
                               atol=max(atol, 2e-4))
    np.testing.assert_allclose(my * inv_m, np.asarray(cfy),
                               atol=max(atol, 2e-4))
