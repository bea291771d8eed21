"""Fused Pallas DEM kernel vs prune + XLA cell engine (interpret mode).

The kernel is f32-only (TPU production path); the XLA reference runs in
f32 here too.  The kernel fuses the contact-table prune into its slot
matching, so the reference path is prune_contact_table followed by
lvc_displacement_cell on the SAME grid (same candidate order => table
slot assignment matches exactly).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rigid_body_2d_3d_pysph_tpu.models.dem import DEMScheme
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops import dem as dops
from rigid_body_2d_3d_pysph_tpu.ops import dem_cell as dcops
from rigid_body_2d_3d_pysph_tpu.ops import pallas_dem as pdops
from rigid_body_2d_3d_pysph_tpu.state import (
    make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY,
)


def _grain_scene_f32(seed=3):
    rng = np.random.default_rng(seed)
    rad = 0.05
    nx_, ny_ = 12, 6
    gx_, gy_ = np.meshgrid(np.arange(nx_) * 2.05 * rad,
                           np.arange(ny_) * 2.05 * rad)
    x = gx_.ravel() + rng.uniform(-0.2 * rad, 0.2 * rad, gx_.size)
    y = gy_.ravel() + 0.9 * rad + rng.uniform(0, 0.2 * rad, gx_.size)
    m = 2600.0 * (2 * rad) ** 2
    xf = np.arange(-4, nx_ * 2 + 4) * rad
    yf = np.full(len(xf), -0.55 * rad)
    grains = make_group("grains", x, y, m=m, h=1.2 * rad, rho=2600.0,
                        rad_s=rad, role=ROLE_RIGID,
                        body_id=np.arange(gx_.size, dtype=np.int32),
                        dem_id=0)
    floor = make_group("floor", xf, yf, m=m, h=1.2 * rad, rho=2600.0,
                       rad_s=rad / 2, role=ROLE_BOUNDARY, dem_id=1)
    scene = build_scene([grains, floor], dim=2, total_no_bodies=2,
                        spacing0=2 * rad)
    scheme = DEMScheme(granular_particles=["grains"], boundaries=["floor"],
                       kn=1e5, en=0.5, gy=-9.81, dim=2)
    scene = scheme.setup(scene)
    f32 = jnp.float32
    fields = {k: (v.astype(f32) if hasattr(v, "dtype")
                  and v.dtype in (jnp.float64, jnp.float32) else v)
              for k, v in scene.fields.items()}
    scene = type(scene)(fields, scene.meta)
    scene = scene.replace(
        u=jnp.asarray(rng.uniform(-0.5, 0.5, scene.n), f32),
        v=jnp.asarray(rng.uniform(-0.5, 0.0, scene.n), f32),
        wz=jnp.asarray(rng.uniform(-2, 2, scene.n), f32))
    return scheme, scene


def _table_map(ti, td, ta, tb, tc):
    ti, td = np.asarray(ti), np.asarray(td)
    ta, tb, tc = np.asarray(ta), np.asarray(tb), np.asarray(tc)
    maps = []
    for r in range(ti.shape[0]):
        live = ti[r] >= 0
        maps.append({(int(i), int(d)): (ta[r, l], tb[r, l], tc[r, l])
                     for l, (i, d) in enumerate(zip(ti[r], td[r]))
                     if live[l]})
    return maps


def test_pallas_dem_matches_cell_over_steps():
    scheme, scene = _grain_scene_f32()
    # one cfg for both paths: tight DEM cutoff, coarse (factor-2) bins
    cutoff = 2.0 * float(np.asarray(scene.rad_s).max())
    cfg = cellmod.config_from_positions(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        cutoff, 2, cell_chunk=16, cell_factor=2.0)
    dt = jnp.asarray(1e-5, jnp.float32)

    @jax.jit
    def eval_cell(scene):
        tabs = dops.prune_contact_table(
            scene, scene.tng_idx, scene.tng_idx_dem_id,
            scene.tng_x, scene.tng_y, scene.tng_z)[:5]
        grid = cellmod.build_cell_grid(scene.x, scene.y, scene.z,
                                       scene.active, cfg)
        return grid.overflow, dcops.lvc_displacement_cell(
            scene, grid, cfg, dt, *tabs)

    @jax.jit
    def eval_pallas(scene):
        grid = cellmod.build_cell_grid(scene.x, scene.y, scene.z,
                                       scene.active, cfg)
        return grid.overflow, pdops.lvc_displacement_cell_pallas(
            scene, grid, cfg, dt,
            scene.tng_idx, scene.tng_idx_dem_id,
            scene.tng_x, scene.tng_y, scene.tng_z, interpret=True)

    def advance(scene, out):
        """Common toy integration so contacts evolve (break/form)."""
        fx, fy = out[0], out[1]
        m = scene.m
        u = scene.u + dt * (fx / m)
        v = scene.v + dt * (fy / m - 9.81)
        return scene.replace(
            u=u, v=v, x=scene.x + dt * u, y=scene.y + dt * v,
            tng_idx=out[6], tng_idx_dem_id=out[7],
            tng_x=out[8], tng_y=out[9], tng_z=out[10],
            total_tng_contacts=out[11])

    sc_c, sc_p = scene, scene
    for it in range(5):
        ovf_c, out_c = eval_cell(sc_c)
        ovf_p, out_p = eval_pallas(sc_p)
        assert not bool(ovf_c) and not bool(ovf_p)
        for i, nm in enumerate(["fx", "fy", "fz", "torx", "tory", "torz"]):
            np.testing.assert_allclose(
                np.asarray(out_p[i]), np.asarray(out_c[i]),
                rtol=2e-5, atol=2e-3, err_msg=f"iter {it} {nm}")
        m_c = _table_map(out_c[6], out_c[7], out_c[8], out_c[9], out_c[10])
        m_p = _table_map(out_p[6], out_p[7], out_p[8], out_p[9], out_p[10])
        for r, (a, b) in enumerate(zip(m_c, m_p)):
            assert a.keys() == b.keys(), f"iter {it} row {r} contacts"
            for k in a:
                np.testing.assert_allclose(
                    b[k], a[k], rtol=1e-4, atol=1e-9,
                    err_msg=f"iter {it} row {r} pair {k}")
        np.testing.assert_array_equal(np.asarray(out_p[11]),
                                      np.asarray(out_c[11]),
                                      err_msg=f"iter {it} count")
        sc_c = advance(sc_c, out_c)
        sc_p = advance(sc_p, out_p)


@pytest.mark.slow
def test_rowwin_dem_matches_cell_over_steps():
    """Row-window DEM kernel vs prune + XLA cell engine, 5 coupled
    steps.  Candidate lane ORDER differs between the grids, so force
    sums agree to f32 tolerance (not bitwise) and table slot POSITIONS
    may differ — compared as (idx, dem) -> spring maps."""
    from rigid_body_2d_3d_pysph_tpu.ops import rowwin as rw

    scheme, scene = _grain_scene_f32()
    cutoff = 2.0 * float(np.asarray(scene.rad_s).max())
    cfg = cellmod.config_from_positions(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        cutoff, 2, cell_chunk=16, cell_factor=2.0)
    rcfg = rw.rowwin_config_from_positions(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        cutoff, 2)
    dt = jnp.asarray(1e-5, jnp.float32)

    @jax.jit
    def eval_cell(scene):
        tabs = dops.prune_contact_table(
            scene, scene.tng_idx, scene.tng_idx_dem_id,
            scene.tng_x, scene.tng_y, scene.tng_z)[:5]
        grid = cellmod.build_cell_grid(scene.x, scene.y, scene.z,
                                       scene.active, cfg)
        return grid.overflow, dcops.lvc_displacement_cell(
            scene, grid, cfg, dt, *tabs)

    @jax.jit
    def eval_win(scene):
        out = pdops.lvc_displacement_rowwin_pallas(
            scene, rcfg, dt,
            scene.tng_idx, scene.tng_idx_dem_id,
            scene.tng_x, scene.tng_y, scene.tng_z, interpret=True)
        return out[-1].overflow, out[:-1]

    def advance(scene, out):
        fx, fy = out[0], out[1]
        m = scene.m
        u = scene.u + dt * (fx / m)
        v = scene.v + dt * (fy / m - 9.81)
        return scene.replace(
            u=u, v=v, x=scene.x + dt * u, y=scene.y + dt * v,
            tng_idx=out[6], tng_idx_dem_id=out[7],
            tng_x=out[8], tng_y=out[9], tng_z=out[10],
            total_tng_contacts=out[11])

    sc_c, sc_p = scene, scene
    for it in range(5):
        ovf_c, out_c = eval_cell(sc_c)
        ovf_p, out_p = eval_win(sc_p)
        assert not bool(ovf_c) and not bool(ovf_p)
        for i, nm in enumerate(["fx", "fy", "fz", "torx", "tory", "torz"]):
            np.testing.assert_allclose(
                np.asarray(out_p[i]), np.asarray(out_c[i]),
                rtol=2e-4, atol=5e-3, err_msg=f"iter {it} {nm}")
        m_c = _table_map(out_c[6], out_c[7], out_c[8], out_c[9], out_c[10])
        m_p = _table_map(out_p[6], out_p[7], out_p[8], out_p[9], out_p[10])
        for r, (a, b) in enumerate(zip(m_c, m_p)):
            assert a.keys() == b.keys(), f"iter {it} row {r} contacts"
            for k in a:
                np.testing.assert_allclose(
                    b[k], a[k], rtol=1e-3, atol=1e-8,
                    err_msg=f"iter {it} row {r} pair {k}")
        np.testing.assert_array_equal(np.asarray(out_p[11]),
                                      np.asarray(out_c[11]),
                                      err_msg=f"iter {it} count")
        sc_c = advance(sc_c, out_c)
        sc_p = advance(sc_p, out_p)


def test_pallas_dem_3d_matches_cell():
    """3D (27-stencil) DEM Pallas kernel vs the XLA cell engine over 3
    pass+advance iterations (interpret mode; f32)."""
    from test_dem_cell import _grain_scene_3d

    scheme, scene = _grain_scene_3d()
    f32 = jnp.float32
    fields = {k: (v.astype(f32) if hasattr(v, "dtype")
                  and v.dtype in (jnp.float64, jnp.float32) else v)
              for k, v in scene.fields.items()}
    scene = type(scene)(fields, scene.meta)
    cutoff = 2.0 * float(np.asarray(scene.rad_s).max())
    # the scheme's PRODUCTION 3D grid (cell_factor 2.0, M=8 from the
    # SWEEP_3D sweep) so the equivalence test covers the exact deployed
    # configuration, narrow lanes included
    cfg = cellmod.config_from_positions(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        cutoff, 3, cell_chunk=16, cell_factor=scheme.cell_factor,
        M=scheme.cell_M, spill=True)
    dt = jnp.asarray(1e-5, jnp.float32)

    @jax.jit
    def eval_cell(scene):
        tabs = dops.prune_contact_table(
            scene, scene.tng_idx, scene.tng_idx_dem_id,
            scene.tng_x, scene.tng_y, scene.tng_z)[:5]
        grid = cellmod.build_cell_grid(scene.x, scene.y, scene.z,
                                       scene.active, cfg)
        return grid.overflow, dcops.lvc_displacement_cell(
            scene, grid, cfg, dt, *tabs)

    @jax.jit
    def eval_pallas(scene):
        grid = cellmod.build_cell_grid(scene.x, scene.y, scene.z,
                                       scene.active, cfg)
        return grid.overflow, pdops.lvc_displacement_cell_pallas(
            scene, grid, cfg, dt,
            scene.tng_idx, scene.tng_idx_dem_id,
            scene.tng_x, scene.tng_y, scene.tng_z, interpret=True)

    def advance(scene, out):
        fx, fy, fz = out[0], out[1], out[2]
        m = scene.m
        u = scene.u + dt * (fx / m)
        v = scene.v + dt * (fy / m - 9.81)
        w = scene.w + dt * (fz / m)
        return scene.replace(
            u=u, v=v, w=w, x=scene.x + dt * u, y=scene.y + dt * v,
            z=scene.z + dt * w,
            tng_idx=out[6], tng_idx_dem_id=out[7],
            tng_x=out[8], tng_y=out[9], tng_z=out[10],
            total_tng_contacts=out[11])

    sc_c, sc_p = scene, scene
    for it in range(3):
        ovf_c, out_c = eval_cell(sc_c)
        ovf_p, out_p = eval_pallas(sc_p)
        assert not bool(ovf_c) and not bool(ovf_p)
        for i, nm in enumerate(["fx", "fy", "fz", "torx", "tory",
                                "torz"]):
            np.testing.assert_allclose(
                np.asarray(out_p[i]), np.asarray(out_c[i]),
                rtol=2e-5, atol=2e-3, err_msg=f"iter {it} {nm}")
        m_c = _table_map(out_c[6], out_c[7], out_c[8], out_c[9],
                         out_c[10])
        m_p = _table_map(out_p[6], out_p[7], out_p[8], out_p[9],
                         out_p[10])
        for r, (a, b) in enumerate(zip(m_c, m_p)):
            assert a.keys() == b.keys(), f"iter {it} row {r} contacts"
            for k in a:
                np.testing.assert_allclose(
                    b[k], a[k], rtol=1e-4, atol=1e-9,
                    err_msg=f"iter {it} row {r} pair {k}")
        np.testing.assert_array_equal(np.asarray(out_p[11]),
                                      np.asarray(out_c[11]),
                                      err_msg=f"iter {it} count")
        sc_c = advance(sc_c, out_c)
        sc_p = advance(sc_p, out_p)
