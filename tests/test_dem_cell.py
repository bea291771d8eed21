"""DEM LVC on the dense cell engine vs the [N, K] neighbor-list path:
identical forces, torques, and contact-table evolution."""

import numpy as np
import jax
import jax.numpy as jnp

from rigid_body_2d_3d_pysph_tpu.models.dem import DEMScheme
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops import dem as dops
from rigid_body_2d_3d_pysph_tpu.ops import dem_cell as dcops
from rigid_body_2d_3d_pysph_tpu.ops import neighbors as nbmod
from rigid_body_2d_3d_pysph_tpu.state import (
    make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY,
)


def _grain_scene(seed=3):
    """A jittered block of grains over a floor — many overlapping pairs."""
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
    u = rng.uniform(-0.5, 0.5, scene.n)
    v = rng.uniform(-0.5, 0.0, scene.n)
    wz = rng.uniform(-2, 2, scene.n)
    scene = scene.replace(u=jnp.asarray(u, scene.x.dtype),
                          v=jnp.asarray(v, scene.x.dtype),
                          wz=jnp.asarray(wz, scene.x.dtype))
    return scheme, scene


def _grain_scene_3d(seed=7):
    """A jittered 3D block of spheres over a floor plane (the reference
    DEM is sphere-sphere 3D, ``code/dem.py:35-205``; the 2D scenes here
    are its z=0 restriction)."""
    rng = np.random.default_rng(seed)
    rad = 0.05
    nx_, ny_, nz_ = 6, 4, 6
    gx_, gy_, gz_ = np.meshgrid(np.arange(nx_) * 2.05 * rad,
                                np.arange(ny_) * 2.05 * rad,
                                np.arange(nz_) * 2.05 * rad)
    n = gx_.size
    x = gx_.ravel() + rng.uniform(-0.2 * rad, 0.2 * rad, n)
    y = gy_.ravel() + 0.9 * rad + rng.uniform(0, 0.2 * rad, n)
    z = gz_.ravel() + rng.uniform(-0.2 * rad, 0.2 * rad, n)
    m = 2600.0 * (2 * rad) ** 3
    fx_, fz_ = np.meshgrid(np.arange(-4, nx_ * 2 + 4) * rad,
                           np.arange(-4, nz_ * 2 + 4) * rad)
    xf, zf = fx_.ravel(), fz_.ravel()
    yf = np.full(len(xf), -0.55 * rad)
    grains = make_group("grains", x, y, z=z, m=m, h=1.2 * rad, rho=2600.0,
                        rad_s=rad, role=ROLE_RIGID,
                        body_id=np.arange(n, dtype=np.int32), dem_id=0)
    floor = make_group("floor", xf, yf, z=zf, m=m, h=1.2 * rad,
                       rho=2600.0, rad_s=rad / 2, role=ROLE_BOUNDARY,
                       dem_id=1)
    scene = build_scene([grains, floor], dim=3, total_no_bodies=2,
                        spacing0=2 * rad)
    scheme = DEMScheme(granular_particles=["grains"], boundaries=["floor"],
                       kn=1e5, en=0.5, gy=-9.81, dim=3)
    scene = scheme.setup(scene)
    fdt = scene.x.dtype
    scene = scene.replace(
        u=jnp.asarray(rng.uniform(-0.5, 0.5, scene.n), fdt),
        v=jnp.asarray(rng.uniform(-0.5, 0.0, scene.n), fdt),
        w=jnp.asarray(rng.uniform(-0.5, 0.5, scene.n), fdt),
        wx=jnp.asarray(rng.uniform(-2, 2, scene.n), fdt),
        wy=jnp.asarray(rng.uniform(-2, 2, scene.n), fdt),
        wz=jnp.asarray(rng.uniform(-2, 2, scene.n), fdt))
    return scheme, scene


def test_dem_cell_3d_trajectory_matches():
    """25 full 3D DEM steps: cell engine vs nklist engine trajectories
    (27-cell stencil; all three angular components live)."""
    scheme_n, scene_n = _grain_scene_3d()
    scheme_c, scene_c = _grain_scene_3d()
    scheme_n.engine = "nklist"
    scheme_c.engine = "cell"
    step_n = scheme_n.make_step(scene_n)
    step_c = scheme_c.make_step(scene_c)
    dt = jnp.asarray(1e-5)
    for _ in range(25):
        scene_n = step_n(scene_n, dt)
        scene_c = step_c(scene_c, dt)
    assert not bool(np.asarray(scene_c.nbr_overflow))
    for k in ("x", "y", "z", "u", "v", "w", "wx", "wy", "wz",
              "fx", "fy", "fz", "torx", "tory", "torz"):
        np.testing.assert_allclose(np.asarray(scene_c[k]),
                                   np.asarray(scene_n[k]), atol=1e-9,
                                   err_msg=k)
    # grains spin and roll out of plane: all torque components nonzero
    assert np.abs(np.asarray(scene_c.torx)).max() > 0
    assert np.abs(np.asarray(scene_c.tory)).max() > 0


def test_dem_cell_matches_nklist_pass():
    scheme, scene = _grain_scene()
    cutoff = float(2.5 * np.asarray(scene.rad_s).max() * 2)
    nbrs = nbmod.brute_force_neighbors(scene.x, scene.y, scene.z,
                                       scene.active, cutoff, 64)
    cell_cfg = cellmod.config_from_positions(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        cutoff, 2, cell_chunk=16)
    dt = jnp.asarray(1e-5)
    tabs = (scene.tng_idx, scene.tng_idx_dem_id,
            scene.tng_x, scene.tng_y, scene.tng_z)

    @jax.jit
    def run(scene):
        nk = dops.lvc_displacement(scene, nbrs, dt, *tabs)
        grid = cellmod.build_cell_grid(scene.x, scene.y, scene.z,
                                       scene.active, cell_cfg)
        cl = dcops.lvc_displacement_cell(scene, grid, cell_cfg, dt, *tabs)
        return grid.overflow, nk, cl

    ovf, nk, cl = run(scene)
    assert not bool(ovf)
    names = ["fx", "fy", "fz", "torx", "tory", "torz"]
    for i, nm in enumerate(names):
        np.testing.assert_allclose(np.asarray(cl[i]), np.asarray(nk[i]),
                                   atol=1e-9, err_msg=nm)
    # table state: compare per-row as (idx, dem) -> spring mapping (slot
    # ORDER may differ between engines; the physics never reads order)
    def table_map(out):
        ti, td, ta, tb, tc = (np.asarray(out[6]), np.asarray(out[7]),
                              np.asarray(out[8]), np.asarray(out[9]),
                              np.asarray(out[10]))
        maps = []
        for r in range(ti.shape[0]):
            live = ti[r] >= 0
            maps.append({(int(i), int(d)): (ta[r, l], tb[r, l], tc[r, l])
                         for l, (i, d) in enumerate(zip(ti[r], td[r]))
                         if live[l]})
        return maps
    m_nk, m_cl = table_map(nk), table_map(cl)
    for r, (a, b) in enumerate(zip(m_nk, m_cl)):
        assert a.keys() == b.keys(), f"row {r} contact sets differ"
        for k in a:
            np.testing.assert_allclose(b[k], a[k], atol=1e-9,
                                       err_msg=f"row {r} pair {k}")
    np.testing.assert_array_equal(np.asarray(cl[11]), np.asarray(nk[11]))


def test_dem_cell_step_trajectory_matches():
    """25 full DEM steps: cell engine vs nklist engine trajectories."""
    scheme_n, scene_n = _grain_scene()
    scheme_c, scene_c = _grain_scene()
    scheme_c.engine = "cell"
    step_n = scheme_n.make_step(scene_n)
    step_c = scheme_c.make_step(scene_c)
    dt = jnp.asarray(1e-5)
    for _ in range(25):
        scene_n = step_n(scene_n, dt)
        scene_c = step_c(scene_c, dt)
    assert not bool(np.asarray(scene_c.nbr_overflow))
    for k in ("x", "y", "u", "v", "wz", "fx", "fy", "torz"):
        np.testing.assert_allclose(np.asarray(scene_c[k]),
                                   np.asarray(scene_n[k]), atol=1e-9,
                                   err_msg=k)


def test_dem_cell_lvc_force_trajectory_matches():
    """25 full DEM steps with the LVCForce contact model: the dense cell
    engine (dem_cell.lvc_force_cell) vs the [N, K] list engine —
    trajectories, forces, and the tangential FORCE table must match
    (reference LVCForce, code/dem.py:296-592; --contact-model selects
    it at :684-687)."""
    import numpy as _np
    rng = _np.random.default_rng(99)
    rad = 0.05
    nx_, ny_ = 12, 6
    gx_, gy_ = _np.meshgrid(_np.arange(nx_) * 2.05 * rad,
                            _np.arange(ny_) * 2.05 * rad)
    x = gx_.ravel() + rng.uniform(-0.2 * rad, 0.2 * rad, gx_.size)
    y = gy_.ravel() + 0.9 * rad + rng.uniform(0, 0.2 * rad, gx_.size)
    m = 2600.0 * (2 * rad) ** 2
    xf = _np.arange(-4, nx_ * 2 + 4) * rad
    yf = _np.full(len(xf), -0.55 * rad)
    uvw = (rng.uniform(-0.5, 0.5, gx_.size + len(xf)),
           rng.uniform(-0.5, 0.0, gx_.size + len(xf)),
           rng.uniform(-2, 2, gx_.size + len(xf)))

    def make(engine):
        grains = make_group("grains", x, y, m=m, h=1.2 * rad, rho=2600.0,
                            rad_s=rad, role=ROLE_RIGID,
                            body_id=np.arange(gx_.size, dtype=np.int32),
                            dem_id=0)
        floor = make_group("floor", xf, yf, m=m, h=1.2 * rad, rho=2600.0,
                           rad_s=rad / 2, role=ROLE_BOUNDARY, dem_id=1)
        scene = build_scene([grains, floor], dim=2, total_no_bodies=2,
                            spacing0=2 * rad)
        scheme = DEMScheme(granular_particles=["grains"],
                           boundaries=["floor"], kn=1e5, en=0.5,
                           gy=-9.81, dim=2, contact_model="LVCForce")
        scheme.engine = engine
        scene = scheme.setup(scene)
        u, v, wz = uvw
        return scheme, scene.replace(
            u=jnp.asarray(u[:scene.n], scene.x.dtype),
            v=jnp.asarray(v[:scene.n], scene.x.dtype),
            wz=jnp.asarray(wz[:scene.n], scene.x.dtype))

    scheme_n, scene_n = make("nklist")
    scheme_c, scene_c = make("cell")
    step_n = scheme_n.make_step(scene_n)
    step_c = scheme_c.make_step(scene_c)
    dt = jnp.asarray(1e-5)
    for _ in range(25):
        scene_n = step_n(scene_n, dt)
        scene_c = step_c(scene_c, dt)
    assert not bool(np.asarray(scene_c.nbr_overflow))
    assert int(np.asarray(scene_n.total_tng_contacts).sum()) > 0
    for k in ("x", "y", "u", "v", "wz", "fx", "fy", "torz",
              "total_tng_contacts"):
        np.testing.assert_allclose(np.asarray(scene_c[k]),
                                   np.asarray(scene_n[k]), atol=1e-9,
                                   err_msg=k)
    # the tangential force tables hold the same (j, value) CONTENT;
    # slot order may differ between engines, so compare per-particle
    # sorted (partner, dem, fx, fy) rows
    tn = np.stack([np.asarray(scene_n.tng_idx),
                   np.asarray(scene_n.tng_idx_dem_id),
                   np.asarray(scene_n.tng_fx),
                   np.asarray(scene_n.tng_fy)], axis=-1)
    tc = np.stack([np.asarray(scene_c.tng_idx),
                   np.asarray(scene_c.tng_idx_dem_id),
                   np.asarray(scene_c.tng_fx),
                   np.asarray(scene_c.tng_fy)], axis=-1)
    for i in range(tn.shape[0]):
        a = tn[i][np.lexsort(tn[i].T[::-1])]
        b = tc[i][np.lexsort(tc[i].T[::-1])]
        np.testing.assert_allclose(b, a, atol=1e-9,
                                   err_msg=f"table row {i}")
