"""Slab-sharded DEM (gid-keyed contact tables, ppermute halos) vs the
single-device cell engine: identical trajectories, no all-gather."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rigid_body_2d_3d_pysph_tpu.models.dem import DEMScheme
from rigid_body_2d_3d_pysph_tpu.parallel import slab as slabmod
from rigid_body_2d_3d_pysph_tpu.parallel.sharded import make_mesh
from rigid_body_2d_3d_pysph_tpu.state import (
    make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY,
)


def _wide_grain_scene(seed=4):
    """A long, shallow strip of grains over a floor: every slab of an
    8-device x decomposition holds grains."""
    rng = np.random.default_rng(seed)
    rad = 0.05
    nx_, ny_ = 80, 4
    gx_, gy_ = np.meshgrid(np.arange(nx_) * 2.05 * rad,
                           np.arange(ny_) * 2.05 * rad)
    x = gx_.ravel() + rng.uniform(-0.2 * rad, 0.2 * rad, gx_.size)
    y = gy_.ravel() + 0.9 * rad + rng.uniform(0, 0.2 * rad, gx_.size)
    m = 2600.0 * (2 * rad) ** 2
    xf = np.arange(-6, nx_ * 2 + 6) * rad
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
    scheme.engine = "cell"
    scene = scheme.setup(scene)
    scene = scene.replace(
        u=jnp.asarray(rng.uniform(-0.5, 0.5, scene.n), scene.x.dtype),
        v=jnp.asarray(rng.uniform(-0.5, 0.0, scene.n), scene.x.dtype),
        wz=jnp.asarray(rng.uniform(-2, 2, scene.n), scene.x.dtype))
    return scheme, scene


@pytest.fixture(scope="module")
def slab_dem_setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    scheme, scene = _wide_grain_scene()
    base = scheme.cell_config(scene)
    mesh = make_mesh(8)
    n_global = scene.n
    dec = slabmod.attach_gids(scene)
    cfg = slabmod.make_slab_config(dec, base, 8)
    dec = slabmod.slab_decompose(dec, cfg)
    dec = slabmod.shard_slab_scene(dec, mesh)
    step = slabmod.make_slab_dem_step(scheme, dec, mesh, cfg, n_global)
    return scheme, scene, mesh, cfg, dec, step


@pytest.mark.slow
def test_slab_dem_matches_single_device(slab_dem_setup):
    scheme, scene, mesh, cfg, dec, step = slab_dem_setup
    ref_step = scheme.make_step(scene)
    dt = jnp.asarray(1e-5)
    s_ref, s_slab = scene, dec
    for _ in range(15):
        s_ref = ref_step(s_ref, dt)
        s_slab = step(s_slab, dt)
    assert not bool(np.asarray(s_slab.nbr_overflow))

    act = np.asarray(s_slab.active)
    assert act.sum() == s_ref.n
    # match particles through gids (stable identity)
    gid = np.asarray(s_slab.gid)[act]
    order = np.argsort(gid)
    for k in ("x", "y", "u", "v", "wz", "fx", "fy", "torz",
              "total_tng_contacts"):
        a = np.asarray(s_slab[k])[act][order]
        b = np.asarray(s_ref[k])
        np.testing.assert_allclose(a, b, atol=1e-8, err_msg=k)


def test_slab_dem_hlo_has_no_allgather(slab_dem_setup):
    scheme, scene, mesh, cfg, dec, step = slab_dem_setup
    dt = jnp.asarray(1e-5)
    hlo = step.lower(dec, dt).compile().as_text()
    assert "all-gather" not in hlo
    assert "collective-permute" in hlo


@pytest.mark.slow
def test_slab_dem_redistribute_keeps_tables(slab_dem_setup):
    """Tables key on gids, so redistribution (rows migrate between
    devices) must not perturb the trajectory."""
    scheme, scene, mesh, cfg, dec, step = slab_dem_setup
    dt = jnp.asarray(1e-5)
    s_a = step(step(dec, dt), dt)
    # redistribute mid-run, continue
    s_b = slabmod.shard_slab_scene(slabmod.redistribute(s_a, cfg), mesh)
    s_a2 = step(s_a, dt)
    s_b2 = step(s_b, dt)
    act_a = np.asarray(s_a2.active)
    act_b = np.asarray(s_b2.active)
    ga = np.argsort(np.asarray(s_a2.gid)[act_a])
    gb = np.argsort(np.asarray(s_b2.gid)[act_b])
    for k in ("x", "y", "u", "v", "total_tng_contacts"):
        np.testing.assert_allclose(
            np.asarray(s_a2[k])[act_a][ga],
            np.asarray(s_b2[k])[act_b][gb], atol=1e-12, err_msg=k)
