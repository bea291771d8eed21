"""Spatial slab sharding (shard_map + ppermute halos) vs the
single-device cell engine: identical trajectories, and the compiled HLO
must contain ring collective-permutes but NO all-gather (the point of
the slab path over GSPMD row sharding)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rigid_body_2d_3d_pysph_tpu.geom import get_2d_block
from rigid_body_2d_3d_pysph_tpu.models.rigid_body import RigidBody2DScheme
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel
from rigid_body_2d_3d_pysph_tpu.parallel import slab as slabmod
from rigid_body_2d_3d_pysph_tpu.parallel.sharded import make_mesh
from rigid_body_2d_3d_pysph_tpu.state import (
    make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY,
)


def _wide_scene():
    """10 cubes spread along 3 m of wall: every slab of an 8-device
    decomposition holds particles."""
    dx = 0.05
    xb, yb = get_2d_block(dx, 0.2, 0.2)
    xs, ys, bids = [], [], []
    for b in range(10):
        xs.append(xb + 0.32 * b)
        ys.append(yb)
        bids.append(np.full(len(xb), b, np.int32))
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    bid = np.concatenate(bids)
    xw = np.arange(-8, 70) * dx
    yw = np.full(len(xw), yb.min() - 0.7 * dx)
    m = 2000 * dx * dx
    body = make_group("body", x, y, m=m, h=1.3 * dx, rho=2000.0,
                      rad_s=dx / 2, role=ROLE_RIGID, body_id=bid,
                      dem_id=bid)
    wall = make_group("wall", xw, yw, m=m, h=1.3 * dx, rho=2000.0,
                      rad_s=dx / 2, role=ROLE_BOUNDARY, dem_id=10)
    scene = build_scene([body, wall], dim=2, total_no_bodies=11,
                        spacing0=dx)
    scheme = RigidBody2DScheme(rigid_bodies=["body"], boundaries=["wall"],
                               gy=-9.81, dim=2)
    scheme.engine = "cell"
    scene = scheme.setup(scene)
    return scheme, scene


@pytest.fixture(scope="module")
def slab_setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    scheme, scene = _wide_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    base = scheme.cell_config(scene, kernel)
    mesh = make_mesh(8)
    cfg = slabmod.make_slab_config(scene, base, 8)
    dec = slabmod.slab_decompose(scene, cfg)
    dec = slabmod.shard_slab_scene(dec, mesh)
    step = slabmod.make_slab_step(scheme, dec, mesh, cfg)
    return scheme, scene, mesh, cfg, dec, step


@pytest.mark.slow
def test_slab_step_matches_single_device(slab_setup):
    scheme, scene, mesh, cfg, dec, step = slab_setup
    ref_step = scheme.make_step(scene)
    dt = jnp.asarray(1e-4)
    s_ref, s_slab = scene, dec
    for _ in range(20):
        s_ref = ref_step(s_ref, dt)
        s_slab = step(s_slab, dt)
    assert not bool(np.asarray(s_slab.nbr_overflow))

    # compare by matching particles through (x0, y0) identity: use body_id
    # + position ordering instead — the slab scene is a permutation of
    # the reference scene plus inactive padding.
    act = np.asarray(s_slab.active)
    key_slab = np.lexsort((np.asarray(s_slab.y)[act],
                           np.asarray(s_slab.x)[act]))
    key_ref = np.lexsort((np.asarray(s_ref.y), np.asarray(s_ref.x)))
    assert act.sum() == s_ref.n
    for k in ("x", "y", "u", "v"):
        a = np.asarray(s_slab[k])[act][key_slab]
        b = np.asarray(s_ref[k])[key_ref]
        np.testing.assert_allclose(a, b, atol=1e-9, err_msg=k)
    np.testing.assert_allclose(np.asarray(s_slab.force),
                               np.asarray(s_ref.force), atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_slab.xcm),
                               np.asarray(s_ref.xcm), atol=1e-9)


def test_slab_hlo_has_no_allgather(slab_setup):
    scheme, scene, mesh, cfg, dec, step = slab_setup
    dt = jnp.asarray(1e-4)
    hlo = step.lower(dec, dt).compile().as_text()
    assert "all-gather" not in hlo, "slab path must not all-gather"
    assert "collective-permute" in hlo, "expected ppermute halo exchange"


def test_redistribute_roundtrip(slab_setup):
    scheme, scene, mesh, cfg, dec, step = slab_setup
    dt = jnp.asarray(1e-4)
    s = step(dec, dt)
    s2 = slabmod.redistribute(s, cfg)
    act1 = np.asarray(s.active)
    act2 = np.asarray(s2.active)
    assert act1.sum() == act2.sum() == scene.n
    a = np.lexsort((np.asarray(s.y)[act1], np.asarray(s.x)[act1]))
    b = np.lexsort((np.asarray(s2.y)[act2], np.asarray(s2.x)[act2]))
    np.testing.assert_allclose(np.asarray(s.x)[act1][a],
                               np.asarray(s2.x)[act2][b], atol=0)
    # stepping after redistribution still works
    s3 = step(slabmod.shard_slab_scene(s2, mesh), dt)
    assert not bool(np.asarray(s3.nbr_overflow))
