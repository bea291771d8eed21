"""Spatial slab sharding (shard_map + ppermute halos) vs the
single-device cell engine: identical trajectories, and the compiled HLO
must contain ring collective-permutes but NO all-gather (the point of
the slab path over GSPMD row sharding)."""

import os

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


def test_jitted_redistribute_matches_host(slab_setup):
    """On-device (shard_map + ppermute) re-decomposition vs the host
    round-trip: same ownership, same active rows, stepping continues."""
    scheme, scene, mesh, cfg, dec, step = slab_setup
    dt = jnp.asarray(1e-4)
    s = dec
    for _ in range(5):
        s = step(s, dt)
    redis = slabmod.make_slab_redistribute(s, mesh, cfg)
    s_dev = redis(s)
    s_host = slabmod.redistribute(s, cfg)
    assert not bool(np.asarray(s_dev.nbr_overflow))
    act_d = np.asarray(s_dev.active)
    act_h = np.asarray(s_host.active)
    assert act_d.sum() == act_h.sum() == scene.n
    # ownership: every active row sits in its own slab on both paths
    for sc, act in ((s_dev, act_d), (s_host, act_h)):
        slab = np.asarray(slabmod._slab_of(np.asarray(sc.x)[act], cfg))
        rows = np.arange(len(act))[act] // (len(act) // cfg.n_dev)
        np.testing.assert_array_equal(slab, rows)
    a = np.lexsort((np.asarray(s_dev.y)[act_d], np.asarray(s_dev.x)[act_d]))
    b = np.lexsort((np.asarray(s_host.y)[act_h],
                    np.asarray(s_host.x)[act_h]))
    for k in ("x", "y", "u", "v"):
        np.testing.assert_allclose(np.asarray(s_dev[k])[act_d][a],
                                   np.asarray(s_host[k])[act_h][b],
                                   atol=0, err_msg=k)
    # stepping continues on the device-redistributed scene
    s2 = step(s_dev, dt)
    assert not bool(np.asarray(s2.nbr_overflow))


def test_redistribute_long_run_isolated():
    """PROCESS-ISOLATED runner for the long-run redistribution check
    below, so the default suite exercises it again: when the long-run
    test executes after this file's other 8-vdevice tests in ONE
    process, XLA:CPU's virtual-device runtime SIGABRTs mid-execution
    with no diagnostic on this 1-core host (reproducible late round 4;
    jax.clear_caches() does not help) — an upstream runtime flake, not
    a physics failure.  A fresh interpreter avoids it deterministically,
    so this wrapper runs the real test in a subprocess (sharing the
    compile cache, so the inner run is ~2 min warm)."""
    import subprocess
    import sys as _sys
    out = subprocess.run(
        [_sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
         __file__ + "::test_jitted_redistribute_long_run_matches_single_device"],
        capture_output=True, text=True, timeout=2400,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, (
        f"isolated long-run redistribute test failed:\n"
        f"{out.stdout[-3000:]}\n{out.stderr[-2000:]}")


@pytest.mark.slow
def test_jitted_redistribute_long_run_matches_single_device(slab_setup):
    """60 steps with on-device redistribution every 10 (bodies fall and
    slide; rows migrate across slab boundaries) vs the single-device
    trajectory.

    slow-marked so only the process-isolated wrapper above runs it in
    the default suite (see its docstring for the one-process flake).
    """
    scheme, scene, mesh, cfg, dec, step = slab_setup
    ref_step = scheme.make_step(scene)
    dt = jnp.asarray(1e-4)
    redis = slabmod.make_slab_redistribute(dec, mesh, cfg)
    s_ref, s_slab = scene, dec
    for i in range(60):
        s_ref = ref_step(s_ref, dt)
        s_slab = step(s_slab, dt)
        if (i + 1) % 10 == 0:
            s_slab = redis(s_slab)
    assert not bool(np.asarray(s_slab.nbr_overflow))
    act = np.asarray(s_slab.active)
    assert act.sum() == s_ref.n
    key_slab = np.lexsort((np.asarray(s_slab.y)[act],
                           np.asarray(s_slab.x)[act]))
    key_ref = np.lexsort((np.asarray(s_ref.y), np.asarray(s_ref.x)))
    for k in ("x", "y", "u", "v"):
        a = np.asarray(s_slab[k])[act][key_slab]
        b = np.asarray(s_ref[k])[key_ref]
        np.testing.assert_allclose(a, b, atol=1e-9, err_msg=k)
