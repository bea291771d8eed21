"""Slab-sharded rigid-fluid coupling (two halo exchanges + pressure
resend + psum body reduction per step) vs the single-device cell
engine: identical trajectories, no all-gather."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rigid_body_2d_3d_pysph_tpu import config
from rigid_body_2d_3d_pysph_tpu.geom import (get_2d_block,
                                             hydrostatic_tank_2d)
from rigid_body_2d_3d_pysph_tpu.models.rigid_fluid_coupling import (
    RigidFluidCouplingScheme,
)
from rigid_body_2d_3d_pysph_tpu.parallel import slab as slabmod
from rigid_body_2d_3d_pysph_tpu.parallel.sharded import make_mesh
from rigid_body_2d_3d_pysph_tpu.state import (
    make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY, ROLE_FLUID,
)


def _wide_tank_scene():
    """A long shallow tank (4 m) with two partially submerged boxes —
    fluid in every slab of an 8-device decomposition."""
    dx = 0.05
    gy = -1.0
    rho0 = 1.0
    xf, yf, xt, yt = hydrostatic_tank_2d(4.0, 0.6, 0.9, 3, dx, dx)
    p0 = -rho0 * gy * (yf.max() - yf)
    m_f = rho0 * dx * dx
    c0 = 10 * np.sqrt(2 * abs(gy) * 0.6)
    xb1, yb1 = get_2d_block(dx, 0.2, 0.2)
    boxes_x, boxes_y, bids = [], [], []
    for b, cx in enumerate((1.0, 2.6)):
        boxes_x.append(xb1 + cx)
        boxes_y.append(yb1 + yf.max() - yb1.min() - 0.1)
        bids.append(np.full(len(xb1), b, np.int32))
    xb = np.concatenate(boxes_x)
    yb = np.concatenate(boxes_y)
    bid = np.concatenate(bids)
    fac = 1.0 * dx
    keep = np.ones(len(xf), bool)
    for b in range(2):
        bx, by = boxes_x[b], boxes_y[b]
        keep &= ~((xf > bx.min() - fac) & (xf < bx.max() + fac)
                  & (yf > by.min() - fac) & (yf < by.max() + fac))
    groups = [
        make_group("fluid", xf[keep], yf[keep], m=m_f, h=dx, rho=rho0,
                   role=ROLE_FLUID, p=p0[keep]),
        make_group("tank", xt, yt, m=m_f, h=dx, rho=rho0, rad_s=dx / 2,
                   role=ROLE_BOUNDARY, dem_id=2),
        make_group("body", xb, yb, m=2.0 * rho0 * dx * dx, h=dx,
                   rho=2.0 * rho0, rad_s=dx / 2, role=ROLE_RIGID,
                   body_id=bid, dem_id=bid),
    ]
    scene = build_scene(groups, dim=2, total_no_bodies=3, spacing0=dx)
    scheme = RigidFluidCouplingScheme(
        rigid_bodies=["body"], fluids=["fluid"], boundaries=["tank"],
        dim=2, rho0=rho0, p0=rho0 * c0**2, c0=c0, gy=gy, nu=0.0, h=dx)
    scheme.engine = "cell"
    # the slab step implements the two-build KDK staging; pin the
    # single-chip reference step to the same ordering (the scheme's
    # default is the fused kdkf schedule)
    scheme.gtvf_ordering = "kdk"
    scene = scheme.setup(scene)
    g = scene.meta.group("body")
    m_fsi = np.asarray(scene.m_fsi).copy()
    rho_fsi = np.asarray(scene.rho_fsi).copy()
    m_fsi[g.start:g.stop] = rho0 * dx * dx
    rho_fsi[g.start:g.stop] = rho0
    scene = scene.replace(
        m_fsi=jnp.asarray(m_fsi, config.float_dtype()),
        rho_fsi=jnp.asarray(rho_fsi, config.float_dtype()))
    return scheme, scene


@pytest.fixture(scope="module")
def slab_cpl_setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    scheme, scene = _wide_tank_scene()
    from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel
    base = scheme.cell_config(scene, get_kernel(scheme.kernel_name,
                                                scheme.dim))
    mesh = make_mesh(8)
    cfg = slabmod.make_slab_config(scene, base, 8)
    dec = slabmod.slab_decompose(scene, cfg)
    dec = slabmod.shard_slab_scene(dec, mesh)
    step = slabmod.make_slab_coupling_step(scheme, dec, mesh, cfg)
    return scheme, scene, mesh, cfg, dec, step


@pytest.mark.slow
def test_slab_coupling_matches_single_device(slab_cpl_setup):
    scheme, scene, mesh, cfg, dec, step = slab_cpl_setup
    ref_step = scheme.make_step(scene)
    dt = jnp.asarray(1e-4)
    s_ref, s_slab = scene, dec
    for _ in range(10):
        s_ref = ref_step(s_ref, dt)
        s_slab = step(s_slab, dt)
    assert not bool(np.asarray(s_slab.nbr_overflow))

    act = np.asarray(s_slab.active)
    assert act.sum() == s_ref.n
    key_slab = np.lexsort((np.asarray(s_slab.y)[act],
                           np.asarray(s_slab.x)[act]))
    key_ref = np.lexsort((np.asarray(s_ref.y), np.asarray(s_ref.x)))
    for k in ("x", "y", "u", "v", "rho", "p", "p_fsi", "arho", "au",
              "av"):
        a = np.asarray(s_slab[k])[act][key_slab]
        b = np.asarray(s_ref[k])[key_ref]
        np.testing.assert_allclose(a, b, atol=2e-8, err_msg=k)
    np.testing.assert_allclose(np.asarray(s_slab.force),
                               np.asarray(s_ref.force), atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_slab.xcm),
                               np.asarray(s_ref.xcm), atol=1e-9)


def test_slab_coupling_hlo_collectives(slab_cpl_setup):
    scheme, scene, mesh, cfg, dec, step = slab_cpl_setup
    dt = jnp.asarray(1e-4)
    hlo = step.lower(dec, dt).compile().as_text()
    assert "all-gather" not in hlo
    assert "collective-permute" in hlo


@pytest.mark.slow
def test_slab_coupling_kdkf_matches_single_device():
    """The fused one-grid kdkf staging on the slab path (one exchange +
    one grid per step + a (p, p_fsi, rho) ghost resend) must track the
    single-chip kdkf step."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    scheme, scene = _wide_tank_scene()
    scheme.gtvf_ordering = "kdkf"
    from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel
    base = scheme.cell_config(scene, get_kernel(scheme.kernel_name,
                                                scheme.dim))
    mesh = make_mesh(8)
    cfg = slabmod.make_slab_config(scene, base, 8)
    dec = slabmod.slab_decompose(scene, cfg)
    dec = slabmod.shard_slab_scene(dec, mesh)
    step = slabmod.make_slab_coupling_step(scheme, dec, mesh, cfg)
    ref_step = scheme.make_step(scene)
    dt = jnp.asarray(1e-4)
    s_ref, s_slab = scene, dec
    for _ in range(10):
        s_ref = ref_step(s_ref, dt)
        s_slab = step(s_slab, dt)
    assert not bool(np.asarray(s_slab.nbr_overflow))
    act = np.asarray(s_slab.active)
    assert act.sum() == s_ref.n
    key_slab = np.lexsort((np.asarray(s_slab.y)[act],
                           np.asarray(s_slab.x)[act]))
    key_ref = np.lexsort((np.asarray(s_ref.y), np.asarray(s_ref.x)))
    for k in ("x", "y", "u", "v", "rho", "p", "p_fsi", "arho", "au",
              "av"):
        a = np.asarray(s_slab[k])[act][key_slab]
        b = np.asarray(s_ref[k])[key_ref]
        np.testing.assert_allclose(a, b, atol=2e-8, err_msg=k)
    np.testing.assert_allclose(np.asarray(s_slab.force),
                               np.asarray(s_ref.force), atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_slab.xcm),
                               np.asarray(s_ref.xcm), atol=1e-9)
