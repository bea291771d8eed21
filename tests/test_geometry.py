"""Geometry builders: lattice counts and alignment contracts."""

import numpy as np

from rigid_body_2d_3d_pysph_tpu.geom import (
    get_2d_block,
    get_3d_block,
    get_2d_tank,
    hydrostatic_tank_2d,
    get_fluid_tank_3d,
    create_tank_2d_from_block_2d,
    create_circle_1,
    create_circle,
)


def test_2d_block_counts_benchmark1():
    x, y = get_2d_block(0.1, 1.0, 1.0)
    assert len(x) == 121  # benchmark-1 body size (code/benchmark_1...py:76)
    assert np.isclose(x.min(), -0.5) and np.isclose(x.max(), 0.5)


def test_3d_block_counts():
    x, y, z = get_3d_block(0.05, 0.2, 0.2, 0.2)
    assert len(x) == 125  # 5^3, benchmark-5-3d cube


def test_tank_alignment_contract():
    dx, k = 0.05, 5
    L = 1.0
    xt, yt = get_2d_tank(dx=dx, length=L, height=1.5, num_layers=k)
    # PySPH frame parity: inner region x-centered at the origin (the
    # benchmark cases place origin-centered bodies in absolute coords)
    assert np.isclose(xt.min(), -L / 2 - k * dx)
    assert np.isclose(xt.max(), L / 2 + k * dx)
    assert np.isclose(yt.min(), -k * dx)
    # wall thickness: k rows on each side
    left = xt[xt < -L / 2 - dx / 2]
    assert len(np.unique(np.round(left, 9))) == k


def test_hydrostatic_tank_fluid_inside():
    xf, yf, xt, yt = hydrostatic_tank_2d(1.0, 1.0, 1.5, 5, 0.05, 0.05)
    # fluid sits inside the tank footprint
    assert xf.min() > xt.min()
    assert xf.max() < xt.max()
    # gap between fluid bottom and top bottom-wall row is one spacing
    bottom_rows = yt[yt < 0]
    assert np.isclose(yf.min() - bottom_rows.max(), 0.05)


def test_fluid_tank_3d_shapes():
    xf, yf, zf, xt, yt, zt = get_fluid_tank_3d(
        1.0, 0.5, 0.5, 1.5, 1.0, 3, 0.1, 0.1
    )
    assert len(xf) > 0 and len(xt) > 0
    # tank bottom lies below the fluid
    assert yt.min() < yf.min()
    # front/back walls bracket the fluid in z
    assert zt.max() > zf.max() and zt.min() < zf.min()


def test_tank_from_block():
    xf, yf = get_2d_block(0.1, 1.0, 1.0)
    xt, yt = create_tank_2d_from_block_2d(xf, yf, 2.0, 2.0, 0.1, 3)
    assert xt.min() < xf.min() and yt.min() < yf.min()


def test_create_circle_1_counts_stable():
    d, s = 1e-2, 1e-3
    x, y = create_circle_1(d, s)
    r = np.hypot(x, y)
    assert r.max() <= d / 2
    # ring construction: center + rings, deterministic count
    x2, y2 = create_circle_1(d, s, center=[1.0, 2.0])
    assert len(x2) == len(x)
    assert np.isclose(x2.mean() - x.mean(), 1.0)


def test_create_circle_masked():
    x, y = create_circle(1.0, 0.05)
    assert (x**2 + y**2 < 0.25 + 1e-12).all()
