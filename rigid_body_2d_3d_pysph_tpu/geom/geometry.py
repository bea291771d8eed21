"""Host-side particle lattice generators.

Covers the reference's geometry layer: PySPH's ``get_2d_block`` /
``get_2d_tank`` / ``get_3d_block`` (imported at ``code/geometry.py:3``)
plus the repo's own builders (``hydrostatic_tank_2d``
``code/geometry.py:6``, ``get_fluid_tank_3d`` ``:27``,
``create_tank_2d_from_block_2d`` ``:105``) and the cylinder lattice
generators of the Zhang case (``code/stack_of_cylinders.py:23-69``).

All functions return float64 numpy arrays (setup is host-side, like the
reference).
"""

from __future__ import annotations

import numpy as np


def get_2d_block(dx: float, length: float, height: float, center=(0.0, 0.0)):
    """Regular 2D lattice spanning [-L/2, L/2] x [-H/2, H/2] + center.

    Matches PySPH's semantics: ``int(length/dx) + 1`` points per axis,
    endpoints inclusive (so a 1.0 x 1.0 block at dx=0.1 has 11 x 11 = 121
    particles, the benchmark-1 body size, ``code/benchmark_1...py:76``).
    """
    n1 = int(round(length / dx)) + 1
    n2 = int(round(height / dx)) + 1
    xs = np.linspace(-length / 2.0, length / 2.0, n1)
    ys = np.linspace(-height / 2.0, height / 2.0, n2)
    x, y = np.meshgrid(xs, ys, indexing="ij")
    return x.ravel() + center[0], y.ravel() + center[1]


def get_3d_block(dx: float, length: float, height: float, depth: float,
                 center=(0.0, 0.0, 0.0)):
    """Regular 3D lattice, endpoints inclusive (PySPH ``get_3d_block``)."""
    n1 = int(round(length / dx)) + 1
    n2 = int(round(height / dx)) + 1
    n3 = int(round(depth / dx)) + 1
    xs = np.linspace(-length / 2.0, length / 2.0, n1)
    ys = np.linspace(-height / 2.0, height / 2.0, n2)
    zs = np.linspace(-depth / 2.0, depth / 2.0, n3)
    x, y, z = np.meshgrid(xs, ys, zs, indexing="ij")
    return (
        x.ravel() + center[0],
        y.ravel() + center[1],
        z.ravel() + center[2],
    )


def get_2d_tank(dx: float, length: float, height: float, num_layers: int = 1):
    """Open U-shaped 2D tank (PySPH ``get_2d_tank`` semantics).

    Frame contract (PySPH parity — the benchmark cases place centered
    bodies in the ABSOLUTE frame, reference
    ``benchmark_3...py:88-90`` / ``benchmark_5...py:294-298``): the
    inner region is x-CENTERED at the origin, spanning
    ``[-length/2, length/2] x [0, height]``, with ``num_layers`` wall
    rows outside it.  Min-aligned consumers
    (:func:`hydrostatic_tank_2d`, the stack-of-cylinders dam) are
    frame-agnostic.
    """
    L, H, k = length, height, num_layers
    x0 = -L / 2.0
    # bottom slab: spans the full footprint including under the side walls
    xb, yb = _grid(x0 - k * dx, L + x0 + k * dx, -k * dx, -dx, dx)
    # left wall
    xl, yl = _grid(x0 - k * dx, x0 - dx, 0.0, H, dx)
    # right wall
    xr, yr = _grid(L + x0 + dx, L + x0 + k * dx, 0.0, H, dx)
    x = np.concatenate([xl, xr, xb])
    y = np.concatenate([yl, yr, yb])
    return x, y


def _grid(x0, x1, y0, y1, dx):
    nx = int(round((x1 - x0) / dx)) + 1
    ny = int(round((y1 - y0) / dx)) + 1
    xs = np.linspace(x0, x1, nx)
    ys = np.linspace(y0, y1, ny)
    x, y = np.meshgrid(xs, ys, indexing="ij")
    return x.ravel(), y.ravel()


def hydrostatic_tank_2d(fluid_length, fluid_height, tank_height, tank_layers,
                        fluid_spacing, tank_spacing):
    """2D tank + fluid block, fluid aligned inside (reference
    ``code/geometry.py:6-24``)."""
    xt, yt = get_2d_tank(
        dx=tank_spacing,
        length=fluid_length + 2.0 * tank_spacing,
        height=tank_height,
        num_layers=tank_layers,
    )
    xf, yf = get_2d_block(fluid_spacing, fluid_length, fluid_height)
    xf += np.min(xt) - np.min(xf)
    yf -= np.min(yf) - np.min(yt)
    xf += tank_spacing * tank_layers
    yf += tank_spacing * tank_layers
    return xf, yf, xt, yt


def get_fluid_tank_3d(fluid_length, fluid_height, fluid_depth, tank_length,
                      tank_height, tank_layers, fluid_spacing, tank_spacing,
                      hydrostatic=False):
    """3D fluid block + 5-sided open tank (reference ``code/geometry.py:27-102``).

    length: x, height: y, depth: z.  The tank's inner x-extent is
    ``tank_length`` unless ``hydrostatic`` (then it hugs the fluid).
    """
    dx = fluid_spacing
    xf, yf, zf = get_3d_block(dx, fluid_length, fluid_height, fluid_depth)
    k = tank_layers

    def block(length, height, depth):
        return get_3d_block(dx, length, height, depth)

    # left / right walls
    xtl, ytl, ztl = block(tank_spacing * (k - 1), tank_height, fluid_depth)
    xtr, ytr, ztr = block(tank_spacing * (k - 1), tank_height, fluid_depth)
    xtl += np.min(xf) - np.max(xtl) - tank_spacing
    ytl += np.min(yf) - np.min(ytl)
    xtr += np.max(xf) - np.min(xtr) + tank_spacing
    if not hydrostatic:
        xtr += tank_length - fluid_length
    ytr += np.min(yf) - np.min(ytr)

    # front / back walls span the full x footprint
    span = np.max(xtr) - np.min(xtl)
    xtf, ytf, ztf = block(span, tank_height, tank_spacing * (k - 1))
    xtf += np.min(xtl) - np.min(xtf)
    ytf += np.min(yf) - np.min(ytf)
    ztf += np.max(ztl) - np.min(ztf) + tank_spacing

    xtb, ytb, ztb = block(span, tank_height, tank_spacing * (k - 1))
    xtb += np.min(xtl) - np.min(xtb)
    ytb += np.min(yf) - np.min(ytb)
    ztb += np.min(ztl) - np.max(ztb) - tank_spacing

    # bottom slab
    xbo, ybo, zbo = block(span, tank_spacing * (k - 1),
                          np.max(ztf) - np.min(ztb))
    xbo += np.min(xtl) - np.min(xbo)
    ybo += np.min(ytl) - np.max(ybo) - tank_spacing

    xt = np.concatenate([xtl, xtr, xtf, xtb, xbo])
    yt = np.concatenate([ytl, ytr, ytf, ytb, ybo])
    zt = np.concatenate([ztl, ztr, ztf, ztb, zbo])
    return xf, yf, zf, xt, yt, zt


def create_tank_2d_from_block_2d(xf, yf, tank_length, tank_height,
                                 tank_spacing, tank_layers):
    """Tank walls around an existing block (reference ``code/geometry.py:105-135``)."""
    dx, k = tank_spacing, tank_layers
    xl, yl = get_2d_block(dx, (k - 1) * dx, tank_height)
    xl += np.min(xf) - np.max(xl) - dx
    yl += np.min(yf) - np.min(yl)

    xr = xl + abs(np.min(xl)) + tank_length + dx
    yr = np.array(yl)

    xb, yb = get_2d_block(dx, np.max(xr) - np.min(xl), (k - 1) * dx)
    xb += np.min(xl) - np.min(xb)
    yb += np.min(yl) - np.max(yb) - dx

    return np.concatenate([xl, xr, xb]), np.concatenate([yl, yr, yb])


def create_circle_1(diameter=1.0, spacing=0.05, center=None):
    """Concentric-ring circle fill (reference ``code/stack_of_cylinders.py:23-49``).

    Particle count per cylinder must match the reference exactly because
    body_id blocks are sized from it (``stack_of_cylinders.py:359``).
    """
    radius = diameter / 2.0
    xs, ys = [0.0], [0.0]
    ring_r = radius - spacing / 2.0
    i = 0
    while ring_r > spacing / 2.0:
        perimeter = 2.0 * np.pi * ring_r
        n_pts = int(perimeter / spacing) + 1
        theta = np.linspace(0.0, 2.0 * np.pi, n_pts)
        for t in theta[:-1]:
            xs.append(ring_r * np.cos(t))
            ys.append(ring_r * np.sin(t))
        i += 1
        ring_r = radius - spacing / 2.0 - i * spacing
    x = np.asarray(xs)
    y = np.asarray(ys)
    if center is not None:
        x = x + center[0]
        y = y + center[1]
    return x, y


def create_circle(diameter=1.0, spacing=0.05, center=None):
    """Block-masked circle fill (reference ``code/stack_of_cylinders.py:52-69``)."""
    radius = diameter / 2.0
    xt, yt = get_2d_block(spacing, diameter + spacing, diameter + spacing)
    keep = xt**2 + yt**2 < radius**2
    x, y = xt[keep], yt[keep]
    if center is not None:
        x = x + center[0]
        y = y + center[1]
    return x, y


def rotate_2d(x, y, angle_deg: float, about=(0.0, 0.0)):
    """Utility: rotate a lattice about a point (degrees)."""
    a = np.deg2rad(angle_deg)
    cx, cy = about
    dx, dy = x - cx, y - cy
    return (
        cx + dx * np.cos(a) - dy * np.sin(a),
        cy + dx * np.sin(a) + dy * np.cos(a),
    )
