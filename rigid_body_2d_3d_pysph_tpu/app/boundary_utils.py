"""Standalone one-shot boundary identification for template lattices.

Several reference apps identify surface particles on a single-body
template and tile the flags across identical bodies, because running the
identification on a packed stack misclassifies touching faces
(``code/benchmark_5_steady_cubes_on_a_wall_2d.py:179-220``,
``code/stack_of_cylinders.py:254-297``).  This helper reproduces that
workflow against our ops: build a tiny one-group Scene, run the
3-stage pipeline, return the integer flags.
"""

from __future__ import annotations

import numpy as np

import jax

from ..ops import neighbors as nbmod
from ..ops.boundary import boundary_identification
from ..ops.kernels import get_kernel
from ..state.scene import build_scene, make_group, ROLE_RIGID


def identify_template(x, y, z=None, m=1.0, h=1.0, rho=1.0, dim=2,
                      kernel_name: str = "quintic") -> np.ndarray:
    """Surface flags (int 0/1) for a standalone particle lattice."""
    n = len(np.atleast_1d(x))
    g = make_group("tpl", x, y, z, m=m, h=h, rho=rho, rad_s=0.0,
                   role=ROLE_RIGID, body_id=np.zeros(n, np.int32),
                   dem_id=np.zeros(n, np.int32))
    scene = build_scene([g], dim=dim, total_no_bodies=1, spacing0=0.0)
    kernel = get_kernel(kernel_name, dim)
    cutoff = float(kernel.radius_scale * np.asarray(scene.h).max())
    mcap, kcap = nbmod.estimate_capacities(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        cutoff, dim)
    cfg = nbmod.default_config(dim, cutoff, scene.n, max_neighbors=kcap,
                               max_per_cell=mcap)

    @jax.jit
    def run(scene):
        nbrs = nbmod.build_neighbors(scene.x, scene.y, scene.z,
                                     scene.active, cfg)
        mask = scene.active
        return boundary_identification(scene, nbrs, kernel, mask, mask)

    _, isb = run(scene)
    return np.asarray(isb)


def identify_normals_template(x, y, z=None, m=1.0, h=1.0, rho=1.0, dim=2,
                              kernel_name: str = "quintic"):
    """Like :func:`identify_template` but also returns the normals."""
    n = len(np.atleast_1d(x))
    g = make_group("tpl", x, y, z, m=m, h=h, rho=rho, rad_s=0.0,
                   role=ROLE_RIGID, body_id=np.zeros(n, np.int32),
                   dem_id=np.zeros(n, np.int32))
    scene = build_scene([g], dim=dim, total_no_bodies=1, spacing0=0.0)
    kernel = get_kernel(kernel_name, dim)
    cutoff = float(kernel.radius_scale * np.asarray(scene.h).max())
    mcap, kcap = nbmod.estimate_capacities(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        cutoff, dim)
    cfg = nbmod.default_config(dim, cutoff, scene.n, max_neighbors=kcap,
                               max_per_cell=mcap)

    @jax.jit
    def run(scene):
        nbrs = nbmod.build_neighbors(scene.x, scene.y, scene.z,
                                     scene.active, cfg)
        mask = scene.active
        return boundary_identification(scene, nbrs, kernel, mask, mask)

    normal, isb = run(scene)
    return np.asarray(normal), np.asarray(isb)
