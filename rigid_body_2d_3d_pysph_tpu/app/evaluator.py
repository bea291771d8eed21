"""One-shot op evaluation outside the solver loop.

Replaces PySPH's ``SPHEvaluator`` (reference usage: boundary
identification at setup, ``code/rigid_body_3d.py:866-871``, and the
template trick in the benchmark-5 apps).  ``evaluate_once`` builds a
neighbor list for the scene's current positions and runs a user function
``fn(scene, nbrs, kernel) -> dict-of-fields`` once, returning the
updated scene — the general form of the reference's
``SPHEvaluator(arrays, equations).evaluate()``.
"""

from __future__ import annotations

import numpy as np

import jax

from ..ops import neighbors as nbmod
from ..ops.kernels import get_kernel
from ..state.scene import Scene


def evaluate_once(scene: Scene, fn, kernel_name: str = "quintic",
                  dim: int | None = None,
                  cfg: nbmod.NeighborConfig | None = None) -> Scene:
    dim = dim or scene.meta.dim
    kernel = get_kernel(kernel_name, dim)
    if cfg is None:
        cutoff = float(kernel.radius_scale * np.asarray(scene.h).max())
        m, k = nbmod.estimate_capacities(
            np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
            cutoff, dim)
        cfg = nbmod.default_config(dim, cutoff, scene.n, max_neighbors=k,
                                   max_per_cell=m)

    @jax.jit
    def run(scene):
        nbrs = nbmod.build_neighbors(scene.x, scene.y, scene.z,
                                     scene.active, cfg)
        return fn(scene, nbrs, kernel)

    updates = run(scene)
    return scene.replace(**updates) if isinstance(updates, dict) else updates
