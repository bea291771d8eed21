"""Free-surface / boundary-particle identification.

Vectorized re-design of the reference's boundary pipeline
(``code/boundary_particles.py``): the three-group one-shot evaluation
assembled by ``get_boundary_identification_etvf_equations`` (:190-216)

1. ``ComputeNormals``  — raw SPH normals  n_tmp_i = sum_j -(m_j/rho_j) DWIJ
   (PySPH ``pysph.sph.isph.wall_normal.ComputeNormals``; the repo carries
   an identical copy as ``ComputeNormalsEDAC`` :71-111, including the
   ``|n| > 0.25/h`` acceptance threshold),
2. ``SmoothNormals`` — n_i = sum_j (m_j/rho_j) W_ij n_tmp_j, normalized if
   ``|n| > 1e-3`` (repo copy ``SmoothNormalsEDAC`` :114-135),
3. ``IdentifyBoundaryParticleCosAngle`` (:22-68) — a particle with a
   surviving normal is interior if any neighbor with
   ``1e-9 h < rij < 2 h`` lies within the 60-degree cone behind the
   normal (``-n . xij / rij > 0.5``).

In the reference this runs once at setup through a Cython
``SPHEvaluator`` (``code/rigid_body_3d.py:866-871``); here it is three
masked [N, K] reductions, jittable and reusable at runtime.
"""

from __future__ import annotations

import jax.numpy as jnp

from .kernels import Kernel
from .neighbors import NeighborList
from .pairs import pair_data, masked_sum


def compute_normals(scene, nbrs: NeighborList, kernel: Kernel, dest_mask,
                    src_mask):
    """Raw SPH normals -> ``normal_tmp`` [N,3]."""
    pd = pair_data(scene, nbrs)
    j = pd.j
    gate = pd.mask & dest_mask[:, None] & src_mask[j]
    fac = -(scene.m[j] / scene.rho[j]) * kernel.gradw_scalar(pd.rij, pd.hij)
    nx = masked_sum(fac * pd.xij, gate)
    ny = masked_sum(fac * pd.yij, gate)
    nz = masked_sum(fac * pd.zij, gate)
    mag = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    keep = mag > 0.25 / scene.h
    inv = jnp.where(keep, 1.0 / jnp.maximum(mag, 1e-300), 0.0)
    normal_tmp = jnp.stack([nx * inv, ny * inv, nz * inv], axis=-1)
    return normal_tmp


def smooth_normals(scene, nbrs: NeighborList, kernel: Kernel, normal_tmp,
                   dest_mask, src_mask):
    """Kernel-smoothed normals -> ``normal`` [N,3]."""
    pd = pair_data(scene, nbrs)
    j = pd.j
    gate = pd.mask & dest_mask[:, None] & src_mask[j]
    fac = (scene.m[j] / scene.rho[j]) * kernel.w(pd.rij, pd.hij)
    n = jnp.stack(
        [
            masked_sum(fac * normal_tmp[j, 0], gate),
            masked_sum(fac * normal_tmp[j, 1], gate),
            masked_sum(fac * normal_tmp[j, 2], gate),
        ],
        axis=-1,
    )
    mag = jnp.linalg.norm(n, axis=-1)
    keep = mag > 1e-3
    inv = jnp.where(keep, 1.0 / jnp.maximum(mag, 1e-300), 0.0)
    return n * inv[:, None]


def identify_boundary_cos_angle(scene, nbrs: NeighborList, normal, dest_mask,
                                src_mask):
    """Surface flag -> ``is_boundary`` [N] int32 (1 = on free surface)."""
    pd = pair_data(scene, nbrs)
    j = pd.j
    norm2 = jnp.sum(normal * normal, axis=-1)
    candidate = norm2 > 1e-6
    h_i = scene.h[:, None]
    in_range = (pd.rij > 1e-9 * h_i) & (pd.rij < 2.0 * h_i)
    gate = pd.mask & dest_mask[:, None] & src_mask[j] & in_range
    dot = -(
        normal[:, None, 0] * pd.xij
        + normal[:, None, 1] * pd.yij
        + normal[:, None, 2] * pd.zij
    )
    fac = jnp.where(gate, dot / jnp.maximum(pd.rij, 1e-300), -jnp.inf)
    interior = jnp.any(fac > 0.5, axis=1)
    return (candidate & dest_mask & ~interior).astype(jnp.int32)


def boundary_identification(scene, nbrs: NeighborList, kernel: Kernel,
                            dest_mask, src_mask=None):
    """Full 3-stage pipeline; returns (normal [N,3], is_boundary [N]).

    As in the reference's usage, sources default to the destination group
    itself (``get_boundary_identification_etvf_equations([pa.name],
    [pa.name])``)."""
    if src_mask is None:
        src_mask = dest_mask
    ntmp = compute_normals(scene, nbrs, kernel, dest_mask, src_mask)
    n = smooth_normals(scene, nbrs, kernel, ntmp, dest_mask, src_mask)
    isb = identify_boundary_cos_angle(scene, nbrs, n, dest_mask, src_mask)
    return n, isb
