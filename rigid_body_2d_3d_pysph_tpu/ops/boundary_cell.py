"""Boundary identification on the dense cell-block engine.

Same 3-stage pipeline as ``ops.boundary`` (reference
``code/boundary_particles.py``; thresholds documented there), evaluated
over cell blocks so setup scales to millions of particles (the [N, K]
formulation materializes O(N*K) pair arrays and OOMs at ~1M).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .cellpairs import (CellGrid, CellGridConfig, gather_source_block,
                        map_over_cells, pack_fields, pack_rows, unpack)
from .kernels import Kernel

_BIG = 1.0e9
# f32 fields: x y z m rho h groupmask
_BX, _BY, _BZ, _BM, _BRHO, _BH, _BGRP = range(7)
_SENT = [_BIG, _BIG, _BIG, 0.0, 1.0, 1.0, -1.0]


def _pack(scene, grid, cfg, group_sel):
    return pack_fields(grid, cfg,
                       [scene.x, scene.y, scene.z, scene.m, scene.rho,
                        scene.h, group_sel],
                       _SENT)


def _geom(qf, sf):
    C, O, M, F = sf.shape
    s = sf.reshape(C, 1, O * M, F)
    q = qf[:, :, None, :]
    xij = q[..., _BX] - s[..., _BX]
    yij = q[..., _BY] - s[..., _BY]
    zij = q[..., _BZ] - s[..., _BZ]
    rij = jnp.sqrt(xij**2 + yij**2 + zij**2)
    hij = 0.5 * (q[..., _BH] + s[..., _BH])
    return s, q, xij, yij, zij, rij, hij


def boundary_identification_cell(scene, grid: CellGrid,
                                 cfg: CellGridConfig, kernel: Kernel,
                                 group_sel):
    """(normal [N,3], is_boundary [N]) for particles with matching
    ``group_sel`` values (float group ids; each group identifies against
    itself, like the reference's per-array setup evaluation)."""
    df = _pack(scene, grid, cfg, group_sel)

    def same_group(q, s):
        return (q[..., _BGRP] == s[..., _BGRP]) & (q[..., _BGRP] >= 0)

    # --- stage 1: raw SPH normals ---
    def block_normals(start, qf, nbrs):
        sf = gather_source_block(df, nbrs, cfg, _SENT)
        s, q, xij, yij, zij, rij, hij = _geom(qf, sf)
        gate = same_group(q, s) & (rij <= cfg.radius)
        fac = jnp.where(gate,
                        -(s[..., _BM] / s[..., _BRHO])
                        * kernel.gradw_scalar(rij, hij), 0.0)
        return jnp.stack([jnp.sum(fac * xij, -1), jnp.sum(fac * yij, -1),
                          jnp.sum(fac * zij, -1)], -1)

    ntmp = map_over_cells(cfg, block_normals, df, grid.nbr_slots)
    # normalize with the 0.25/h acceptance (dense [NC, M, 3])
    h_d = df[..., _BH]
    mag = jnp.linalg.norm(ntmp, axis=-1)
    keep = mag > 0.25 / h_d
    inv = jnp.where(keep, 1.0 / jnp.maximum(mag, 1e-300), 0.0)
    ntmp = ntmp * inv[..., None]

    # --- stage 2: smooth ---
    def block_smooth(start, qf, nbrs):
        sf = gather_source_block(df, nbrs, cfg, _SENT)
        st = gather_source_block(ntmp, nbrs, cfg, 0.0)
        s, q, xij, yij, zij, rij, hij = _geom(qf, sf)
        C, O, M, F = sf.shape
        stf = st.reshape(C, 1, O * M, 3)
        gate = same_group(q, s) & (rij <= cfg.radius)
        fac = jnp.where(gate, (s[..., _BM] / s[..., _BRHO])
                        * kernel.w(rij, hij), 0.0)
        return jnp.stack([jnp.sum(fac * stf[..., 0], -1),
                          jnp.sum(fac * stf[..., 1], -1),
                          jnp.sum(fac * stf[..., 2], -1)], -1)

    nsm = map_over_cells(cfg, block_smooth, df, grid.nbr_slots)
    mag = jnp.linalg.norm(nsm, axis=-1)
    keep = mag > 1e-3
    inv = jnp.where(keep, 1.0 / jnp.maximum(mag, 1e-300), 0.0)
    nsm = nsm * inv[..., None]

    # --- stage 3: cos-angle interior filter ---
    def block_cos(start, qf, qn, nbrs):
        sf = gather_source_block(df, nbrs, cfg, _SENT)
        s, q, xij, yij, zij, rij, hij = _geom(qf, sf)
        h_i = qf[..., _BH][:, :, None]
        gate = (same_group(q, s) & (rij > 1e-9 * h_i)
                & (rij < 2.0 * h_i))
        dot = -(qn[..., 0][:, :, None] * xij
                + qn[..., 1][:, :, None] * yij
                + qn[..., 2][:, :, None] * zij)
        fac = jnp.where(gate, dot / jnp.maximum(rij, 1e-300), -jnp.inf)
        interior = jnp.any(fac > 0.5, axis=-1)
        return interior

    interior = map_over_cells(cfg, block_cos, df, nsm, grid.nbr_slots)
    norm2 = jnp.sum(nsm * nsm, -1)
    isb_d = ((norm2 > 1e-6) & ~interior & (df[..., _BGRP] >= 0)
             ).astype(jnp.int32)

    n = scene.n
    return (unpack(grid, cfg, nsm, n), unpack(grid, cfg, isb_d, n))
