"""Granular DEM (Luding LVC) on the dense cell-block engine.

The [N, K] neighbor-list DEM path (``ops.dem``) is fine at reference
problem sizes (``code/dem.py:595-828``) but ~30x off the dense engine at
10^5+ grains (per-element gathers).  This wrapper evaluates the SAME
physics — :func:`ops.dem.lvc_displacement_core` is shared verbatim — on
the cell layout: candidates come from the grid's stencil blocks (zero
per-element gathers), and the per-particle tangential contact table
rides along as a dense ``[NC, M, L]`` array (queries own their table, so
chunked evaluation composes).

Equivalence with the [N, K] engine is covered by
tests/test_dem_cell.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .cellpairs import (CellGrid, CellGridConfig, gather_source_block,
                        map_over_cells, pack_fields, pack_rows, unpack)
from .dem import lvc_displacement_core, lvc_force_core, _material_rows

_BIG = 1.0e9

# packed f32 field order
(_DX, _DY, _DZ, _DU, _DV, _DW, _DWX, _DWY, _DWZ, _DRAD, _DM) = range(11)
_F_SENT = [_BIG, _BIG, _BIG, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
# packed i32: dem id, global particle index
_I_SENT = [-1, -1]


def lvc_force_cell(scene, grid: CellGrid, cfg: CellGridConfig, dt,
                   kn: float, mu: float, en: float,
                   tng_idx, tng_dem, tng_fx, tng_fy, tng_fz):
    """Dense-cell evaluation of the LVC FORCE-spring model (reference
    ``code/dem.py:296-592``; scalar material constants) — same
    signature/returns as :func:`ops.dem.lvc_force`, same
    :func:`ops.dem.lvc_force_core` physics, candidates from the grid's
    stencil blocks like :func:`lvc_displacement_cell`."""
    return _lvc_cell(scene, grid, cfg, dt,
                     tng_idx, tng_dem, tng_fx, tng_fy, tng_fz,
                     force_consts=(kn, mu, en))


def lvc_displacement_cell(scene, grid: CellGrid, cfg: CellGridConfig, dt,
                          tng_idx, tng_dem, tng_x, tng_y, tng_z):
    """Dense-cell evaluation of the LVC displacement model.

    Same signature/returns as :func:`ops.dem.lvc_displacement` —
    per-particle force/torque [N] and the updated [N, L] contact table.
    """
    return _lvc_cell(scene, grid, cfg, dt,
                     tng_idx, tng_dem, tng_x, tng_y, tng_z,
                     force_consts=None)


def _lvc_cell(scene, grid: CellGrid, cfg: CellGridConfig, dt,
              tng_idx, tng_dem, tng_x, tng_y, tng_z, force_consts):
    n = scene.n
    fdt = scene.x.dtype
    L = tng_idx.shape[1]

    df = pack_fields(
        grid, cfg,
        [scene.x, scene.y, scene.z, scene.u, scene.v, scene.w,
         scene.wx, scene.wy, scene.wz, scene.rad_s, scene.m],
        _F_SENT)
    # particle identity: persistent global ids when present (the slab
    # path's contact tables must survive ghost-row renumbering and
    # redistribution), else the row index
    ident = (scene.gid.astype(jnp.int32) if "gid" in scene
             else jnp.arange(n, dtype=jnp.int32))
    di = pack_fields(grid, cfg, [scene.dem_id, ident], _I_SENT)
    # query-side tables in dense order
    t_idx_d = pack_rows(grid, cfg, tng_idx, -1).astype(jnp.int32)
    t_dem_d = pack_rows(grid, cfg, tng_dem, -1).astype(jnp.int32)
    t_x_d = pack_rows(grid, cfg, tng_x, 0.0)
    t_y_d = pack_rows(grid, cfg, tng_y, 0.0)
    t_z_d = pack_rows(grid, cfg, tng_z, 0.0)

    if force_consts is None:
        kn_t, kt_t = scene.dem_kn, scene.dem_kt
        al_t, mu_t = scene.dem_alpha, scene.dem_mu
    else:
        kn_t = kt_t = al_t = mu_t = None

    def block(start, qf, qi, ti, td, ta, tb, tc, nbrs):
        sf = gather_source_block(df, nbrs, cfg, _F_SENT)
        si = gather_source_block(di, nbrs, cfg, _I_SENT)
        C, O, M, F = sf.shape
        R = C * M
        K = O * M
        sfr = sf.reshape(C, 1, O * M, F)
        q = {k: qf[:, :, None, i].reshape(R, 1)
             for k, i in (("u", _DU), ("v", _DV), ("w", _DW),
                          ("wx", _DWX), ("wy", _DWY), ("wz", _DWZ),
                          ("rad", _DRAD), ("m", _DM))}
        qx = qf[:, :, None, _DX].reshape(R, 1)
        qy = qf[:, :, None, _DY].reshape(R, 1)
        qz = qf[:, :, None, _DZ].reshape(R, 1)

        def s_of(i):
            return jnp.broadcast_to(sfr[..., i], (C, M, K)).reshape(R, K)

        s = {k: s_of(i)
             for k, i in (("u", _DU), ("v", _DV), ("w", _DW),
                          ("wx", _DWX), ("wy", _DWY), ("wz", _DWZ),
                          ("rad", _DRAD), ("m", _DM))}
        sx, sy, sz = s_of(_DX), s_of(_DY), s_of(_DZ)
        xij, yij, zij = qx - sx, qy - sy, qz - sz
        rij = jnp.sqrt(xij * xij + yij * yij + zij * zij)

        sir = si.reshape(C, 1, O * M, si.shape[-1])
        j = jnp.broadcast_to(sir[..., 1], (C, M, K)).reshape(R, K)
        dem_j = jnp.broadcast_to(sir[..., 0], (C, M, K)).reshape(R, K)
        q_idx = qi[:, :, None, 1].reshape(R, 1)
        cand = (j >= 0) & (j != q_idx) & (rij <= cfg.radius)

        if force_consts is not None:
            kn_c, mu_c, en_c = force_consts
            out = lvc_force_core(
                q, s, xij, yij, zij, rij, cand & (rij > 0), j, dem_j,
                dt, kn_c, mu_c, en_c,
                ti.reshape(R, L), td.reshape(R, L),
                ta.reshape(R, L), tb.reshape(R, L), tc.reshape(R, L))
        else:
            out = lvc_displacement_core(
                q, s, xij, yij, zij, rij, cand, j, dem_j, dt,
                _material_rows(dem_j, kn_t), _material_rows(dem_j, kt_t),
                _material_rows(dem_j, al_t), _material_rows(dem_j, mu_t),
                ti.reshape(R, L), td.reshape(R, L),
                ta.reshape(R, L), tb.reshape(R, L), tc.reshape(R, L))
        (fx, fy, fz, tqx, tqy, tqz, ti2, td2, ta2, tb2, tc2, cnt) = out
        resh = lambda a: a.reshape(C, M, *a.shape[1:])
        return (resh(jnp.stack([fx, fy, fz, tqx, tqy, tqz,
                                cnt.astype(fx.dtype)], -1)),
                resh(ti2), resh(td2), resh(ta2), resh(tb2), resh(tc2))

    sums_d, ti_d, td_d, ta_d, tb_d, tc_d = map_over_cells(
        cfg, block, df, di, t_idx_d, t_dem_d, t_x_d, t_y_d, t_z_d,
        grid.nbr_slots)

    sums = unpack(grid, cfg, sums_d, n, 0.0)
    tng_idx = unpack(grid, cfg, ti_d, n, -1)
    tng_dem = unpack(grid, cfg, td_d, n, -1)
    tng_x = unpack(grid, cfg, ta_d, n, 0.0)
    tng_y = unpack(grid, cfg, tb_d, n, 0.0)
    tng_z = unpack(grid, cfg, tc_d, n, 0.0)
    count = sums[:, 6].astype(jnp.int32)
    return (sums[:, 0], sums[:, 1], sums[:, 2],
            sums[:, 3], sums[:, 4], sums[:, 5],
            tng_idx, tng_dem, tng_x, tng_y, tng_z, count)
