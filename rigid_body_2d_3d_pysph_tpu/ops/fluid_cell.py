"""WCSPH/EDAC/FSI fluid pipeline on the dense cell-block engine.

Physics identical to ``ops.fluid`` (reference equations cited there);
layout identical to ``ops.contact_cell``.  The coupling scheme's pair
work maps to three cell passes per step:

  pass R (stage-1 rates):   arho + ap  (fluid <- fluid+boundary+rigid,
                            with FSI shadow fields for rigid sources)
  pass W (wall BC):         Shepard sums for wall/body ghost velocity +
                            pressure extrapolation numerators
  pass F (momentum + FSI):  fluid au/av/aw (pressure gradient +
                            artificial viscosity + rigid->fluid term) and
                            the fluid->rigid coupling force

Pass W must complete (and p / p_fsi update) before pass F — the pressure
gradient reads wall pressures; that matches the reference's group order
(``rigid_fluid_coupling.py:691-743``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .cellpairs import (CellGrid, CellGridConfig, gather_source_block,
                        map_over_cells, pack_fields, unpack)
from .kernels import Kernel

_BIG = 1.0e9

# f32 pack layout for fluid passes
(_FX, _FY, _FZ, _FU, _FV, _FW, _FM, _FRHO, _FH, _FP,
 _FMFSI, _FRHOFSI, _FPFSI) = range(13)
_F_SENT = [_BIG, _BIG, _BIG, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.0,
           0.0, 1.0, 0.0]
(_IFLUID, _IBDRY, _IRIGID) = range(3)
_I_SENT = [0, 0, 0]


def pack_fluid_scene(scene, grid: CellGrid, cfg: CellGridConfig):
    f = pack_fields(grid, cfg,
                    [scene.x, scene.y, scene.z, scene.u, scene.v, scene.w,
                     scene.m, scene.rho, scene.h, scene.p,
                     scene.m_fsi, scene.rho_fsi, scene.p_fsi],
                    _F_SENT)
    i = pack_fields(grid, cfg,
                    [scene.is_fluid.astype(jnp.int32),
                     scene.is_static_boundary.astype(jnp.int32),
                     scene.is_rigid.astype(jnp.int32)],
                    _I_SENT)
    return f, i


def _geom(qf, sf):
    C, O, M, F = sf.shape
    s = sf.reshape(C, 1, O * M, F)
    q = qf[:, :, None, :]
    xij = q[..., _FX] - s[..., _FX]
    yij = q[..., _FY] - s[..., _FY]
    zij = q[..., _FZ] - s[..., _FZ]
    r2 = xij * xij + yij * yij + zij * zij
    rij = jnp.sqrt(r2)
    hij = 0.5 * (q[..., _FH] + s[..., _FH])
    return s, q, xij, yij, zij, rij, r2, hij


def fluid_rates_cell(scene, grid, cfg: CellGridConfig, kernel: Kernel,
                     df, di, nu_edac: float, c0: float, edac: bool,
                     has_rigid: bool, dense: bool = False):
    """Pass R: (arho, ap) per particle, original order.  ``dense=True``
    returns the raw per-lane [NC, M] pair instead (fused kdkf step)."""

    def block(start, qf, qi, nbrs):
        sf = gather_source_block(df, nbrs, cfg, _F_SENT)
        si = gather_source_block(di, nbrs, cfg, _I_SENT)
        s, q, xij, yij, zij, rij, r2, hij = _geom(qf, sf)
        C, O, M, F = sf.shape
        sii = si.reshape(C, 1, O * M, si.shape[-1])
        in_range = rij <= cfg.radius
        dest_fluid = qi[:, :, None, _IFLUID] == 1
        src_flbd = (sii[..., _IFLUID] == 1) | (sii[..., _IBDRY] == 1)
        src_rigid = sii[..., _IRIGID] == 1

        dw = kernel.gradw_scalar(rij, hij)
        dwx, dwy, dwz = dw * xij, dw * yij, dw * zij
        uij = q[..., _FU] - s[..., _FU]
        vij = q[..., _FV] - s[..., _FV]
        wij_v = q[..., _FW] - s[..., _FW]
        vdotdw = uij * dwx + vij * dwy + wij_v * dwz
        xdotdw = xij * dwx + yij * dwy + zij * dwz
        eps = 0.01 * hij * hij
        cs2 = c0 * c0
        rhoi = q[..., _FRHO]
        pi = q[..., _FP]
        mi = q[..., _FM]

        def rates(mj, rhoj, pj, gate):
            g = gate & dest_fluid & in_range
            arho = jnp.sum(jnp.where(g, rhoi * mj / rhoj * vdotdw, 0.0), -1)
            if not edac:
                return arho, jnp.zeros_like(arho)
            ap1 = rhoi / rhoj * cs2 * mj * vdotdw
            Vi = mi / rhoi
            Vj = mj / rhoj
            etaij = 2.0 * nu_edac * (rhoi * rhoj) / (rhoi + rhoj)
            tmp = (1.0 / jnp.maximum(mi, 1e-300)) * (Vi * Vi + Vj * Vj) \
                * etaij * xdotdw / (r2 + eps)
            ap = jnp.sum(jnp.where(g, ap1 + tmp * (pi - pj), 0.0), -1)
            return arho, ap

        arho, ap = rates(s[..., _FM], s[..., _FRHO], s[..., _FP], src_flbd)
        if has_rigid:
            a2, p2 = rates(s[..., _FMFSI], s[..., _FRHOFSI],
                           s[..., _FPFSI], src_rigid)
            arho, ap = arho + a2, ap + p2
        return arho, ap

    arho_d, ap_d = map_over_cells(cfg, block, df, di, grid.nbr_slots)
    if dense:
        return arho_d, ap_d
    n = scene.n
    return (unpack(grid, cfg, arho_d, n), unpack(grid, cfg, ap_d, n))


def wall_bc_cell(scene, grid, cfg: CellGridConfig, kernel: Kernel, df, di,
                 gx: float, gy: float, gz: float, dense: bool = False):
    """Pass W: Shepard sums against fluid sources for wall/body dests.
    Returns per-particle (uf, vf, wf, wij_sum, p_num): ghost-velocity
    numerators, kernel sum, and the Adami pressure numerator (dest wall
    acceleration is zero for static walls and for the reference's body
    path, ``SolidWallPressureBCFSI`` reads d_au of the body which the
    scheme leaves at the fluid-only values — zero for non-fluid)."""

    def block(start, qf, qi, nbrs):
        sf = gather_source_block(df, nbrs, cfg, _F_SENT)
        si = gather_source_block(di, nbrs, cfg, _I_SENT)
        s, q, xij, yij, zij, rij, r2, hij = _geom(qf, sf)
        C, O, M, F = sf.shape
        sii = si.reshape(C, 1, O * M, si.shape[-1])
        dest_solid = (qi[:, :, None, _IBDRY] == 1) | \
                     (qi[:, :, None, _IRIGID] == 1)
        g = dest_solid & (sii[..., _IFLUID] == 1) & (rij <= cfg.radius)
        w = jnp.where(g, kernel.w(rij, hij), 0.0)
        uf = jnp.sum(s[..., _FU] * w, -1)
        vf = jnp.sum(s[..., _FV] * w, -1)
        wf = jnp.sum(s[..., _FW] * w, -1)
        sw = jnp.sum(w, -1)
        gdotx = gx * xij + gy * yij + gz * zij
        p_num = jnp.sum((s[..., _FP] + s[..., _FRHO] * gdotx) * w, -1)
        return uf, vf, wf, sw, p_num

    outs = map_over_cells(cfg, block, df, di, grid.nbr_slots)
    if dense:
        return outs
    n = scene.n
    return tuple(unpack(grid, cfg, o, n) for o in outs)


def fluid_forces_cell(scene, grid, cfg: CellGridConfig, kernel: Kernel,
                      df, di, p_dense, pfsi_dense, fluid_alpha: float,
                      c0: float, has_rigid: bool, dense: bool = False):
    """Pass F: fluid accelerations (pressure gradient + artificial
    viscosity + rigid->fluid FSI) and the fluid->rigid coupling force.

    ``p_dense`` / ``pfsi_dense`` are the POST-wall-BC pressures packed
    densely ([NC, M]); they override the stale columns in ``df``.
    """

    def block(start, qf, qi, qp, qpfsi, nbrs):
        sf = gather_source_block(df, nbrs, cfg, _F_SENT)
        si = gather_source_block(di, nbrs, cfg, _I_SENT)
        sp = gather_source_block(p_dense[..., None], nbrs, cfg, 0.0)
        spfsi = gather_source_block(pfsi_dense[..., None], nbrs, cfg, 0.0)
        s, q, xij, yij, zij, rij, r2, hij = _geom(qf, sf)
        C, O, M, F = sf.shape
        sii = si.reshape(C, 1, O * M, si.shape[-1])
        spj = sp.reshape(C, 1, O * M)
        spfsij = spfsi.reshape(C, 1, O * M)
        in_range = rij <= cfg.radius

        dest_fluid = qi[:, :, None, _IFLUID] == 1
        dest_rigid = qi[:, :, None, _IRIGID] == 1
        src_fluid = sii[..., _IFLUID] == 1
        src_flbd = src_fluid | (sii[..., _IBDRY] == 1)
        src_rigid = sii[..., _IRIGID] == 1

        dw = kernel.gradw_scalar(rij, hij)
        dwx, dwy, dwz = dw * xij, dw * yij, dw * zij
        rhoi = q[..., _FRHO]
        rhoj = s[..., _FRHO]
        pi = qp[:, :, None]
        pj = spj
        mi = q[..., _FM]
        mj = s[..., _FM]

        # pressure gradient (fluid <- fluid+boundary)
        g_pg = dest_fluid & src_flbd & in_range
        pij = pi / (rhoi * rhoi) + pj / (rhoj * rhoj)
        t = jnp.where(g_pg, -mj * pij, 0.0)
        au = jnp.sum(t * dwx, -1)
        av = jnp.sum(t * dwy, -1)
        aw = jnp.sum(t * dwz, -1)

        # artificial viscosity (fluid <- fluid)
        if abs(fluid_alpha) > 1e-14:
            uij = q[..., _FU] - s[..., _FU]
            vij = q[..., _FV] - s[..., _FV]
            wij_v = q[..., _FW] - s[..., _FW]
            vdotx = uij * xij + vij * yij + wij_v * zij
            eps = 0.01 * hij * hij
            muij = hij * vdotx / (r2 + eps)
            rhoij1 = 2.0 / (rhoi + rhoj)
            piij = jnp.where(
                (vdotx < 0) & dest_fluid & src_fluid & in_range,
                -fluid_alpha * c0 * muij * mj * rhoij1, 0.0)
            au = au + jnp.sum(-piij * dwx, -1)
            av = av + jnp.sum(-piij * dwy, -1)
            aw = aw + jnp.sum(-piij * dwz, -1)

        fx = jnp.zeros_like(au)
        fy = jnp.zeros_like(au)
        fz = jnp.zeros_like(au)
        if has_rigid:
            # rigid -> fluid (uses source FSI shadow state)
            g_rf = dest_fluid & src_rigid & in_range
            pij2 = pi / (rhoi * rhoi) + spfsij / (s[..., _FRHOFSI] ** 2)
            t2 = jnp.where(g_rf, -s[..., _FMFSI] * pij2, 0.0)
            au = au + jnp.sum(t2 * dwx, -1)
            av = av + jnp.sum(t2 * dwy, -1)
            aw = aw + jnp.sum(t2 * dwz, -1)

            # fluid -> rigid force (dest body particles)
            g_fr = dest_rigid & src_fluid & in_range
            mfsi_i = q[..., _FMFSI]
            rhofsi_i = q[..., _FRHOFSI]
            pfsi_i = qpfsi[:, :, None]
            t1 = pj / (rhoj * rhoj) + pfsi_i / jnp.maximum(
                rhofsi_i * rhofsi_i, 1e-300)
            fac = jnp.where(g_fr, -mfsi_i * mj * t1, 0.0)
            fx = jnp.sum(fac * dwx, -1)
            fy = jnp.sum(fac * dwy, -1)
            fz = jnp.sum(fac * dwz, -1)
        return au, av, aw, fx, fy, fz

    outs = map_over_cells(cfg, block, df, di, p_dense, pfsi_dense,
                          grid.nbr_slots)
    if dense:
        return outs
    n = scene.n
    return tuple(unpack(grid, cfg, o, n) for o in outs)
