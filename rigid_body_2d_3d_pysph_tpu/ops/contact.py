"""Rigid-rigid / rigid-wall contact forces (Mofidi et al., Materials 2022
Eqs. 21/22/24, plus the Canelas 2016 Hertzian pair model).

Re-design of the reference pipeline (``code/rigid_body_common.py``):

* ``ComputeContactForceNormals``                  :631-723  (Eq. 22)
* ``ComputeContactForceDistanceAndClosestPoint``  :726-836  (Eq. 21)
* ``ComputeContactForce``                         :839-1032 (Eq. 24)
* ``RigidBodyCanelasRigidRigid`` / ``...RigidWall`` :244-628 (dormant in
  the reference's schemes; provided for API completeness)

Slot layout: each rigid particle owns ``S = total_no_bodies`` contact
slots indexed by the *source dem entity id* — the exact strided contract
of the reference (``t2 = d_idx * total_no_bodies + s_dem_id``, :685).
Persistent per-slot state across steps: tangential spring ``delta_lt_*``
and last normal force ``fn_*`` (the reference re-uses the stale ``fn``
when relative motion is ~zero, :931-1012 — reproduced here).

Known reference quirks reproduced or sanitized (documented for parity):

* After any slot update with tangential motion the spring is reset to the
  *unit* tangent (``:998-1007`` divides the spring by its own length), so
  tangential force is usually Coulomb-saturated.  We reproduce this.
* When the tangential direction degenerates (``ti_magn <= 1e-12``) the
  reference divides 0/0 and stores NaN in the spring, recovering a step
  later through C ``fmin`` NaN semantics.  We store 0 instead (the
  intended value); trajectories agree to tolerance.
* The reference writes the viewer-only ``ti_*`` output at a mis-indexed
  slot (``:967-969`` uses ``d_idx`` instead of the slot); we store it at
  the correct slot.
"""

from __future__ import annotations

import jax.numpy as jnp

from .kernels import Kernel
from .neighbors import NeighborList
from .pairs import (pair_data, scatter_to_slots, scatter_min_to_slots,
                    argmin_to_slots)


def _contact_gate(scene, pd):
    """Common pair gate: rigid destination, source flagged as a contact
    surface, different dem entity, non-fluid source (reference sources =
    rigid_bodies + boundaries, ``code/rigid_body_3d.py:655-667``)."""
    j = pd.j
    return (
        pd.mask
        & scene.is_rigid[:, None]
        & (scene.contact_force_is_boundary[j] == 1.0)
        & (scene.dem_id[:, None] != scene.dem_id[j])
        & ~scene.is_fluid[j]
    )


def contact_force_normals(scene, nbrs: NeighborList, kernel: Kernel):
    """Eq. 22: per-(particle, source-entity) SPH-averaged contact normal.

    Returns (cfn_x, cfn_y, cfn_z, wij_norm) each [N, S].
    """
    S = scene.meta.total_no_bodies
    pd = pair_data(scene, nbrs)
    j = pd.j
    gate = _contact_gate(scene, pd)
    wij = kernel.w(pd.rij, pd.hij)
    rinv = 1.0 / jnp.maximum(pd.rij, 1e-300)
    tmp = scene.m[:, None] / scene.rho[:, None] * rinv * wij
    slot = scene.dem_id[j]

    sx = scatter_to_slots(pd.xij * tmp, slot, gate, S)
    sy = scatter_to_slots(pd.yij * tmp, slot, gate, S)
    sz = scatter_to_slots(pd.zij * tmp, slot, gate, S)
    # tmp * RIJ == (m/rho) W
    sw = scatter_to_slots(tmp * pd.rij, slot, gate, S)

    has = sw > 1e-12
    inv_w = jnp.where(has, 1.0 / jnp.maximum(sw, 1e-300), 0.0)
    mx, my, mz = sx * inv_w, sy * inv_w, sz * inv_w
    mag = jnp.sqrt(mx * mx + my * my + mz * mz)
    inv_m = jnp.where(has & (mag > 0), 1.0 / jnp.maximum(mag, 1e-300), 0.0)
    return mx * inv_m, my * inv_m, mz * inv_m, sw


def contact_force_distance(scene, nbrs: NeighborList, kernel: Kernel,
                           cfn_x, cfn_y, cfn_z):
    """Eq. 21: SPH-mean penetration distance along the slot normal, plus
    closest source particle tracking.

    Returns dict with contact_force_dist [N,S], closest_point distance,
    and the closest source particle's position/velocity per slot.
    """
    S = scene.meta.total_no_bodies
    init_dist = 4.0 * scene.meta.spacing0
    pd = pair_data(scene, nbrs)
    j = pd.j
    gate = _contact_gate(scene, pd)
    wij = kernel.w(pd.rij, pd.hij)
    tmp = scene.m[:, None] / scene.rho[:, None] * wij
    slot = scene.dem_id[j]
    rows = jnp.broadcast_to(jnp.arange(scene.n)[:, None], slot.shape)

    # projection of xij on the slot's normal (gather normal per pair)
    n_x = cfn_x[rows, slot]
    n_y = cfn_y[rows, slot]
    n_z = cfn_z[rows, slot]
    proj = n_x * pd.xij + n_y * pd.yij + n_z * pd.zij

    dist_tmp = scatter_to_slots(proj * tmp, slot, gate, S)
    w_sum = scatter_to_slots(tmp, slot, gate, S)
    has = w_sum > 1e-12
    dist = jnp.where(has, dist_tmp / jnp.where(has, w_sum, 1.0), 0.0)

    # closest source particle per slot (strict < init; ties resolve to
    # the first candidate in neighbor order, matching the reference's
    # sequential scan :811-818)
    min_d, arg_k, found = argmin_to_slots(pd.rij, slot, gate, S, init_dist)
    src = jnp.take_along_axis(j, jnp.clip(arg_k, 0, j.shape[1] - 1),
                              axis=1)  # [N, S]
    src = jnp.clip(src, 0, scene.n - 1)

    def pick(field):
        return jnp.where(found, field[src], 0.0)

    return dict(
        contact_force_dist=dist,
        closest_point_dist_to_source=min_d,
        x_source=pick(scene.x),
        y_source=pick(scene.y),
        z_source=pick(scene.z),
        vx_source=pick(scene.u),
        vy_source=pick(scene.v),
        vz_source=pick(scene.w),
    )


def contact_force(scene, dt, kr: float, kf: float, fric_coeff: float,
                  cfn_x, cfn_y, cfn_z, dist_info,
                  delta_lt_x, delta_lt_y, delta_lt_z,
                  fn_x_prev, fn_y_prev, fn_z_prev):
    """Eq. 24: normal spring-dashpot + Coulomb-capped tangential spring,
    evaluated as an [N, S] slot map (reference ``post_loop`` :858-1032).

    Returns (force increments fx,fy,fz [N]) and the new slot state.
    """
    return contact_force_core(
        scene.u, scene.v, scene.w, scene.m, scene.body_id, scene.eta,
        scene.meta.nb, scene.meta.spacing0, dt, kr, kf, fric_coeff,
        cfn_x, cfn_y, cfn_z, dist_info,
        delta_lt_x, delta_lt_y, delta_lt_z,
        fn_x_prev, fn_y_prev, fn_z_prev)


def contact_force_core(u, v, w, m, body_id, eta_body, nb: int,
                       spacing0: float, dt, kr: float, kf: float,
                       fric_coeff: float,
                       cfn_x, cfn_y, cfn_z, dist_info,
                       delta_lt_x, delta_lt_y, delta_lt_z,
                       fn_x_prev, fn_y_prev, fn_z_prev):
    """Eq. 24 on explicit per-destination arrays ([L] vectors + [L, S]
    slot maps) — shared bit-for-bit by the full [N]-wide path and the
    compacted interesting-lane path (``models.rigid_body.
    rigid_contact_force_eval_compact``), which calls it with L =
    NI_max*M lanes instead of all N particles."""
    dist = dist_info["contact_force_dist"]
    overlap = spacing0 - dist
    engaged = (overlap > 0.0) & (dist != 0.0)  # `overlap != spacing0` guard

    # relative velocity vs the closest source particle
    vij_x = u[:, None] - dist_info["vx_source"]
    vij_y = v[:, None] - dist_info["vy_source"]
    vij_z = w[:, None] - dist_info["vz_source"]
    vij_dot_n = vij_x * cfn_x + vij_y * cfn_y + vij_z * cfn_z

    # damping: eta[body_id(i), slot] * sqrt(m_i/2 * kr)   (:920-933)
    from .rigid import gather_body_rows
    bid = jnp.clip(body_id, 0, nb - 1)
    eta = (gather_body_rows(eta_body, bid, nb)
           * jnp.sqrt(m[:, None] / 2.0 * kr))

    tmp = kr * overlap
    fn_nx = (tmp - eta * vij_dot_n) * cfn_x
    fn_ny = (tmp - eta * vij_dot_n) * cfn_y
    fn_nz = (tmp - eta * vij_dot_n) * cfn_z

    vij_magn = jnp.sqrt(vij_x**2 + vij_y**2 + vij_z**2)
    moving = vij_magn >= 1e-12

    # tangential direction
    tx = vij_x - cfn_x * vij_dot_n
    ty = vij_y - cfn_y * vij_dot_n
    tz = vij_z - cfn_z * vij_dot_n
    ti_magn = jnp.sqrt(tx * tx + ty * ty + tz * tz)
    has_t = ti_magn > 1e-12
    inv_t = jnp.where(has_t, 1.0 / jnp.maximum(ti_magn, 1e-300), 0.0)
    ti_x, ti_y, ti_z = tx * inv_t, ty * inv_t, tz * inv_t

    # grow the spring, project onto the tangent (:972-982)
    dls_x = delta_lt_x + vij_x * dt
    dls_y = delta_lt_y + vij_y * dt
    dls_z = delta_lt_z + vij_z * dt
    dl_dot_t = dls_x * ti_x + dls_y * ti_y + dls_z * ti_z
    new_dl_x = dl_dot_t * ti_x
    new_dl_y = dl_dot_t * ti_y
    new_dl_z = dl_dot_t * ti_z

    ft_magn = jnp.sqrt((kf * new_dl_x) ** 2 + (kf * new_dl_y) ** 2
                       + (kf * new_dl_z) ** 2)
    fn_magn = jnp.sqrt(fn_nx**2 + fn_ny**2 + fn_nz**2)
    ft_star = jnp.minimum(fric_coeff * fn_magn, ft_magn)
    ft_nx = -ft_star * ti_x
    ft_ny = -ft_star * ti_y
    ft_nz = -ft_star * ti_z

    # spring reset to unit tangent (:998-1007); 0 where degenerate
    reset_ok = ft_star > 0.0
    dl_after_x = jnp.where(reset_ok, ti_x, 0.0)
    dl_after_y = jnp.where(reset_ok, ti_y, 0.0)
    dl_after_z = jnp.where(reset_ok, ti_z, 0.0)

    em = engaged & moving
    sel = lambda mv, st: jnp.where(engaged, jnp.where(moving, mv, st), 0.0)

    out = dict(
        overlap=jnp.where(engaged, overlap, 0.0),
        ft_x=jnp.where(em, ft_nx, 0.0),
        ft_y=jnp.where(em, ft_ny, 0.0),
        ft_z=jnp.where(em, ft_nz, 0.0),
        # stale fn reused when not moving (:1010-1012 only in else-branch)
        fn_x=sel(fn_nx, fn_x_prev),
        fn_y=sel(fn_ny, fn_y_prev),
        fn_z=sel(fn_nz, fn_z_prev),
        delta_lt_x=sel(dl_after_x, 0.0),
        delta_lt_y=sel(dl_after_y, 0.0),
        delta_lt_z=sel(dl_after_z, 0.0),
        ti_x=jnp.where(em, ti_x, 0.0),
        ti_y=jnp.where(em, ti_y, 0.0),
        ti_z=jnp.where(em, ti_z, 0.0),
    )
    dfx = jnp.sum(out["fn_x"] + out["ft_x"], axis=1)
    dfy = jnp.sum(out["fn_y"] + out["ft_y"], axis=1)
    dfz = jnp.sum(out["fn_z"] + out["ft_z"], axis=1)
    return dfx, dfy, dfz, out


# ---------------------------------------------------------------------------
# Canelas 2016 SPH-DCDEM Hertzian pair forces (reference :244-628; present
# but unused by the reference's schemes — the tangential history blocks are
# fully commented out there, so the live physics is the normal force only).
# ---------------------------------------------------------------------------

def canelas_pair_force(scene, nbrs: NeighborList, Cn: float = 1.4e-5,
                       wall_mode: bool = False):
    """Hertzian normal contact: F_n = kn delta^1.5 n - gamma_n (v.n) n with
    kn = 4/3 E* sqrt(r*), gamma_n = Cn sqrt(6 m* E* sqrt(r*)).

    ``wall_mode`` mirrors ``RigidBodyCanelasRigidWall`` (:436): effective
    mass/radius are the destination's own (:492-493) instead of the
    harmonic means (:300-301).  E and poisson ratio come from per-group
    constants gathered per particle at setup (fields ``E`` and
    ``poisson_ratio``).
    """
    pd = pair_data(scene, nbrs)
    j = pd.j
    gate = (
        pd.mask
        & scene.is_rigid[:, None]
        & (scene.dem_id[:, None] != scene.dem_id[j])
        & (pd.rij > 0)
        & ~scene.is_fluid[j]
    )
    overlap = scene.rad_s[:, None] + scene.rad_s[j] - pd.rij
    gate &= overlap > 0

    rinv = 1.0 / jnp.maximum(pd.rij, 1e-300)
    nx, ny, nz = pd.xij * rinv, pd.yij * rinv, pd.zij * rinv
    vr_x = scene.u[:, None] - scene.u[j]
    vr_y = scene.v[:, None] - scene.v[j]
    vr_z = scene.w[:, None] - scene.w[j]
    vr_dot_n = vr_x * nx + vr_y * ny + vr_z * nz

    E_i = scene.E[:, None]
    E_j = scene.E[j]
    nu_i = scene.poisson_ratio[:, None]
    nu_j = scene.poisson_ratio[j]
    E_eff = 1.0 / ((1 - nu_i**2) / E_i + (1 - nu_j**2) / E_j)

    bid = jnp.clip(scene.body_id, 0, scene.meta.nb - 1)
    m_i = scene.total_mass[bid][:, None]
    if wall_mode:
        m_eff = jnp.broadcast_to(m_i, pd.rij.shape)
        r_eff = jnp.broadcast_to(scene.rad_s[:, None], pd.rij.shape)
    else:
        bid_j = jnp.clip(scene.body_id[j], 0, scene.meta.nb - 1)
        m_j = scene.total_mass[bid_j]
        m_eff = m_i * m_j / (m_i + m_j)
        r_i = scene.rad_s[:, None]
        r_j = scene.rad_s[j]
        r_eff = r_i * r_j / (r_i + r_j)

    kn = 4.0 / 3.0 * E_eff * jnp.sqrt(r_eff)
    gamma_n = Cn * jnp.sqrt(6.0 * m_eff * E_eff * jnp.sqrt(r_eff))
    mag = kn * jnp.clip(overlap, 0.0, None) ** 1.5 - gamma_n * vr_dot_n

    fx = jnp.sum(jnp.where(gate, mag * nx, 0.0), axis=1)
    fy = jnp.sum(jnp.where(gate, mag * ny, 0.0), axis=1)
    fz = jnp.sum(jnp.where(gate, mag * nz, 0.0), axis=1)
    return fx, fy, fz
