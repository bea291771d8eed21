"""Weakly-compressible SPH fluid ops: continuity, EDAC pressure
evolution, Tait EOS, artificial viscosity, pressure-gradient momentum,
Adami wall BC, XSPH, and the two-way FSI coupling forces.

Re-design of the fluid side of ``code/rigid_fluid_coupling.py``:

* ``ContinuityEquation``      :67-80   / ``ContinuityEquationFSI`` :83-97
* ``EDACEquation``            :489-519 / ``EDACEquationFSI``       :522-552
* ``SolidWallPressureBCFSI``  :100-134 and ``ClampWallPressure[FSI]``
  :51-64
* ``MomentumEquationPressureGradient`` :137-160 (+ ``...Boundary``
  :163-175) and ``ForceOnFluidDuetoRigidBody`` :178-193
* ``ForceOnRigidBodyDuetoFluid`` :196-225 (Akinci/Liu coupling force)

plus the PySPH library equations the reference imports as-is
(``rigid_fluid_coupling.py:639-647``): ``TaitEOS``,
``MomentumEquationArtificialViscosity``, ``SetWallVelocity``,
``SolidWallPressureBC``, ``XSPHCorrection``.

Pair conventions as PySPH: XIJ = x_i - x_j, VIJ = v_i - v_j,
HIJ = (h_i+h_j)/2, EPS = 0.01 HIJ^2.
"""

from __future__ import annotations

import jax.numpy as jnp

from .kernels import Kernel
from .neighbors import NeighborList
from .pairs import pair_data, masked_sum


def _dw_vec(kernel, pd):
    s = kernel.gradw_scalar(pd.rij, pd.hij)
    return s * pd.xij, s * pd.yij, s * pd.zij


def _vij(scene, j):
    return (scene.u[:, None] - scene.u[j],
            scene.v[:, None] - scene.v[j],
            scene.w[:, None] - scene.w[j])


def continuity(scene, nbrs: NeighborList, kernel: Kernel, dest_mask,
               src_mask, fsi: bool = False):
    """arho_i = sum_j rho_i (m_j / rho_j) (vij . gradW); the FSI variant
    reads the source's shadow fluid mass/density (``m_fsi/rho_fsi``,
    reference :93-97)."""
    pd = pair_data(scene, nbrs)
    j = pd.j
    gate = pd.mask & dest_mask[:, None] & src_mask[j]
    dwx, dwy, dwz = _dw_vec(kernel, pd)
    uij, vij, wij = _vij(scene, j)
    vdotdw = uij * dwx + vij * dwy + wij * dwz
    if fsi:
        fac = scene.rho[:, None] * scene.m_fsi[j] / scene.rho_fsi[j]
    else:
        fac = scene.rho[:, None] * scene.m[j] / scene.rho[j]
    return masked_sum(fac * vdotdw, gate)


def edac(scene, nbrs: NeighborList, kernel: Kernel, nu: float, c0_ref: float,
         dest_mask, src_mask, fsi: bool = False):
    """EDAC pressure rate (reference :489-552): advective term
    (continuity x cs^2) + viscous pressure damping."""
    pd = pair_data(scene, nbrs)
    j = pd.j
    gate = pd.mask & dest_mask[:, None] & src_mask[j]
    dwx, dwy, dwz = _dw_vec(kernel, pd)
    uij, vij, wij = _vij(scene, j)
    vdotdw = uij * dwx + vij * dwy + wij * dwz
    xdotdw = pd.xij * dwx + pd.yij * dwy + pd.zij * dwz

    rhoi = scene.rho[:, None]
    if fsi:
        mj = scene.m_fsi[j]
        rhoj = scene.rho_fsi[j]
        pj = scene.p_fsi[j]
    else:
        mj = scene.m[j]
        rhoj = scene.rho[j]
        pj = scene.p[j]
    cs2 = c0_ref * c0_ref
    ap = masked_sum(rhoi / rhoj * cs2 * mj * vdotdw, gate)

    Vi = scene.m[:, None] / rhoi
    Vj = mj / rhoj
    etaij = 2.0 * nu * (rhoi * rhoj) / (rhoi + rhoj)
    eps = 0.01 * pd.hij * pd.hij
    tmp = (1.0 / scene.m[:, None]) * (Vi * Vi + Vj * Vj) * etaij * xdotdw / (
        pd.rij * pd.rij + eps)
    ap = ap + masked_sum(tmp * (scene.p[:, None] - pj), gate)
    return ap


def tait_eos(scene, rho0: float, c0: float, gamma: float, dest_mask):
    """p = (c0^2 rho0/gamma) ((rho/rho0)^gamma - 1); cs updated too
    (PySPH ``TaitEOS``, imported at reference :639)."""
    ratio = scene.rho / rho0
    B = c0 * c0 * rho0 / gamma
    p = B * (ratio**gamma - 1.0)
    cs = c0 * ratio ** (0.5 * (gamma - 1.0))
    return (jnp.where(dest_mask, p, scene.p),
            jnp.where(dest_mask, cs, scene.cs))


def set_wall_velocity(scene, nbrs: NeighborList, kernel: Kernel, dest_mask,
                      fluid_mask):
    """Adami ghost velocities (PySPH ``SetWallVelocity``): Shepard-average
    the fluid velocity at wall particles, extrapolate ug = 2 u_wall - uf.
    Returns (uf, vf, wf, ug, vg, wg, wij_sum)."""
    pd = pair_data(scene, nbrs)
    j = pd.j
    gate = pd.mask & dest_mask[:, None] & fluid_mask[j]
    wij = kernel.w(pd.rij, pd.hij)
    sw = masked_sum(jnp.where(gate, wij, 0.0), gate)
    uf = masked_sum(scene.u[j] * wij, gate)
    vf = masked_sum(scene.v[j] * wij, gate)
    wf = masked_sum(scene.w[j] * wij, gate)
    has = sw > 1e-12
    inv = jnp.where(has, 1.0 / jnp.maximum(sw, 1e-300), 0.0)
    uf, vf, wf = uf * inv, vf * inv, wf * inv
    ug = 2.0 * scene.u - uf
    vg = 2.0 * scene.v - vf
    wg = 2.0 * scene.w - wf
    return uf, vf, wf, ug, vg, wg, sw


def solid_wall_pressure_bc(scene, nbrs: NeighborList, kernel: Kernel,
                           gx, gy, gz, dest_mask, fluid_mask, wij_sum,
                           clamp: bool):
    """Adami pressure extrapolation onto wall/body surface particles
    (PySPH ``SolidWallPressureBC`` / reference ``SolidWallPressureBCFSI``
    :100-134): p_w = sum_j [p_j + rho_j (g - a_w).xij] W / sum_j W.

    Wall acceleration a_w is taken from the dest's au/av/aw fields (zero
    for static walls).  ``clamp`` applies ``ClampWallPressure`` (:51-56).
    """
    pd = pair_data(scene, nbrs)
    j = pd.j
    gate = pd.mask & dest_mask[:, None] & fluid_mask[j]
    wij = kernel.w(pd.rij, pd.hij)
    gdotx = ((gx - scene.au[:, None]) * pd.xij
             + (gy - scene.av[:, None]) * pd.yij
             + (gz - scene.aw[:, None]) * pd.zij)
    num = masked_sum((scene.p[j] + scene.rho[j] * gdotx) * wij, gate)
    has = wij_sum > 1e-14
    p = jnp.where(has, num / jnp.where(has, wij_sum, 1.0), num)
    if clamp:
        p = jnp.maximum(p, 0.0)
    return p


def momentum_pressure_gradient(scene, nbrs: NeighborList, kernel: Kernel,
                               dest_mask, src_mask):
    """au_i += - m_j (p_i/rho_i^2 + p_j/rho_j^2) gradW (reference
    :137-160; the gravity initialization is applied by the scheme)."""
    pd = pair_data(scene, nbrs)
    j = pd.j
    gate = pd.mask & dest_mask[:, None] & src_mask[j]
    dwx, dwy, dwz = _dw_vec(kernel, pd)
    pij = (scene.p[:, None] / scene.rho[:, None] ** 2
           + scene.p[j] / scene.rho[j] ** 2)
    tmp = -scene.m[j] * pij
    return (masked_sum(tmp * dwx, gate), masked_sum(tmp * dwy, gate),
            masked_sum(tmp * dwz, gate))


def momentum_artificial_viscosity(scene, nbrs: NeighborList, kernel: Kernel,
                                  alpha: float, c0: float, dest_mask,
                                  src_mask):
    """Monaghan artificial viscosity (PySPH
    ``MomentumEquationArtificialViscosity``, imported at reference
    :640-642): only for approaching pairs (vij.xij < 0)."""
    pd = pair_data(scene, nbrs)
    j = pd.j
    gate = pd.mask & dest_mask[:, None] & src_mask[j]
    dwx, dwy, dwz = _dw_vec(kernel, pd)
    uij, vij, wij = _vij(scene, j)
    vdotx = uij * pd.xij + vij * pd.yij + wij * pd.zij
    eps = 0.01 * pd.hij * pd.hij
    muij = pd.hij * vdotx / (pd.rij * pd.rij + eps)
    rhoij1 = 2.0 / (scene.rho[:, None] + scene.rho[j])
    piij = jnp.where(vdotx < 0, -alpha * c0 * muij * scene.m[j] * rhoij1, 0.0)
    return (masked_sum(-piij * dwx, gate), masked_sum(-piij * dwy, gate),
            masked_sum(-piij * dwz, gate))


def force_on_fluid_due_to_rigid_body(scene, nbrs: NeighborList,
                                     kernel: Kernel, dest_mask, rigid_mask):
    """au_i += - m_fsi_j (p_i/rho_i^2 + p_fsi_j/rho_fsi_j^2) gradW
    (reference :178-193)."""
    pd = pair_data(scene, nbrs)
    j = pd.j
    gate = pd.mask & dest_mask[:, None] & rigid_mask[j]
    dwx, dwy, dwz = _dw_vec(kernel, pd)
    pij = (scene.p[:, None] / scene.rho[:, None] ** 2
           + scene.p_fsi[j] / scene.rho_fsi[j] ** 2)
    tmp = -scene.m_fsi[j] * pij
    return (masked_sum(tmp * dwx, gate), masked_sum(tmp * dwy, gate),
            masked_sum(tmp * dwz, gate))


def force_on_rigid_body_due_to_fluid(scene, nbrs: NeighborList,
                                     kernel: Kernel, dest_mask, fluid_mask):
    """f_i -= m_fsi_i m_j (p_j/rho_j^2 + p_fsi_i/rho_fsi_i^2) gradW
    (Akinci [1] + Liu [2] coupling, reference :196-225)."""
    pd = pair_data(scene, nbrs)
    j = pd.j
    gate = pd.mask & dest_mask[:, None] & fluid_mask[j]
    dwx, dwy, dwz = _dw_vec(kernel, pd)
    t1 = (scene.p[j] / scene.rho[j] ** 2
          + scene.p_fsi[:, None] / scene.rho_fsi[:, None] ** 2)
    fac = -scene.m_fsi[:, None] * scene.m[j] * t1
    return (masked_sum(fac * dwx, gate), masked_sum(fac * dwy, gate),
            masked_sum(fac * dwz, gate))


def xsph_correction(scene, nbrs: NeighborList, kernel: Kernel, eps: float,
                    dest_mask, src_mask):
    """XSPH velocity smoothing (PySPH ``XSPHCorrection``, imported but not
    wired by the reference scheme; provided as an optional op):
    dx_i/dt = u_i - eps sum_j m_j/rho_ij_bar vij W."""
    pd = pair_data(scene, nbrs)
    j = pd.j
    gate = pd.mask & dest_mask[:, None] & src_mask[j]
    wij = kernel.w(pd.rij, pd.hij)
    uij, vij, wvij = _vij(scene, j)
    fac = eps * scene.m[j] * 2.0 / (scene.rho[:, None] + scene.rho[j]) * wij
    return (-masked_sum(fac * uij, gate), -masked_sum(fac * vij, gate),
            -masked_sum(fac * wvij, gate))
