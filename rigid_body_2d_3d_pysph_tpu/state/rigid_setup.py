"""Host-side rigid-body setup math.

Mirrors the one-time setup utilities of the reference
(``code/rigid_body_common.py``):

* ``set_total_mass``                      (:21)
* ``set_center_of_mass``                  (:29)
* ``set_moment_of_inertia_izz``           (:38)
* ``set_moment_of_inertia_and_its_inverse`` (:46)
* ``set_body_frame_position_vectors``     (:97)
* ``set_body_frame_normal_vectors``       (:110)
* ``setup_damping_coefficient``           (:206)

These run once on the host in float64 (like the reference's numpy code)
and are then cast to the working dtype.  Body state is shaped
(``[B,3]``, ``[B,3,3]``) instead of the reference's flat ``[3B]``/``[9B]``
constants.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import config
from .scene import Scene

M_PI = math.pi


def compute_body_masses(x, y, z, m, body_id, nb):
    """Per-body total mass and center of mass (reference :21-35)."""
    total_mass = np.zeros(nb)
    xcm = np.zeros((nb, 3))
    np.add.at(total_mass, body_id, m)
    np.add.at(xcm[:, 0], body_id, m * x)
    np.add.at(xcm[:, 1], body_id, m * y)
    np.add.at(xcm[:, 2], body_id, m * z)
    assert (total_mass > 0).all(), "Total mass has to be greater than zero"
    xcm /= total_mass[:, None]
    return total_mass, xcm


def compute_inertia_tensors(x, y, z, m, body_id, xcm, nb):
    """3x3 inertia tensor per body + inverse (reference :46-94)."""
    dx = x - xcm[body_id, 0]
    dy = y - xcm[body_id, 1]
    dz = z - xcm[body_id, 2]
    I = np.zeros((nb, 3, 3))
    np.add.at(I[:, 0, 0], body_id, m * (dy**2 + dz**2))
    np.add.at(I[:, 1, 1], body_id, m * (dx**2 + dz**2))
    np.add.at(I[:, 2, 2], body_id, m * (dx**2 + dy**2))
    np.add.at(I[:, 0, 1], body_id, -m * dx * dy)
    np.add.at(I[:, 0, 2], body_id, -m * dx * dz)
    np.add.at(I[:, 1, 2], body_id, -m * dy * dz)
    I[:, 1, 0] = I[:, 0, 1]
    I[:, 2, 0] = I[:, 0, 2]
    I[:, 2, 1] = I[:, 1, 2]
    I_inv = np.linalg.inv(I)
    return I, I_inv


def compute_izz(x, y, m, body_id, xcm, nb):
    """2D scalar moment of inertia (reference :38-43)."""
    dx = x - xcm[body_id, 0]
    dy = y - xcm[body_id, 1]
    izz = np.zeros(nb)
    np.add.at(izz, body_id, m * (dx**2 + dy**2))
    return izz


def compute_eta(coeff_of_rest: np.ndarray, slot_mask: np.ndarray) -> np.ndarray:
    """Restitution -> damping factor matrix (reference :206-241).

    ``eta[i, k] = -2 ln(e_ik) / sqrt(ln^2 e_ik + pi^2)`` for every contact
    slot k that corresponds to an actual rigid body or boundary dem
    entity.  NOTE: the reference implementation intentionally drops the
    ``m_star`` factor here (commented out at :227-228 and :238-239) and
    re-applies mass scaling at force time
    (``ComputeContactForce.post_loop``, :925-926).  The repo's own stale
    unit tests for the *boundary* branch still include ``m_star``; we
    match the implementation, which is what every benchmark actually
    runs.
    """
    coeff = np.asarray(coeff_of_rest, dtype=np.float64)
    with np.errstate(divide="ignore"):
        t1 = np.log(coeff)
    t2 = t1**2 + M_PI**2
    eta = -2.0 * t1 * np.sqrt(1.0 / t2)
    eta = np.where(np.asarray(slot_mask, bool)[None, :], eta, 0.0)
    return eta


def setup_body_state(
    scene: Scene,
    coeff_of_rest: np.ndarray | None = None,
) -> Scene:
    """Attach all per-body state + body-frame vectors to the scene.

    Mirrors ``RigidBody3DScheme.setup_properties``
    (``code/rigid_body_3d.py:729-886``): constants dict at :781-828,
    dem-id bookkeeping at :833-841, then the set_* calls at :844-855.
    """
    fdt = config.float_dtype()
    meta = scene.meta
    nb, S = meta.nb, meta.total_no_bodies

    x = np.asarray(scene.x, np.float64)
    y = np.asarray(scene.y, np.float64)
    z = np.asarray(scene.z, np.float64)
    m = np.asarray(scene.m, np.float64)
    body_id = np.asarray(scene.body_id)
    is_rigid = np.asarray(scene.is_rigid)

    bid = np.where(is_rigid, body_id, 0)
    mr = np.where(is_rigid, m, 0.0)

    total_mass, xcm = compute_body_masses(x, y, z, mr, bid, nb)
    # COM of only-rigid particles: recompute masking non-rigid to body 0 with
    # zero mass keeps sums exact.
    I, I_inv = _inertia_with_safe_inverse(
        x[is_rigid], y[is_rigid], z[is_rigid], m[is_rigid],
        body_id[is_rigid], xcm, nb,
    )
    izz = compute_izz(x[is_rigid], y[is_rigid], m[is_rigid], body_id[is_rigid], xcm, nb)

    # body-frame position vectors (reference :97-107)
    dx0 = np.where(is_rigid, x - xcm[bid, 0], 0.0)
    dy0 = np.where(is_rigid, y - xcm[bid, 1], 0.0)
    dz0 = np.where(is_rigid, z - xcm[bid, 2], 0.0)

    # which contact slots are real dem entities (rigid body or boundary)
    dem = np.asarray(scene.dem_id)
    slot_mask = np.zeros(S, bool)
    slot_mask[np.unique(dem)] = True

    if coeff_of_rest is None:
        coeff_of_rest = np.ones((nb, S))
    eta = compute_eta(coeff_of_rest, slot_mask)

    eye = np.broadcast_to(np.eye(3), (nb, 3, 3)).copy()
    fields = dict(
        dx0=jnp.asarray(dx0, fdt),
        dy0=jnp.asarray(dy0, fdt),
        dz0=jnp.asarray(dz0, fdt),
        fx=jnp.zeros(scene.n, fdt),
        fy=jnp.zeros(scene.n, fdt),
        fz=jnp.zeros(scene.n, fdt),
        total_mass=jnp.asarray(total_mass, fdt),
        xcm=jnp.asarray(xcm, fdt),
        xcm0=jnp.asarray(xcm, fdt),
        R=jnp.asarray(eye, fdt),
        R0=jnp.asarray(eye, fdt),
        izz=jnp.asarray(izz, fdt),
        inertia_tensor_body_frame=jnp.asarray(I, fdt),
        inertia_tensor_inverse_body_frame=jnp.asarray(I_inv, fdt),
        inertia_tensor_global_frame=jnp.asarray(I, fdt),
        inertia_tensor_inverse_global_frame=jnp.asarray(I_inv, fdt),
        force=jnp.zeros((nb, 3), fdt),
        torque=jnp.zeros((nb, 3), fdt),
        vcm=jnp.zeros((nb, 3), fdt),
        vcm0=jnp.zeros((nb, 3), fdt),
        ang_mom=jnp.zeros((nb, 3), fdt),
        ang_mom0=jnp.zeros((nb, 3), fdt),
        omega=jnp.zeros((nb, 3), fdt),
        omega0=jnp.zeros((nb, 3), fdt),
        eta=jnp.asarray(eta, fdt),
        coeff_of_rest=jnp.asarray(coeff_of_rest, fdt),
    )
    return scene.with_fields(**fields)


def _inertia_with_safe_inverse(x, y, z, m, body_id, xcm, nb):
    """Inertia tensors + inverse.  The reference inverts directly
    (``rigid_body_common.py:85``); planar lattices are non-singular there
    too (Izz = Ixx + Iyy > 0), but a degenerate (collinear) body would
    blow up — guard by regularizing exactly-zero diagonal entries so the
    inverse acts as identity along the degenerate axes."""
    dx = x - xcm[body_id, 0]
    dy = y - xcm[body_id, 1]
    dz = z - xcm[body_id, 2]
    I = np.zeros((nb, 3, 3))
    np.add.at(I[:, 0, 0], body_id, m * (dy**2 + dz**2))
    np.add.at(I[:, 1, 1], body_id, m * (dx**2 + dz**2))
    np.add.at(I[:, 2, 2], body_id, m * (dx**2 + dy**2))
    np.add.at(I[:, 0, 1], body_id, -m * dx * dy)
    np.add.at(I[:, 0, 2], body_id, -m * dx * dz)
    np.add.at(I[:, 1, 2], body_id, -m * dy * dz)
    I[:, 1, 0] = I[:, 0, 1]
    I[:, 2, 0] = I[:, 0, 2]
    I[:, 2, 1] = I[:, 1, 2]
    I_inv = np.zeros_like(I)
    for b in range(nb):
        Ib = I[b]
        if abs(np.linalg.det(Ib)) < 1e-300:
            Ib = Ib.copy()
            for d in range(3):
                if Ib[d, d] == 0.0:
                    Ib[d, d] = 1.0
        I_inv[b] = np.linalg.inv(Ib)
    return I, I_inv


def set_linear_velocity(scene: Scene, linear_vel: np.ndarray) -> Scene:
    """Reference ``RigidBody3DScheme.set_linear_velocity``
    (``code/rigid_body_3d.py:928-931``): sets vcm (length 3*nb flat or
    [nb,3]) then refreshes particle velocities."""
    v = np.asarray(linear_vel, np.float64).reshape(-1, 3)
    if v.shape[0] == 1 and scene.meta.nb > 1:
        v = np.broadcast_to(v, (scene.meta.nb, 3))
    scene = scene.replace(vcm=jnp.asarray(v, config.float_dtype()))
    return _set_particle_velocities(scene)


def set_angular_velocity(scene: Scene, angular_vel: np.ndarray) -> Scene:
    """Reference :933-946: sets omega, ang_mom = I_global @ omega, then
    refreshes particle velocities."""
    w = np.asarray(angular_vel, np.float64).reshape(-1, 3)
    if w.shape[0] == 1 and scene.meta.nb > 1:
        w = np.broadcast_to(w, (scene.meta.nb, 3))
    I_g = np.asarray(scene.inertia_tensor_global_frame, np.float64)
    ang_mom = np.einsum("bij,bj->bi", I_g, w)
    fdt = config.float_dtype()
    scene = scene.replace(
        omega=jnp.asarray(w, fdt), ang_mom=jnp.asarray(ang_mom, fdt)
    )
    return _set_particle_velocities(scene)


def _set_particle_velocities(scene: Scene) -> Scene:
    """u = vcm + omega x (R @ dr0), per particle (reference :905-926)."""
    R = np.asarray(scene.R, np.float64)
    vcm = np.asarray(scene.vcm, np.float64)
    om = np.asarray(scene.omega, np.float64)
    bid = np.where(np.asarray(scene.is_rigid), np.asarray(scene.body_id), 0)
    dr0 = np.stack(
        [np.asarray(scene.dx0), np.asarray(scene.dy0), np.asarray(scene.dz0)], -1
    ).astype(np.float64)
    dr = np.einsum("nij,nj->ni", R[bid], dr0)
    vel = vcm[bid] + np.cross(om[bid], dr)
    is_r = np.asarray(scene.is_rigid)
    fdt = config.float_dtype()
    u = np.where(is_r, vel[:, 0], np.asarray(scene.u, np.float64))
    v = np.where(is_r, vel[:, 1], np.asarray(scene.v, np.float64))
    w = np.where(is_r, vel[:, 2], np.asarray(scene.w, np.float64))
    return scene.replace(
        u=jnp.asarray(u, fdt), v=jnp.asarray(v, fdt), w=jnp.asarray(w, fdt)
    )
