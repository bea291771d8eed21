"""ctypes bindings for the native C++ reference engine (``csrc/``).

Builds on first import if the shared object is missing (g++ -O3).  The
native engine is an independent implementation of the contact physics
used as a cross-validation oracle (tests) and host fallback — the
counterpart of the reference's PySPH-generated C loops.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(os.path.dirname(_HERE))
_SRC = os.path.join(_ROOT, "csrc", "rbnative.cpp")
_SO = os.path.join(_HERE, "_rbnative.so")

_lib = None


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    d = ctypes.POINTER(ctypes.c_double)
    i32 = ctypes.POINTER(ctypes.c_int32)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.rb_neighbor_counts.argtypes = [d, d, d, ctypes.c_int,
                                       ctypes.c_double, i32]
    lib.rb_contact_eval.argtypes = (
        [d] * 9 + [i32, i32, u8, d]
        + [ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double]
        + [d] + [ctypes.c_double] * 4
        + [d] * 6 + [d] * 4 + [d] * 3
    )
    lib.rb_gtvf_step_n.argtypes = (
        [d] * 9 + [i32, i32, u8] + [d] * 4
        + [ctypes.c_int] * 4 + [ctypes.c_double] + [ctypes.c_int]
        + [d] * 12          # body state arrays + eta
        + [ctypes.c_double] * 6   # kr kf fric gx gy gz
        + [ctypes.c_double, ctypes.c_int]  # dt, n_steps
        + [d] * 6 + [d] * 4 + [d] * 3
    )
    lib.rb_dem_lvc_step_n.argtypes = (
        [d] * 9                    # x..w, wx..wz
        + [d] * 3 + [i32, u8]      # m, moi, rad_s, dem_id, mobile
        + [d] * 4                  # per-entity kn, kt, alpha, mu
        + [ctypes.c_int] + [ctypes.c_double] * 3   # n, gx, gy, gz
        + [ctypes.c_double, ctypes.c_int, ctypes.c_int]  # dt, steps, L
        + [i32, i32] + [d] * 3     # contact table
        + [d] * 6                  # force/torque accumulators
    )
    _lib = lib
    return _lib


def _p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _pi(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _pu(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def neighbor_counts(x, y, z, cutoff: float) -> np.ndarray:
    lib = get_lib()
    x = np.ascontiguousarray(x, np.float64)
    y = np.ascontiguousarray(y, np.float64)
    z = np.ascontiguousarray(z, np.float64)
    out = np.zeros(len(x), np.int32)
    lib.rb_neighbor_counts(_p(x), _p(y), _p(z), len(x), cutoff, _pi(out))
    return out


def contact_eval(scene_arrays: dict, S: int, dim: int, spacing0: float,
                 eta: np.ndarray, kr: float, kf: float, fric_coeff: float,
                 dt: float, delta_lt=None, fn_prev=None):
    """One contact-pipeline evaluation; returns dict of results.

    ``scene_arrays`` needs keys x y z u v w m rho h dem_id body_id
    is_rigid contact_force_is_boundary (numpy, length n).
    """
    lib = get_lib()
    n = len(scene_arrays["x"])
    a = {k: np.ascontiguousarray(scene_arrays[k], np.float64)
         for k in ("x", "y", "z", "u", "v", "w", "m", "rho", "h",
                   "contact_force_is_boundary")}
    dem = np.ascontiguousarray(scene_arrays["dem_id"], np.int32)
    bid = np.ascontiguousarray(
        np.clip(scene_arrays["body_id"], 0, None), np.int32)
    rig = np.ascontiguousarray(scene_arrays["is_rigid"], np.uint8)
    eta = np.ascontiguousarray(eta, np.float64)

    z2 = lambda: np.zeros((n, S), np.float64)
    dlx, dly, dlz = ((np.ascontiguousarray(delta_lt[i], np.float64).copy()
                      for i in range(3)) if delta_lt is not None
                     else (z2(), z2(), z2()))
    fnx, fny, fnz = ((np.ascontiguousarray(fn_prev[i], np.float64).copy()
                      for i in range(3)) if fn_prev is not None
                     else (z2(), z2(), z2()))
    cfx, cfy, cfz, dist = z2(), z2(), z2(), z2()
    fx = np.zeros(n)
    fy = np.zeros(n)
    fz = np.zeros(n)

    lib.rb_contact_eval(
        _p(a["x"]), _p(a["y"]), _p(a["z"]),
        _p(a["u"]), _p(a["v"]), _p(a["w"]),
        _p(a["m"]), _p(a["rho"]), _p(a["h"]),
        _pi(dem), _pi(bid), _pu(rig), _p(a["contact_force_is_boundary"]),
        n, S, dim, spacing0, _p(eta), kr, kf, fric_coeff, dt,
        _p(dlx), _p(dly), _p(dlz), _p(fnx), _p(fny), _p(fnz),
        _p(cfx), _p(cfy), _p(cfz), _p(dist),
        _p(fx), _p(fy), _p(fz))
    return dict(cfn_x=cfx, cfn_y=cfy, cfn_z=cfz, dist=dist,
                delta_lt=(dlx, dly, dlz), fn=(fnx, fny, fnz),
                fx=fx, fy=fy, fz=fz)


def gtvf_step_n(scene, kr: float, kf: float, fric_coeff: float,
                gx: float, gy: float, gz: float, dt: float, n_steps: int,
                two_d: bool):
    """Full GTVF rigid trajectory in the native engine: ``n_steps`` of
    the complete scheme (kick -> contact eval -> drift -> kick) with
    persistent contact-slot state, f64.  Takes a framework Scene;
    returns a dict of the final particle/body state."""
    lib = get_lib()
    n = scene.n
    S = scene.meta.total_no_bodies
    B = scene.meta.nb
    dim = scene.meta.dim

    f = lambda k: np.ascontiguousarray(np.asarray(scene[k]), np.float64).copy()
    a = {k: f(k) for k in ("x", "y", "z", "u", "v", "w", "m", "rho", "h",
                           "contact_force_is_boundary",
                           "dx0", "dy0", "dz0")}
    dem = np.ascontiguousarray(np.asarray(scene.dem_id), np.int32)
    bid = np.ascontiguousarray(
        np.clip(np.asarray(scene.body_id), 0, None), np.int32)
    rig = np.ascontiguousarray(np.asarray(scene.is_rigid), np.uint8)

    bf = lambda k: np.ascontiguousarray(
        np.asarray(scene[k]), np.float64).copy()
    total_mass = bf("total_mass")
    xcm, vcm = bf("xcm"), bf("vcm")
    R = bf("R").reshape(B, 9).copy()
    ang_mom, omega = bf("ang_mom"), bf("omega")
    izz = (bf("izz") if "izz" in scene else np.ones(B))
    iib = bf("inertia_tensor_inverse_body_frame").reshape(B, 9).copy()
    iig = bf("inertia_tensor_inverse_global_frame").reshape(B, 9).copy()
    force, torque = bf("force"), bf("torque")
    eta = bf("eta")

    s2 = lambda k: np.ascontiguousarray(
        np.asarray(scene[k]), np.float64).copy()
    dlx, dly, dlz = s2("delta_lt_x"), s2("delta_lt_y"), s2("delta_lt_z")
    fnx, fny, fnz = s2("fn_x"), s2("fn_y"), s2("fn_z")
    z2 = lambda: np.zeros((n, S), np.float64)
    cfx, cfy, cfz, dist = z2(), z2(), z2(), z2()
    fx, fy, fz = np.zeros(n), np.zeros(n), np.zeros(n)

    lib.rb_gtvf_step_n(
        _p(a["x"]), _p(a["y"]), _p(a["z"]),
        _p(a["u"]), _p(a["v"]), _p(a["w"]),
        _p(a["m"]), _p(a["rho"]), _p(a["h"]),
        _pi(dem), _pi(bid), _pu(rig),
        _p(a["contact_force_is_boundary"]),
        _p(a["dx0"]), _p(a["dy0"]), _p(a["dz0"]),
        n, S, dim, int(two_d), float(scene.meta.spacing0), B,
        _p(total_mass), _p(xcm), _p(vcm), _p(R),
        _p(ang_mom), _p(omega), _p(izz), _p(iib), _p(iig),
        _p(force), _p(torque), _p(eta),
        kr, kf, fric_coeff, gx, gy, gz, dt, int(n_steps),
        _p(dlx), _p(dly), _p(dlz), _p(fnx), _p(fny), _p(fnz),
        _p(cfx), _p(cfy), _p(cfz), _p(dist),
        _p(fx), _p(fy), _p(fz))
    return dict(x=a["x"], y=a["y"], z=a["z"], u=a["u"], v=a["v"],
                w=a["w"], xcm=xcm, vcm=vcm, R=R.reshape(B, 3, 3),
                omega=omega, ang_mom=ang_mom, force=force, torque=torque,
                fx=fx, fy=fy, fz=fz,
                delta_lt=(dlx, dly, dlz), fn=(fnx, fny, fnz))


def dem_lvc_step_n(scene, mobile, gx: float, gy: float, gz: float,
                   dt: float, n_steps: int):
    """Full DEM LVC trajectory in the native engine: ``n_steps`` of the
    velocity-Verlet scheme (half-kick -> prune -> LVC force -> drift ->
    half-kick) with the persistent [n, L] tangential-spring table, f64.
    Takes a framework Scene (+ the mobile mask the scheme derives from
    its granular groups); returns a dict of the final state."""
    lib = get_lib()
    n = scene.n
    L = scene.tng_idx.shape[1]

    f = lambda k: np.ascontiguousarray(np.asarray(scene[k]),
                                       np.float64).copy()
    a = {k: f(k) for k in ("x", "y", "z", "u", "v", "w",
                           "wx", "wy", "wz", "m", "moi", "rad_s",
                           "fx", "fy", "fz", "torx", "tory", "torz",
                           "dem_kn", "dem_kt", "dem_alpha", "dem_mu")}
    dem = np.ascontiguousarray(np.asarray(scene.dem_id), np.int32)
    mob = np.ascontiguousarray(np.asarray(mobile), np.uint8)
    ti = np.ascontiguousarray(np.asarray(scene.tng_idx), np.int32).copy()
    td = np.ascontiguousarray(np.asarray(scene.tng_idx_dem_id),
                              np.int32).copy()
    ta, tb, tc = (f("tng_x"), f("tng_y"), f("tng_z"))

    lib.rb_dem_lvc_step_n(
        _p(a["x"]), _p(a["y"]), _p(a["z"]),
        _p(a["u"]), _p(a["v"]), _p(a["w"]),
        _p(a["wx"]), _p(a["wy"]), _p(a["wz"]),
        _p(a["m"]), _p(a["moi"]), _p(a["rad_s"]), _pi(dem), _pu(mob),
        _p(a["dem_kn"]), _p(a["dem_kt"]), _p(a["dem_alpha"]),
        _p(a["dem_mu"]),
        n, float(gx), float(gy), float(gz), float(dt), int(n_steps),
        int(L), _pi(ti), _pi(td), _p(ta), _p(tb), _p(tc),
        _p(a["fx"]), _p(a["fy"]), _p(a["fz"]),
        _p(a["torx"]), _p(a["tory"]), _p(a["torz"]))
    return dict(x=a["x"], y=a["y"], z=a["z"], u=a["u"], v=a["v"],
                w=a["w"], wx=a["wx"], wy=a["wy"], wz=a["wz"],
                fx=a["fx"], fy=a["fy"], fz=a["fz"],
                torx=a["torx"], tory=a["tory"], torz=a["torz"],
                tng_idx=ti, tng_dem=td, tng=(ta, tb, tc))
