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
