"""ctypes bindings for the native C++ QP solver (native/qp.cpp).

Auto-builds the shared library with `make -C native` on first use if the
toolchain is available; callers treat availability as optional (the jitted
JAX solver in ops/qp.py is the primary path — this is the golden reference
and host fallback, mirroring the reference's quadprog dependency)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libclsurvey_qp.so")

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    dptr = ctypes.POINTER(ctypes.c_double)
    lib.solve_bound_qp.argtypes = [dptr, dptr, dptr, ctypes.c_int,
                                   ctypes.c_int, dptr]
    lib.solve_bound_qp.restype = ctypes.c_int
    lib.gem_project.argtypes = [dptr, dptr, ctypes.c_int, ctypes.c_int,
                                ctypes.c_double, ctypes.c_double, dptr]
    lib.gem_project.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_c(arr):
    arr = np.ascontiguousarray(arr, dtype=np.float64)
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def solve_bound_qp(P, q, lb, max_iters: int = 0) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native QP library unavailable")
    P, p_ptr = _as_c(P)
    q, q_ptr = _as_c(q)
    lb, lb_ptr = _as_c(lb)
    t = q.shape[0]
    out = np.zeros(t, np.float64)
    rc = lib.solve_bound_qp(p_ptr, q_ptr, lb_ptr, t, max_iters,
                            out.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_double)))
    if rc < 0:
        raise RuntimeError("native QP solve failed (singular system)")
    return out


def gem_project(mem_grads, grad, margin: float,
                eps: float = 1e-3) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native QP library unavailable")
    mem, m_ptr = _as_c(mem_grads)
    g, g_ptr = _as_c(grad)
    t, p = mem.shape
    out = np.zeros(p, np.float64)
    rc = lib.gem_project(m_ptr, g_ptr, t, p, margin, eps,
                         out.ctypes.data_as(
                             ctypes.POINTER(ctypes.c_double)))
    if rc < 0:
        raise RuntimeError("native GEM projection failed")
    return out
