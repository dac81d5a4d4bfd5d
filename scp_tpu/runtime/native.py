"""ctypes bindings for the native host runtime (runtime/libscpqp.so).

Provides ``solve_qp_native`` — the C++ dense IPM QP solver (the in-tree
replacement for the reference's Gurobi dependency, SCP_controller.py:135-145)
— used as a host-side oracle for the JAX solver and as a single-instance
fallback path. Builds on demand via ``make -C runtime`` if the shared library
is missing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import NamedTuple

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "libscpqp.so")
_lib = None


class NativeQPSolution(NamedTuple):
    x: np.ndarray
    obj: float
    gap: float
    primal_residual: float
    iters: int
    converged: bool


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _RUNTIME_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    dptr = ctypes.POINTER(ctypes.c_double)
    lib.scp_qp_solve.restype = ctypes.c_int
    lib.scp_qp_solve.argtypes = [
        ctypes.c_int, ctypes.c_int, dptr, dptr, dptr, dptr, dptr, dptr,
        ctypes.c_int, ctypes.c_double, dptr, dptr,
    ]
    _lib = lib
    return lib


def _as_c(a):
    a = np.ascontiguousarray(a, dtype=np.float64)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def solve_qp_native(P, q, G, h, lb, ub, max_iter: int = 50,
                    tol: float = 1e-10) -> NativeQPSolution:
    """Solve min 0.5 x'Px + q'x  s.t. Gx <= h, lb <= x <= ub on the host."""
    lib = _load()
    n = len(q)
    m = len(h)
    P_, Pp = _as_c(np.reshape(P, (n, n)))
    q_, qp_ = _as_c(np.reshape(q, n))
    G_, Gp = _as_c(np.reshape(G, (m, n)) if m else np.zeros((0, n)))
    h_, hp_ = _as_c(np.reshape(h, m) if m else np.zeros(0))
    lb_, lbp = _as_c(np.reshape(lb, n))
    ub_, ubp = _as_c(np.reshape(ub, n))
    x = np.zeros(n, np.float64)
    info = np.zeros(3, np.float64)
    xp = x.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    ip = info.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    rc = lib.scp_qp_solve(n, m, Pp, qp_, Gp, hp_, lbp, ubp, max_iter,
                          tol, xp, ip)
    if rc == -2:
        raise RuntimeError("native QP solver: numerical failure")
    return NativeQPSolution(x=x, obj=float(info[0]), gap=float(info[1]),
                            primal_residual=float(info[2]),
                            iters=abs(rc), converged=rc >= 0)
