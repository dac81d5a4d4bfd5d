"""Minimal cvxpy-compatible shim backed by the scp_tpu f64 QP solver.

The reference solves its SCP subproblems through cvxpy+Gurobi
(SCP_controller.py:135-145), neither of which is installed. This shim
implements just enough of the cvxpy surface used by that code path —
``Variable``, ``quad_form``, ``Problem``/``Minimize``, matrix expressions and
``<=``/``>=`` constraints — to capture the (P, q, G, h) data and solve with
``scp_tpu.solvers.qp`` in float64. Installing it as ``sys.modules['cvxpy']``
before loading the reference lets golden tests run the *original* SCP loop
end-to-end against our implementation.
"""
import sys
import types

import numpy as np


class _Node:
    __array_ufunc__ = None  # make numpy defer binary ops to us
    __array_priority__ = 1000

    def __add__(self, other):
        return Sum([self, other])

    def __radd__(self, other):
        return Sum([other, self])

    def __mul__(self, c):
        return Scaled(float(c), self)

    __rmul__ = __mul__


class Variable(_Node):
    def __init__(self, shape):
        self.shape = tuple(shape)
        self.value = None

    @property
    def n(self):
        return int(np.prod(self.shape))

    def __rmatmul__(self, M):
        return MatExpr(np.asarray(M, float), self)

    def __le__(self, rhs):       # var <= ub
        n = self.n
        return Constraint(self, np.eye(n), np.asarray(rhs, float).reshape(n))

    def __ge__(self, rhs):       # var >= lb
        n = self.n
        return Constraint(self, -np.eye(n), -np.asarray(rhs, float).reshape(n))


class QuadForm(_Node):
    def __init__(self, var, P, coeff=1.0):
        self.var, self.P, self.coeff = var, np.asarray(P, float), coeff


class MatExpr(_Node):
    """A @ var (A row vector -> linear cost term; matrix -> constraint LHS)."""

    def __init__(self, A, var, coeff=1.0):
        self.A, self.var, self.coeff = np.asarray(A, float), var, coeff

    def __le__(self, rhs):
        m = self.A.shape[0]
        return Constraint(self.var, self.coeff * self.A,
                          np.asarray(rhs, float).reshape(m))


class Scaled(_Node):
    def __new__(cls, c, node):
        if isinstance(node, QuadForm):
            return QuadForm(node.var, node.P, node.coeff * c)
        if isinstance(node, MatExpr):
            return MatExpr(node.A, node.var, node.coeff * c)
        if isinstance(node, Sum):
            return Sum([Scaled(c, t) for t in node.terms])
        raise TypeError(type(node))


class Sum(_Node):
    def __init__(self, terms):
        flat = []
        for t in terms:
            if isinstance(t, Sum):
                flat.extend(t.terms)
            elif isinstance(t, (int, float)) and t == 0:
                continue
            else:
                flat.append(t)
        self.terms = flat


class Constraint:
    def __init__(self, var, G, h):
        self.var, self.G, self.h = var, G, h


class Minimize:
    def __init__(self, expr):
        self.expr = expr


class Problem:
    def __init__(self, objective, constraints):
        self.objective = objective
        self.constraints = constraints
        self.value = None

    def solve(self, solver=None, verbose=False, **kw):
        import jax
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        from scp_tpu.solvers import qp as qp_mod

        expr = self.objective.expr
        terms = expr.terms if isinstance(expr, Sum) else [expr]
        var = None
        P = q = None
        for t in terms:
            if isinstance(t, QuadForm):
                var = t.var
                P = 2.0 * t.coeff * t.P  # quad_form = x^T P x (no 1/2)
            elif isinstance(t, MatExpr):
                var = t.var
                q = t.coeff * t.A.reshape(-1)
            else:
                raise TypeError(t)
        n = var.n
        if P is None:
            P = np.zeros((n, n))
        if q is None:
            q = np.zeros(n)
        G = np.vstack([c.G for c in self.constraints])
        h = np.concatenate([c.h for c in self.constraints])
        # Wide artificial box: the true bounds arrive as G rows.
        lb = np.full(n, -1e4)
        ub = np.full(n, 1e4)
        sol = qp_mod.solve_qp(
            jnp.array(P), jnp.array(q), jnp.array(G), jnp.array(h),
            jnp.array(lb), jnp.array(ub), max_iter=60, tol=1e-10)
        if not bool(sol.converged):
            # Stall exits near convergence are acceptable for the oracle ONLY
            # if the PRIMAL solution actually solves the QP. On degenerate
            # active sets the IPM's carried duals can be poorly recovered
            # (rd large) while x is optimal to ~1e-7, so certify x directly:
            # identify the active set, solve the equality-constrained KKT
            # system exactly, and require agreement plus nonnegative
            # least-squares multipliers (the textbook optimality check).
            x = np.asarray(sol.x)
            ghat = np.vstack([G, np.eye(n), -np.eye(n)])
            hhat = np.concatenate([h, ub, -lb])
            rp = np.maximum(ghat @ x - hhat, 0.0).max()
            act = np.where(hhat - ghat @ x < 1e-7)[0]
            A = ghat[act]
            K = np.block([[P, A.T],
                          [A, np.zeros((len(act), len(act)))]])
            rhs = np.concatenate([-q, hhat[act]])
            kkt, *_ = np.linalg.lstsq(K, rhs, rcond=None)
            x_eq, lam = kkt[:n], kkt[n:]
            x_scale = 1.0 + np.abs(x_eq).max()
            x_err = np.abs(x - x_eq).max() / x_scale
            assert (float(sol.gap) < 1e-6 and rp < 1e-7
                    and x_err < 1e-5 and (lam > -1e-6).all()), (
                f"shim QP did not converge (gap {float(sol.gap):.2e}, "
                f"rp {rp:.2e}, x_err {x_err:.2e}, "
                f"min_mult {lam.min() if len(lam) else 0.0:.2e})")
        var.value = np.array(sol.x, copy=True).reshape(var.shape)
        self.value = float(sol.obj)
        return self.value


def quad_form(var, P):
    return QuadForm(var, P)


def vstack(arrs):
    return np.vstack(arrs)


def install():
    """Install this shim as sys.modules['cvxpy'].

    If a 'cvxpy' module already exists (e.g. reference_oracle's inert stub,
    installed by a test that ran earlier and didn't need the QP path), it is
    mutated IN PLACE: already-imported reference modules hold a binding to
    that module object, so replacing the sys.modules entry would leave them
    on the stale stub.
    """
    mod = sys.modules.get("cvxpy")
    if mod is None:
        mod = types.ModuleType("cvxpy")
        sys.modules["cvxpy"] = mod
    for name in ("Variable", "Problem", "Minimize", "quad_form", "vstack"):
        setattr(mod, name, globals()[name])
    mod.GUROBI = "GUROBI"
    mod.CVXOPT = "CVXOPT"
    mod._is_scp_tpu_shim = True
    return mod
