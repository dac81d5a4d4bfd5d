"""Native C++ QP solver vs the JAX solver: independent implementations agree."""
import numpy as np
import jax.numpy as jnp

from scp_tpu.runtime import native
from scp_tpu.solvers import qp

import sys
sys.path.insert(0, "tests")
from test_qp import _random_qp  # noqa: E402


def test_native_matches_jax_random():
    for seed in range(6):
        P, q, G, h, lb, ub = _random_qp(10, 8, seed + 50)
        nat = native.solve_qp_native(P, q, G, h, lb, ub)
        sol = qp.solve_qp(*(jnp.array(a) for a in (P, q, G, h, lb, ub)),
                          max_iter=50, tol=1e-10)
        assert nat.converged and bool(sol.converged)
        np.testing.assert_allclose(nat.obj, float(sol.obj), rtol=1e-7,
                                   atol=1e-9)
        np.testing.assert_allclose(nat.x, np.asarray(sol.x), rtol=1e-5,
                                   atol=1e-7)


def test_native_scp_scaling():
    rng = np.random.default_rng(11)
    n_u, n = 20, 21
    P = np.zeros((n, n))
    for i in range(2):
        A = rng.normal(size=(10, 10))
        P[i * 10:(i + 1) * 10, i * 10:(i + 1) * 10] = \
            2 * (A @ A.T * 400 + 8000 * np.eye(10))
    q = np.concatenate([rng.normal(size=n_u) * 50.0, [1e5]])
    G = np.zeros((30, n))
    G[:, :n_u] = rng.normal(size=(30, n_u)) * 10
    G[:, -1] = -1.0
    h = rng.normal(size=30) * 5.0
    lb = np.concatenate([-np.full(n_u, 0.05), [0.0]])
    ub = np.concatenate([np.full(n_u, 0.05), [1e8]])
    nat = native.solve_qp_native(P, q, G, h, lb, ub)
    sol = qp.solve_qp(*(jnp.array(a) for a in (P, q, G, h, lb, ub)),
                      max_iter=60, tol=1e-10)
    assert nat.converged and bool(sol.converged)
    np.testing.assert_allclose(nat.obj, float(sol.obj), rtol=1e-6, atol=1e-4)
    assert nat.primal_residual <= 1e-7
