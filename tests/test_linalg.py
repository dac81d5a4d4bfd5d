"""Batched small-matrix linalg vs numpy."""
import numpy as np
import jax
import jax.numpy as jnp

from scp_tpu.ops import linalg


def test_tri_solves_and_cholesky():
    rng = np.random.default_rng(0)
    for n in (5, 41, 81):
        A = rng.normal(size=(n, n))
        K = A @ A.T + n * np.eye(n)
        b = rng.normal(size=n)
        L_np = np.linalg.cholesky(K)
        L = linalg.cholesky_masked(jnp.array(K))
        np.testing.assert_allclose(np.asarray(L), L_np, rtol=1e-9, atol=1e-9)
        y = linalg.tri_solve_lower(jnp.array(L_np), jnp.array(b))
        np.testing.assert_allclose(np.asarray(y),
                                   np.linalg.solve(L_np, b), rtol=1e-9)
        x = linalg.cho_solve(jnp.array(L_np), jnp.array(b))
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(K, b),
                                   rtol=1e-8)


def test_batched_vmap():
    rng = np.random.default_rng(1)
    B, n = 16, 33
    A = rng.normal(size=(B, n, n))
    K = A @ np.transpose(A, (0, 2, 1)) + n * np.eye(n)
    b = rng.normal(size=(B, n))
    L = jax.vmap(jnp.linalg.cholesky)(jnp.array(K))
    x = jax.vmap(linalg.cho_solve)(L, jnp.array(b))
    want = np.linalg.solve(K, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), want, rtol=1e-7, atol=1e-9)


def test_blocked_variants():
    rng = np.random.default_rng(2)
    for n in (33, 81, 150):
        A = rng.normal(size=(n, n))
        K = A @ A.T + n * np.eye(n)
        b = rng.normal(size=n)
        L = linalg.blocked_cholesky(jnp.array(K))
        np.testing.assert_allclose(np.asarray(L), np.linalg.cholesky(K),
                                   rtol=1e-8, atol=1e-9)
        x = linalg.blocked_cho_solve(L, jnp.array(b))
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(K, b),
                                   rtol=1e-7, atol=1e-9)
