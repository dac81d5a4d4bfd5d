"""Batched small-matrix linear algebra that actually maps to TPU.

XLA's native ``triangular_solve`` lowering on TPU requests a fixed ~17.5 MB
scoped-VMEM allocation for matrices larger than 64x64 (observed: any batched
f32 81x81 solve dies with "Scoped allocation ... exceeded scoped vmem limit"
regardless of batch size), which makes horizons N >= 16 uncompilable through
``jax.scipy.linalg.solve_triangular``. The KKT systems here are small
(n = nVeh*Hp + 1) and batched in the thousands, so substitution written as a
``fori_loop`` column sweep vectorizes over the batch under ``vmap`` and
compiles to plain fused VPU ops — no scoped-VMEM explosion, and exactly the
same arithmetic.

``cholesky_masked`` is the matching factorization (rank-1 masked updates)
for backends where ``jnp.linalg.cholesky``'s lowering is also problematic.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def tri_solve_lower(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L y = b for lower-triangular L (n, n), b (n,).

    Row-sweep forward substitution; the full-row dot is safe because the
    not-yet-computed entries of y are zero and L's upper triangle is zero.
    """
    n = b.shape[0]

    def step(j, y):
        yj = (b[j] - jnp.dot(L[j], y)) / L[j, j]
        return y.at[j].set(yj)

    return jax.lax.fori_loop(0, n, step, jnp.zeros_like(b))


def tri_solve_upper_from_lower(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L^T x = b for lower-triangular L (n, n), b (n,)."""
    n = b.shape[0]

    def step(i, x):
        j = n - 1 - i
        # row j of L^T is column j of L
        xj = (b[j] - jnp.dot(L[:, j], x)) / L[j, j]
        return x.at[j].set(xj)

    return jax.lax.fori_loop(0, n, step, jnp.zeros_like(b))


def cho_solve(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (L L^T) x = b given a Cholesky factor L."""
    return tri_solve_upper_from_lower(L, tri_solve_lower(L, b))


_NATIVE_MAX = 64  # largest size where XLA's TPU triangular_solve is sound


def blocked_cholesky(K: jax.Array, nb: int = _NATIVE_MAX) -> jax.Array:
    """Cholesky with all native sub-ops at block size <= nb.

    Recursive partition [[A11, .], [A21, A22]]: native cholesky on A11,
    one native triangular solve against the (<=nb)-sized L11, and an MXU
    matmul for the Schur complement. Keeps XLA's broken >64 triangular
    path out of the program while doing the O(n^3) work as matmuls.
    """
    n = K.shape[-1]
    if n <= nb:
        return jnp.linalg.cholesky(K)
    k = nb
    A11 = K[:k, :k]
    A21 = K[k:, :k]
    A22 = K[k:, k:]
    L11 = jnp.linalg.cholesky(A11)
    L21 = jax.scipy.linalg.solve_triangular(L11, A21.T, lower=True).T
    S = A22 - L21 @ L21.T
    L22 = blocked_cholesky(S, nb)
    top = jnp.concatenate([L11, jnp.zeros((k, n - k), K.dtype)], axis=1)
    bot = jnp.concatenate([L21, L22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def blocked_tri_solve_lower(L: jax.Array, b: jax.Array,
                            nb: int = _NATIVE_MAX) -> jax.Array:
    """Solve L y = b with native solves only on <= nb diagonal blocks."""
    n = b.shape[-1] if b.ndim == 1 else b.shape[0]
    if n <= nb:
        return jax.scipy.linalg.solve_triangular(L, b, lower=True)
    k = nb
    y1 = jax.scipy.linalg.solve_triangular(L[:k, :k], b[:k], lower=True)
    rhs2 = b[k:] - L[k:, :k] @ y1
    y2 = blocked_tri_solve_lower(L[k:, k:], rhs2, nb)
    return jnp.concatenate([y1, y2])


def blocked_tri_solve_upper_from_lower(L: jax.Array, b: jax.Array,
                                       nb: int = _NATIVE_MAX) -> jax.Array:
    """Solve L^T x = b with native solves only on <= nb diagonal blocks."""
    n = b.shape[-1] if b.ndim == 1 else b.shape[0]
    if n <= nb:
        return jax.scipy.linalg.solve_triangular(L.T, b, lower=False)
    k = nb
    # [[L11^T, L21^T], [0, L22^T]] x = b  -> solve bottom block first
    x2 = blocked_tri_solve_upper_from_lower(L[k:, k:], b[k:], nb)
    rhs1 = b[:k] - L[k:, :k].T @ x2
    x1 = jax.scipy.linalg.solve_triangular(L[:k, :k].T, rhs1, lower=False)
    return jnp.concatenate([x1, x2])


def blocked_cho_solve(L: jax.Array, b: jax.Array,
                      nb: int = _NATIVE_MAX) -> jax.Array:
    """Solve (L L^T) x = b via the blocked substitutions."""
    return blocked_tri_solve_upper_from_lower(
        L, blocked_tri_solve_lower(L, b, nb), nb)


def cholesky_masked(K: jax.Array) -> jax.Array:
    """Cholesky via masked rank-1 updates — a pure fori_loop/VPU lowering.

    Equivalent to ``jnp.linalg.cholesky`` for SPD inputs; used where the
    native lowering misbehaves. Returns the lower factor.
    """
    n = K.shape[0]
    ii = jnp.arange(n)
    row_gt = ii[:, None]
    col_gt = ii[None, :]

    def step(j, A):
        d = jnp.sqrt(A[j, j])
        col = jnp.where(ii >= j, A[:, j] / d, 0.0)
        A = A.at[:, j].set(col)
        mask = (row_gt > j) & (col_gt > j)
        A = A - jnp.where(mask, col[:, None] * col[None, :], 0.0)
        return A

    A = jax.lax.fori_loop(0, n, step, K)
    return jnp.tril(A)
