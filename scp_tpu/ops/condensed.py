"""Condensed MPC prediction and cost matrices.

Reference: ``MPCclass.prediction_matrices`` / ``mpc_cost_function_matrices``
(MPC_Iter.py:116-149). For discrete dynamics ``x+ = A x + B u + E`` and output
``y = C x``, the stacked horizon prediction is::

    Y = MathA @ x0 + MathB @ U + MathC
    MathA[i]   = C A^(i+1)                    (i = 0..Hp-1)
    MathB[i,j] = C A^(i-j) B   for j <= i, j < Hu
    MathC[i]   = (sum_{m=0..i} C A^m) E

TPU-first: the power chain is a single ``lax.scan``; the Toeplitz block matrix
is built by a masked gather instead of nested Python loops; everything is
``vmap``-able over vehicles and scenario batches.

Note on Hu < Hp: the reference silently *drops* B-blocks with column index
>= Hu (numpy slice clipping at MPC_Iter.py:147) rather than holding the last
control. We reproduce that truncation semantics exactly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from scp_tpu.config import NX, NU, NY
from scp_tpu.models.bicycle import output_matrix


class CondensedMatrices(NamedTuple):
    """Per-vehicle condensed matrices (leading axes may be batch/vehicle)."""
    math_a: jax.Array      # (Hp*NY, NX)
    math_b: jax.Array      # (Hp*NY, Hu*NU)
    math_c: jax.Array      # (Hp*NY,)
    const_term: jax.Array  # (Hp*NY,)  = math_a @ x0 + math_c
    phi0: jax.Array        # (Hu*NU, Hu*NU) quadratic cost
    psi0: jax.Array        # (Hu*NU,)       linear cost
    gamma0: jax.Array      # ()             constant cost


def prediction_matrices(A: jax.Array, B: jax.Array, E: jax.Array,
                        hp: int, hu: int):
    """Build (math_a, math_b, math_c) for one vehicle.

    A: (NX, NX), B: (NX, NU), E: (NX,). Returns flattened stacked matrices.
    """
    C = output_matrix(A.dtype)

    def mm(a, b):
        # tiny matmul as broadcast-multiply-reduce: batched (2, 6) @ (6, 6)
        # dots use the MXU at <1% utilization under vmap (see discretize.py)
        return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)

    # CA[i] = C @ A^i for i = 0..hp via scan (MPC_Iter.py:135-141).
    def step(ca, _):
        nxt = mm(ca, A)
        return nxt, nxt

    _, ca_powers = jax.lax.scan(step, C, None, length=hp, unroll=True)      # (hp, NY, NX): CA^1..CA^hp
    ca_all = jnp.concatenate([C[None], ca_powers], axis=0)      # (hp+1, NY, NX): CA^0..CA^hp

    math_a = ca_powers.reshape(hp * NY, NX)

    # math_c block i = (sum_{m<=i} C A^m) @ E
    ca_cumsum = jnp.cumsum(ca_all[:hp], axis=0)                 # (hp, NY, NX)
    math_c = (ca_cumsum @ E).reshape(hp * NY)

    # math_b block (i, j) = CA^(i-j) @ B, j <= i, j < hu.
    cab = ca_all @ B                                            # (hp+1, NY, NU)
    ii = jnp.arange(hp)[:, None]
    jj = jnp.arange(hu)[None, :]
    diff = ii - jj                                              # (hp, hu)
    blocks = cab[jnp.clip(diff, 0, hp)]                         # (hp, hu, NY, NU)
    blocks = jnp.where((diff >= 0)[:, :, None, None], blocks, 0.0)
    # (hp, hu, NY, NU) -> (hp, NY, hu, NU) -> (hp*NY, hu*NU)
    math_b = blocks.transpose(0, 2, 1, 3).reshape(hp * NY, hu * NU)
    return math_a, math_b, math_c


def cost_matrices(math_b: jax.Array, const_term: jax.Array, reference: jax.Array,
                  q_weight, r_weight, q_final, hp: int, hu: int):
    """Quadratic tracking cost in the condensed variable U.

    Reference MPC_Iter.py:116-127: Q = q*I with q_final on the last NY rows;
    R = r*I; Error = reference - const_term;
    phi0 = sym(B^T Q B + R), psi0 = -2 B^T Q Error, gamma0 = Error^T Q Error.
    """
    q_diag = jnp.full((hp * NY,), q_weight, math_b.dtype)
    q_diag = q_diag.at[NY * (hp - 1):].set(q_final)
    err = reference - const_term
    bq = math_b.T * q_diag[None, :]           # B^T Q
    phi0 = bq @ math_b + r_weight * jnp.eye(hu * NU, dtype=math_b.dtype)
    phi0 = 0.5 * (phi0 + phi0.T)
    psi0 = -2.0 * (bq @ err)
    gamma0 = jnp.dot(err, q_diag * err)
    return phi0, psi0, gamma0


def build_condensed(A, B, E, x0, reference, q_weight, r_weight, q_final,
                    hp: int, hu: int) -> CondensedMatrices:
    """Full per-vehicle condensed-matrix pipeline (MPC_Iter.py:82-97).

    x0: (NX,), reference: (hp*NY,) stacked [x0,y0,x1,y1,...] target points.
    """
    math_a, math_b, math_c = prediction_matrices(A, B, E, hp, hu)
    const_term = math_a @ x0 + math_c
    phi0, psi0, gamma0 = cost_matrices(
        math_b, const_term, reference, q_weight, r_weight, q_final, hp, hu)
    return CondensedMatrices(math_a, math_b, math_c, const_term,
                             phi0, psi0, gamma0)


# vmapped over vehicles.
build_condensed_batch = jax.vmap(
    build_condensed,
    in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None, None),
)
