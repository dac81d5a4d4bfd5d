"""Exact zero-order-hold discretization of the linearized dynamics.

Reference: ``MPCclass.discretize`` (MPC_Iter.py:99-113) — ZOH via the matrix
exponential of the augmented system ``[[Ac, Bc], [0, 0]]`` for ``(Ad, Bd)`` and
``[[Ac, Ec], [0, 0]]`` for ``Ed``.

TPU-first: both augmentations are fused into ONE ``expm`` of the
``[[Ac, Bc, Ec], [0, 0, 0]]`` block (the zero rows decouple the B and E
columns, so one exponential yields Ad, Bd and Ed simultaneously), computed with
``jax.scipy.linalg.expm`` and ``vmap``-ed over vehicles / scenarios.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from scp_tpu.config import NX, NU
from scp_tpu.models import bicycle


def zoh(Ac: jax.Array, Bc: jax.Array, Ec: jax.Array, dt: float):
    """Discretize ``dx = Ac x + Bc u + Ec`` with a zero-order hold.

    Returns ``(Ad, Bd, Ed)`` such that
    ``x[k+1] = Ad x[k] + Bd u[k] + Ed``.
    """
    n_aug = NX + NU + 1
    M = jnp.zeros((n_aug, n_aug), Ac.dtype)
    M = M.at[:NX, :NX].set(Ac)
    M = M.at[:NX, NX:NX + NU].set(Bc)
    M = M.at[:NX, NX + NU:].set(Ec.reshape(NX, 1))
    eM = jax.scipy.linalg.expm(dt * M)
    Ad = eM[:NX, :NX]
    Bd = eM[:NX, NX:NX + NU]
    Ed = eM[:NX, NX + NU]
    # The reference zeroes |E| <= 1e-30 (MPC_Iter.py:87) — numerically inert;
    # we keep the exact values.
    return Ad, Bd, Ed


def linearize_and_discretize(x0: jax.Array, u0: jax.Array, lf, lr, dt: float):
    """Continuous linearization at ``(x0, u0)`` + ZOH discretization.

    One (Ad, Bd, Ed) is produced per linearization point and reused for every
    horizon step, exactly like the reference (MPC_Iter.py:94-97).
    """
    Ac, Bc, Ec = bicycle.linearize(x0, u0, lf, lr)
    return zoh(Ac, Bc, Ec, dt)


# vmap over vehicles: x0 (V, NX), u0 (V,), lf/lr (V,) -> (V, NX, NX) ...
linearize_and_discretize_batch = jax.vmap(
    linearize_and_discretize, in_axes=(0, 0, 0, 0, None)
)
