"""Structured QCQP collision constraints — no dense Phi tensors.

The reference materializes per-constraint quadratic forms
``Phi ∈ (nVeh-1, nVeh, Hp, n, n)`` (SCP_controller.py:278-341) — 28.7 MB per
step at 8 vehicles, almost all zeros. Algebraically each pair constraint
``(i, j, k)`` is::

    c = (dsafe + extra)^2 - || p_i[k](u) - p_j[k](u) ||^2
    p_v[k](u) = const_term[v, k] + B[v, k] @ u_v

(and analogously with a fixed obstacle position). We therefore never build
Phi/Psi/gamma: constraint values, gradients, and the linearized QP rows all
come from predicted positions via batched einsums, which XLA fuses into a few
MXU matmuls.

Stacked decision variable: ``u = concat_v(u_v)``, block of Hu per vehicle
(matches the reference's order='F' reshape, SCP_controller.py:202).
Constraint-row ordering matches SCP_controller.py:96-114: vehicle pairs in
``triu`` order (pair-major, horizon-minor), then (vehicle, obstacle, k).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from scp_tpu.config import NY


class ConstraintSystem(NamedTuple):
    """Static-shape problem data for one scenario instance.

    V = n_veh, O = n_obst, K = hp, U = hu, P = V*(V-1)/2 pairs.
    """
    b3: jax.Array           # (V, K, NY, U)  per-step blocks of math_b
    const3: jax.Array       # (V, K, NY)     per-step const_term
    obst_pos: jax.Array     # (O, K, NY)     predicted obstacle centers
    dsafe2_pair: jax.Array  # (P,)   (dsafe_veh + extra)^2 for each pair
    dsafe2_obst: jax.Array  # (V, O) (dsafe_obst + extra)^2
    pair_i: jax.Array       # (P,) static pair indices (i < j)
    pair_j: jax.Array       # (P,)
    pair_mask: jax.Array    # (P,)   1.0 = coupled pair, 0.0 = ignored
    obst_mask: jax.Array    # (V, O) 1.0 = active obstacle constraint
    b3i: jax.Array          # (P, K, NY, U) = b3[pair_i], gathered once —
    b3j: jax.Array          # (P, K, NY, U) = b3[pair_j] — so the SCP loop
    #   never re-gathers/re-lays-out b3 per iteration (XLA does not hoist
    #   the gather+transpose chain out of the while loop; measured
    #   ~3 ms/iteration at B=1024 when b3 arrives with parameter layouts)


def make_system(math_b, const_term, obst_pos, dsafe_veh, dsafe_obst,
                dsafe_extra, hp: int, hu: int,
                coupling: jax.Array | None = None,
                obst_coupling: jax.Array | None = None) -> ConstraintSystem:
    """Assemble the structured system from per-vehicle condensed matrices.

    math_b: (V, hp*NY, hu), const_term: (V, hp*NY), obst_pos: (O, hp, NY).

    ``coupling`` is an optional (V, V) adjacency matrix selecting which
    vehicle pairs are constrained — the working TPU equivalent of the
    reference's computed-but-unused coupling topology matrices
    (Scenarios.py:194-198,220-227): masked pairs cost nothing to drop from
    the fixed-shape batch. ``obst_coupling`` (V, O) does the same for
    vehicle-obstacle constraints.
    """
    v = math_b.shape[0]
    b3 = math_b.reshape(v, hp, NY, hu)
    const3 = const_term.reshape(v, hp, NY)
    iu, ju = jnp.triu_indices(v, k=1)
    dsafe2_pair = (dsafe_veh[iu, ju] + dsafe_extra) ** 2
    dsafe2_obst = (dsafe_obst + dsafe_extra) ** 2
    dtype = math_b.dtype
    if coupling is None:
        pair_mask = jnp.ones((iu.shape[0],), dtype)
    else:
        cm = coupling.astype(dtype)
        pair_mask = jnp.maximum(cm[iu, ju], cm[ju, iu])
    if obst_coupling is None:
        obst_mask = jnp.ones(dsafe2_obst.shape, dtype)
    else:
        obst_mask = obst_coupling.astype(dtype)
    return ConstraintSystem(b3, const3, obst_pos, dsafe2_pair, dsafe2_obst,
                            iu, ju, pair_mask, obst_mask,
                            b3i=b3[iu], b3j=b3[ju])


def positions(sys: ConstraintSystem, u: jax.Array) -> jax.Array:
    """Predicted positions (V, K, NY) for stacked controls u (V*hu,)."""
    v, k, _, hu = sys.b3.shape
    uv = u.reshape(v, hu)
    return sys.const3 + jnp.einsum("vkyu,vu->vky", sys.b3, uv)


def constraint_values(sys: ConstraintSystem, u: jax.Array):
    """Exact (concave-quadratic) constraint values at ``u``.

    Returns ``(c_pair (P, K), c_obst (V, O, K))`` — positive = violated,
    matching ``QCQP_evaluate`` (SCP_controller.py:235,252).
    """
    pos = positions(sys, u)
    d_pair = _pair_diff(pos, sys.b3.shape[0])             # (P, K, NY)
    c_pair = sys.dsafe2_pair[:, None] - jnp.sum(d_pair**2, -1)
    d_obst = pos[:, None] - sys.obst_pos[None]            # (V, O, K, NY)
    c_obst = sys.dsafe2_obst[:, :, None] - jnp.sum(d_obst**2, -1)
    return c_pair, c_obst


def _static_pairs(v: int):
    """triu pair indices as Python ints (trace-time constants)."""
    import numpy as np
    iu, ju = np.triu_indices(v, k=1)
    return list(zip(iu.tolist(), ju.tolist()))


def _pair_diff(pos: jax.Array, v: int) -> jax.Array:
    """pos[pair_i] - pos[pair_j] with static slices instead of gathers."""
    pairs = _static_pairs(v)
    if not pairs:
        return jnp.zeros((0,) + pos.shape[1:], pos.dtype)
    return jnp.stack([pos[i] - pos[j] for i, j in pairs])


def linearize_slabs(sys: ConstraintSystem, u: jax.Array,
                    with_values: bool = False):
    """Linearize every constraint at ``u`` into PAIR-SPARSE row slabs.

    Same math as :func:`linearize` (the reference's ``Psi^T + 2 u^T Phi``
    rows, SCP_controller.py:100-113) but the rows are returned restricted
    to the vehicle blocks they actually touch — ``gi/gj (P, K, U)`` for
    the pair rows and ``gob (V, O, K, U)`` for the obstacle rows — so the
    mostly-zero dense ``(C, n)`` matrix never has to exist. This is the
    native input of the structured fused QP (qp.solve_qp_batched's
    ``g_slabs``), whose Pallas kernel consumes exactly these slabs.
    Coupling masks are already applied. Returns ``(gi, gj, gob, rhs)``
    with rhs over rows ordered [pairs p-major k-minor | (v, o) k-minor].

    ``with_values``: additionally return the raw constraint values
    ``(c_pair (P, K), c_obst (V, O, K))`` computed on the way (they are
    free by-products of the linearization — the SCP loop otherwise pays a
    second full position/constraint pass in :func:`evaluate` per
    iteration; feed them to :func:`violations_from_values`).
    """
    v, k, _, hu = sys.b3.shape
    pos = positions(sys, u)
    pairs = _static_pairs(v)

    # --- vehicle pairs ---
    d_pair = _pair_diff(pos, v)                           # (P, K, NY)
    c_pair = sys.dsafe2_pair[:, None] - jnp.sum(d_pair**2, -1)
    gi = -2.0 * jnp.einsum("pky,pkyu->pku", d_pair, sys.b3i)
    gj = 2.0 * jnp.einsum("pky,pkyu->pku", d_pair, sys.b3j)
    uv = u.reshape(v, hu)
    if pairs:
        ui = jnp.stack([uv[i] for i, _ in pairs])
        uj = jnp.stack([uv[j] for _, j in pairs])
        gdotu_pair = (jnp.einsum("pku,pu->pk", gi, ui)
                      + jnp.einsum("pku,pu->pk", gj, uj))
    else:
        gdotu_pair = jnp.zeros((0, k), u.dtype)
    rhs_pair = gdotu_pair - c_pair

    # --- obstacles ---
    d_obst = pos[:, None] - sys.obst_pos[None]            # (V, O, K, NY)
    c_obst = sys.dsafe2_obst[:, :, None] - jnp.sum(d_obst**2, -1)
    gv = -2.0 * jnp.einsum("voky,vkyu->voku", d_obst, sys.b3)
    gdotu_obst = jnp.einsum("voku,vu->vok", gv, uv)
    rhs_obst = gdotu_obst - c_obst

    # Coupling masks: dropped constraints become 0·u <= big (trivially slack).
    big = jnp.asarray(1e10, u.dtype)
    gi = gi * sys.pair_mask[:, None, None]
    gj = gj * sys.pair_mask[:, None, None]
    rhs_pair = jnp.where(sys.pair_mask[:, None] > 0, rhs_pair, big)
    gv = gv * sys.obst_mask[:, :, None, None]
    rhs_obst = jnp.where(sys.obst_mask[:, :, None] > 0, rhs_obst, big)

    rhs = jnp.concatenate([rhs_pair.reshape(-1), rhs_obst.reshape(-1)])
    if with_values:
        return gi, gj, gv, rhs, c_pair, c_obst
    return gi, gj, gv, rhs


def linearize_ycoefs(sys: ConstraintSystem, u: jax.Array):
    """POSITION-space coefficients of the linearized rows at ``u``.

    The input of the banded (Riccati) KKT path (ops/riccati.py): pair row
    (p, k) acts on the stage positions as ``y_pair[p,k]·Δy_k^i -
    y_pair[p,k]·Δy_k^j`` and obstacle row (v, o, k) as
    ``y_obst[v,o,k]·Δy_k^v`` — the same rows :func:`linearize_slabs`
    returns already multiplied into the condensed blocks (``gi = y·b3i``,
    ``gj = -y·b3j``, ``gob = y·b3``). Coupling masks are applied (masked
    rows are zero rows, matching the slabs). Returns
    ``(y_pair (P, K, NY), y_obst (V, O, K, NY))``.
    """
    v = sys.b3.shape[0]
    pos = positions(sys, u)
    d_pair = _pair_diff(pos, v)
    y_pair = -2.0 * d_pair * sys.pair_mask[:, None, None]
    d_obst = pos[:, None] - sys.obst_pos[None]
    y_obst = -2.0 * d_obst * sys.obst_mask[:, :, None, None]
    return y_pair, y_obst


def scatter_slabs(v: int, gi, gj, gob, dtype=None):
    """Assemble the dense stacked ``G (C, n)`` from row slabs (the scatter
    half of the old monolithic ``linearize``; kept for the dense QP path
    and as the oracle-parity layout)."""
    pairs = _static_pairs(v)
    p, k, hu = gi.shape[0], gob.shape[2], gob.shape[3]
    n = v * hu
    dtype = dtype or gi.dtype
    zero_ku = jnp.zeros((k, hu), dtype)
    if pairs:
        g_pair = jnp.stack([
            jnp.stack([gi[pp] if i == w else (gj[pp] if j == w else zero_ku)
                       for w in range(v)], axis=1)
            for pp, (i, j) in enumerate(pairs)])          # (P, K, V, U)
    else:
        g_pair = jnp.zeros((0, k, v, hu), dtype)
    o = gob.shape[1]
    zero_oku = jnp.zeros((o, k, hu), dtype)
    g_obst = jnp.stack([
        jnp.stack([gob[vv] if vv == w else zero_oku for w in range(v)],
                  axis=2)
        for vv in range(v)])                              # (V, O, K, V, U)
    return jnp.concatenate([
        g_pair.reshape(-1, n),
        g_obst.reshape(-1, n),
    ], axis=0)


def linearize(sys: ConstraintSystem, u: jax.Array):
    """Linearize every constraint at ``u``: rows ``g`` with ``g @ x <= rhs``.

    Equivalent to the reference's ``Psi^T + 2 u^T Phi`` rows and
    ``u^T Phi u - gamma`` rhs (SCP_controller.py:100-113) computed from the
    position structure. Returns ``(G (C, n), rhs (C,))`` with
    C = P*K + V*O*K, n = V*hu. (Thin dense wrapper over
    :func:`linearize_slabs` + :func:`scatter_slabs` — the masks commute
    with the scatter, so this is bitwise the old monolithic assembly.)
    """
    v = sys.b3.shape[0]
    gi, gj, gob, rhs = linearize_slabs(sys, u)
    return scatter_slabs(v, gi, gj, gob, dtype=u.dtype), rhs


class Violations(NamedTuple):
    feasible: jax.Array       # bool
    max_violation: jax.Array  # max over violated constraints, 0 if none
    sum_violations: jax.Array
    c_pair: jax.Array
    c_obst: jax.Array


def evaluate(sys: ConstraintSystem, u: jax.Array, tol: float,
             compat_q5: bool = True) -> Violations:
    """Violation bookkeeping of ``QCQP_evaluate`` (SCP_controller.py:215-265).

    ``compat_q5=True`` reproduces the reference's nesting bug (SURVEY.md Q5):
    the obstacle loop sits inside the ``v2`` pair loop, so with one vehicle
    obstacle violations are never counted, and with n > 2 vehicles each
    (v, o, k) obstacle term is counted ``nVeh - 1 - v`` times in
    ``sum_violations``. ``feasible``/``max_violation`` are only affected by
    the single-vehicle skip.
    """
    c_pair, c_obst = constraint_values(sys, u)
    return violations_from_values(sys, c_pair, c_obst, tol, compat_q5)


def violations_from_values(sys: ConstraintSystem, c_pair, c_obst, tol: float,
                           compat_q5: bool = True) -> Violations:
    """:func:`evaluate`'s bookkeeping on PRECOMPUTED constraint values —
    lets the SCP loop reuse the values :func:`linearize_slabs` already
    computed instead of paying a second position/constraint pass."""
    n_veh = sys.b3.shape[0]

    pair_viol = jnp.where(c_pair > tol, c_pair, 0.0) * sys.pair_mask[:, None]
    obst_viol = jnp.where(c_obst > tol, c_obst, 0.0) \
        * sys.obst_mask[:, :, None]

    if compat_q5 and n_veh == 1:
        obst_mask = jnp.zeros_like(obst_viol)
    else:
        obst_mask = obst_viol

    max_violation = jnp.maximum(
        jnp.max(pair_viol, initial=0.0), jnp.max(obst_mask, initial=0.0))
    if compat_q5:
        # multiplicity (nVeh - 1 - v) per vehicle v in the reference sum
        mult = jnp.maximum(
            n_veh - 1 - jnp.arange(n_veh, dtype=c_pair.dtype), 0.0)
        sum_obst = jnp.einsum("v,vok->", mult, obst_viol)
    else:
        sum_obst = jnp.sum(obst_viol)
    sum_violations = jnp.sum(pair_viol) + sum_obst
    feasible = (jnp.max(pair_viol, initial=0.0) <= 0.0) & \
               (jnp.max(obst_mask, initial=0.0) <= 0.0)
    return Violations(feasible, max_violation, sum_violations, c_pair, c_obst)


def penalty_score(sys: ConstraintSystem, phi0, psi0, gamma0, u: jax.Array,
                  c_quad: float = 1e9, c_linear: float = 0.0,
                  compat_q5: bool = True):
    """Exact-penalty feasibility score and its gradient.

    Reference ``QCQP_evaluate``'s ``feasibilityScore`` /
    ``feasibilityScoreGradient`` (SCP_controller.py:216-258):
    ``objective + sum_i [c_quad * max(ci, 0)^2 + c_linear * max(ci, 0)]``
    with the gradient accumulated only over violated constraints. With
    ``compat_q5`` the reference's loop nesting is reproduced: with one
    vehicle obstacle terms are skipped, with n > 2 each obstacle term is
    counted ``nVeh - 1 - v`` times.
    """
    v, k, _, hu = sys.b3.shape
    uv = u.reshape(v, hu)
    pos = positions(sys, u)
    obj = objective(phi0, psi0, gamma0, u)
    grad_obj = jnp.einsum("vuw,vw->vu", 2.0 * phi0, uv) + psi0  # (V, hu)

    d_pair = pos[sys.pair_i] - pos[sys.pair_j]
    c_pair = sys.dsafe2_pair[:, None] - jnp.sum(d_pair**2, -1)
    cp = jnp.maximum(c_pair, 0.0)
    d_obst = pos[:, None] - sys.obst_pos[None]
    c_obst = sys.dsafe2_obst[:, :, None] - jnp.sum(d_obst**2, -1)
    co = jnp.maximum(c_obst, 0.0)

    if compat_q5:
        mult = jnp.maximum(v - 1 - jnp.arange(v, dtype=u.dtype), 0.0)
    else:
        mult = jnp.ones((v,), u.dtype)
    score = obj + c_quad * (jnp.sum(cp**2) + jnp.einsum("v,vok->", mult, co**2)) \
        + c_linear * (jnp.sum(cp) + jnp.einsum("v,vok->", mult, co))

    # gradient of each violated constraint: d ci/d u_i = -2 B_i^T d, etc.
    wp = jnp.where(c_pair > 0, 2.0 * c_quad * c_pair + c_linear, 0.0)  # (P,K)
    gi = -2.0 * jnp.einsum("pk,pky,pkyu->pu", wp, d_pair, sys.b3[sys.pair_i])
    gj = 2.0 * jnp.einsum("pk,pky,pkyu->pu", wp, d_pair, sys.b3[sys.pair_j])
    grad = grad_obj
    grad = grad.at[sys.pair_i].add(gi)
    grad = grad.at[sys.pair_j].add(gj)
    wo = jnp.where(c_obst > 0, 2.0 * c_quad * c_obst + c_linear, 0.0)
    wo = wo * mult[:, None, None]
    go = -2.0 * jnp.einsum("vok,voky,vkyu->vu", wo, d_obst, sys.b3)
    grad = grad + go
    return score, grad.reshape(v * hu)


def objective(phi0, psi0, gamma0, u: jax.Array) -> jax.Array:
    """Tracking objective u^T Phi0 u + Psi0^T u + gamma0 with block-diagonal
    per-vehicle Phi0 (SCP_controller.py:227, 293-298).

    phi0: (V, hu, hu), psi0: (V, hu), gamma0: (V,), u: (V*hu,).
    """
    v, hu, _ = phi0.shape
    uv = u.reshape(v, hu)
    quad = jnp.einsum("vu,vuw,vw->", uv, phi0, uv)
    lin = jnp.einsum("vu,vu->", psi0, uv)
    return quad + lin + jnp.sum(gamma0)
