"""Side-selection controller — the convex, TPU-native MIQP replacement.

The reference's MIQP controller (MIQP.py:21-298) encodes collision avoidance
with big-M binary side selection: per (vehicle, obstacle, step) and per
vehicle pair, 2 binaries choose one of four axis-aligned separating
half-planes (MIQP.py:221-268), solved by branch-and-bound (Gurobi). Integer
programs don't map to TPUs; per the project north star the binaries are
replaced by a *masked convex* program:

1. pick each constraint's separating half-plane from the current relative
   geometry (the dominant displacement axis of a warm-start trajectory —
   exactly the side an optimal MIQP solution selects whenever the relative
   displacement is unambiguous);
2. solve ONE convex QP with those fixed linear constraints + an exact-penalty
   slack;
3. optionally re-select sides from the new trajectory and re-solve — a
   fixed-point iteration that usually converges in 1-2 rounds.

Objective parity with the MIQP (not the Q7-corrupted indices — rebuilt from
the formulation): tracking cost ``Q |y_k - ref_k|^2`` (``Q_final`` on the
terminal step, MIQP.py:146-155) plus steering-rate cost ``R (u_k - u_{k-1})^2``
(MIQP.py:156-158,204-216), with ``|u| <= uMax`` and ``|Δu| <= uLim`` bounds
(MIQP.py:275-279).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from scp_tpu.config import NY
from scp_tpu.ops import constraints as con
from scp_tpu.solvers import qp

# The four axis-aligned half-plane normals of the big-M formulation
# (MIQP.py:251,264): +x, -x, +y, -y.
_SIDES = jnp.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]])


class SideSelectionResult(NamedTuple):
    u: jax.Array             # (V*Hu,) stacked controls
    obj: jax.Array           # QP objective value
    slack: jax.Array         # exact-penalty slack (0 => hard-feasible)
    feasible: jax.Array      # true QCQP feasibility of the solution
    converged: jax.Array     # QP converged on the final round
    rounds: jax.Array        # side-reselection rounds used


def select_sides(delta: jax.Array) -> jax.Array:
    """Pick the dominant-axis separating half-plane for displacement(s).

    delta: (..., 2) relative displacement a - b. Returns one-hot (..., 4)
    over ``_SIDES`` — the half-plane n·(a-b) >= d the MIQP's binaries would
    activate for this geometry.
    """
    ax = jnp.abs(delta[..., 0]) >= jnp.abs(delta[..., 1])
    pos_x = delta[..., 0] >= 0
    pos_y = delta[..., 1] >= 0
    idx = jnp.where(ax, jnp.where(pos_x, 0, 1), jnp.where(pos_y, 2, 3))
    return jax.nn.one_hot(idx, 4, dtype=delta.dtype)


def _linear_rows(sys: con.ConstraintSystem, u_ref: jax.Array,
                 dsafe_pair: jax.Array, dsafe_obst: jax.Array):
    """Linear separation rows from the side selection at ``u_ref``.

    Returns (G (C, n), h (C,)) for rows ``G u <= h`` enforcing
    ``n·(p_i - p_j) >= dsafe`` with n chosen per constraint.
    """
    v, k, _, hu = sys.b3.shape
    n = v * hu
    pos = con.positions(sys, u_ref)
    eye_v = jnp.eye(v, dtype=u_ref.dtype)

    # vehicle pairs
    d_pair = pos[sys.pair_i] - pos[sys.pair_j]           # (P, K, 2)
    nvec_p = select_sides(d_pair) @ _SIDES.astype(u_ref.dtype)  # (P, K, 2)
    # constraint: n·(p_i - p_j) >= d  =>  -n·(B_i u_i - B_j u_j) <= n·(c_i-c_j) - d
    gi = -jnp.einsum("pky,pkyu->pku", nvec_p, sys.b3i)
    gj = jnp.einsum("pky,pkyu->pku", nvec_p, sys.b3j)
    g_pair = (jnp.einsum("pv,pku->pkvu", eye_v[sys.pair_i], gi)
              + jnp.einsum("pv,pku->pkvu", eye_v[sys.pair_j], gj))
    c_diff = sys.const3[sys.pair_i] - sys.const3[sys.pair_j]
    h_pair = jnp.einsum("pky,pky->pk", nvec_p, c_diff) - dsafe_pair[:, None]

    # obstacles
    d_obst = pos[:, None] - sys.obst_pos[None]           # (V, O, K, 2)
    nvec_o = select_sides(d_obst) @ _SIDES.astype(u_ref.dtype)
    gv = -jnp.einsum("voky,vkyu->voku", nvec_o, sys.b3)
    g_obst = jnp.einsum("vw,voku->vokwu", eye_v, gv)
    rel_c = sys.const3[:, None] - sys.obst_pos[None]
    h_obst = jnp.einsum("voky,voky->vok", nvec_o, rel_c) - dsafe_obst[:, :, None]

    G = jnp.concatenate([g_pair.reshape(-1, n), g_obst.reshape(-1, n)], 0)
    h = jnp.concatenate([h_pair.reshape(-1), h_obst.reshape(-1)])
    return G, h


def rate_cost_matrices(r_weight: jax.Array, u0: jax.Array, hu: int, dtype):
    """Steering-rate cost ``R sum_k (u_k - u_{k-1})^2`` with u_{-1} = u0.

    Returns per-vehicle (phi (hu, hu), psi (hu,)). r_weight/u0: (V,).
    """
    D = (jnp.eye(hu, dtype=dtype)
         - jnp.eye(hu, k=-1, dtype=dtype))               # first differences
    base = D.T @ D

    def per_veh(r, u0v):
        phi = r * base
        psi = jnp.zeros((hu,), dtype).at[0].set(-2.0 * r * u0v)
        return phi, psi

    return jax.vmap(per_veh)(r_weight, u0)


def solve_side_selection(sys: con.ConstraintSystem,
                         ref_points: jax.Array,      # (V, Hp, 2)
                         q_weight, q_final, r_weight,  # (V,) each
                         u0: jax.Array,              # (V,) previous commands
                         u_max: jax.Array,           # (V,) box bounds
                         u_init: jax.Array,          # (V*Hu,) side-selection seed
                         *,
                         du_lim: float,
                         slack_weight: float = 1e5,
                         slack_ub: float = 1e8,
                         constraint_tolerance: float = 2 * 2.1e-3,
                         n_rounds: int = 2,
                         qp_max_iter: int = 30,
                         qp_tol: float = 1e-8) -> SideSelectionResult:
    """Solve the side-selection convex program for one scenario instance."""
    v, hp, _, hu = sys.b3.shape
    n = v * hu
    dtype = u_init.dtype

    # Tracking + rate objective in condensed space.
    q_diag = jnp.broadcast_to(q_weight[:, None], (v, hp)).astype(dtype)
    q_diag = q_diag.at[:, -1].set(q_final)
    b3 = sys.b3                                           # (V, K, NY, U)
    err = ref_points.astype(dtype) - sys.const3           # (V, K, NY)
    bq = jnp.einsum("vkyu,vk->vkyu", b3, q_diag)
    phi_track = jnp.einsum("vkyu,vkyw->vuw", bq, b3)
    psi_track = -2.0 * jnp.einsum("vkyu,vky->vu", bq, err)
    phi_rate, psi_rate = rate_cost_matrices(r_weight.astype(dtype),
                                            u0.astype(dtype), hu, dtype)
    phi = phi_track + phi_rate
    psi = psi_track + psi_rate

    P_qp = jnp.zeros((n + 1, n + 1), dtype)
    for i in range(v):
        P_qp = P_qp.at[i * hu:(i + 1) * hu, i * hu:(i + 1) * hu].set(
            2.0 * phi[i])
    q_qp = jnp.concatenate([psi.reshape(n),
                            jnp.array([slack_weight], dtype)])
    u_box = jnp.broadcast_to(u_max[:, None], (v, hu)).reshape(n).astype(dtype)
    lb = jnp.concatenate([-u_box, jnp.zeros((1,), dtype)])
    ub = jnp.concatenate([u_box, jnp.full((1,), slack_ub, dtype)])

    n_con = sys.dsafe2_pair.shape[0] * hp + v * sys.obst_pos.shape[0] * hp
    slack_col = jnp.full((n_con, 1), -1.0, dtype)
    dsafe_pair = jnp.sqrt(sys.dsafe2_pair)
    dsafe_obst = jnp.sqrt(sys.dsafe2_obst)

    # Rate rows: |u_k - u_{k-1}| <= du_lim (first row anchored at u0).
    D = (jnp.eye(hu, dtype=dtype) - jnp.eye(hu, k=-1, dtype=dtype))
    D_full = jax.scipy.linalg.block_diag(*([D] * v))
    rate_rhs0 = jnp.zeros((n,), dtype)
    rate_rhs0 = rate_rhs0.at[jnp.arange(v) * hu].set(u0.astype(dtype))
    G_rate = jnp.concatenate([D_full, -D_full], 0)
    G_rate = jnp.concatenate(
        [G_rate, jnp.zeros((2 * n, 1), dtype)], 1)
    h_rate = jnp.concatenate([du_lim + rate_rhs0, du_lim - rate_rhs0])

    def one_round(carry, _):
        u_ref, _, _, _ = carry
        G_sep, h_sep = _linear_rows(sys, u_ref, dsafe_pair, dsafe_obst)
        G = jnp.concatenate([
            jnp.concatenate([G_sep, slack_col], axis=1),
            G_rate,
        ], axis=0)
        h = jnp.concatenate([h_sep, h_rate])
        x0 = jnp.concatenate([u_ref, jnp.zeros((1,), dtype)])
        sol = qp.solve_qp(P_qp, q_qp, G, h, lb, ub,
                          max_iter=qp_max_iter, tol=qp_tol, x0=x0)
        ok = jnp.all(jnp.isfinite(sol.x))
        u_new = jnp.where(ok, sol.x[:n], u_ref)
        return (u_new, sol.obj, sol.x[n], sol.converged & ok), None

    init = (u_init, jnp.asarray(jnp.inf, dtype), jnp.asarray(0.0, dtype),
            jnp.array(False))
    (u, obj, slack, conv), _ = jax.lax.scan(one_round, init, None,
                                            length=n_rounds)
    ev = con.evaluate(sys, u, constraint_tolerance, compat_q5=False)
    return SideSelectionResult(u=u, obj=obj, slack=slack,
                               feasible=ev.feasible, converged=conv,
                               rounds=jnp.asarray(n_rounds))
