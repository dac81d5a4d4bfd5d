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

from scp_tpu.ops import constraints as con
from scp_tpu.solvers import qp

# The four axis-aligned half-plane normals of the big-M formulation
# (MIQP.py:251,264): +x, -x, +y, -y. Kept as a HOST constant: this module
# is imported lazily from inside jitted engine code, and a module-level
# jnp.array created during a trace leaks that trace into later jits.
import numpy as _np  # noqa: E402

_SIDES = _np.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]])


class SideSelectionResult(NamedTuple):
    u: jax.Array             # (V*Hu,) stacked controls
    obj: jax.Array           # QP objective value
    slack: jax.Array         # exact-penalty slack (0 => hard-feasible)
    feasible: jax.Array      # true QCQP feasibility of the solution
    converged: jax.Array     # QP converged on the final round
    rounds: jax.Array        # side-reselection rounds used
    sides_stable: jax.Array  # bool — the reselection fixed point was reached
    # (the last round's side assignment equals the one its own solution
    # induces, i.e. another round would solve the identical QP)
    qp_iters: jax.Array      # total inner-QP (IPM) iterations actually run,
    # summed over every solved QP: all first-round candidates + every
    # reselection round (the controller's true solver cost)


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


def _slabs_from_selection(sys: con.ConstraintSystem,
                          sel_pair: jax.Array,       # (P, K) int in [0, 4)
                          sel_obst: jax.Array,       # (V, O, K) int
                          dsafe_pair: jax.Array, dsafe_obst: jax.Array,
                          obst_normals=None, obst_dists=None):
    """Separation rows for an EXPLICIT side assignment, as PAIR-SPARSE row
    slabs: ``gi/gj (P, K, U)`` (the two vehicle blocks of each pair row)
    and ``gob (V, O, K, U)`` (the single block of each obstacle row), plus
    the rhs ``h = (h_pair (P, K), h_obst (V, O, K))``. The rows enforce
    ``n·(p_i - p_j) >= d`` for the given per-constraint side choice — the
    convex subproblem of the big-M MIQP once its binaries are fixed
    (MIQP.py:221-268). The slab form feeds the structured fused QP
    directly (qp.solve_qp_batched ``g_slabs``); :func:`_rows_from_selection`
    scatters them dense for the per-instance / oracle paths.
    """
    dtype = sys.b3.dtype
    sides = jnp.asarray(_SIDES, dtype)

    # vehicle pairs: axis-aligned separation (MIQP.py:257-268)
    nvec_p = sides[sel_pair]                             # (P, K, 2)
    # constraint: n·(p_i - p_j) >= d  =>  -n·(B_i u_i - B_j u_j) <= n·(c_i-c_j) - d
    gi = -jnp.einsum("pky,pkyu->pku", nvec_p, sys.b3i)
    gj = jnp.einsum("pky,pkyu->pku", nvec_p, sys.b3j)
    c_diff = sys.const3[sys.pair_i] - sys.const3[sys.pair_j]
    h_pair = jnp.einsum("pky,pky->pk", nvec_p, c_diff) - dsafe_pair[:, None]

    # obstacles: axis-aligned circle mode or rotated rectangle faces
    if obst_normals is None:
        nvec_o = sides[sel_obst]                         # (V, O, K, 2)
        d_o = dsafe_obst[:, :, None]                     # (V, O, 1)
    else:
        nvec_o = obst_normals.astype(dtype)[
            jnp.arange(sel_obst.shape[1])[None, :, None], sel_obst]
        d_o = obst_dists.astype(dtype)[
            jnp.arange(sel_obst.shape[0])[:, None, None],
            jnp.arange(sel_obst.shape[1])[None, :, None], sel_obst]
    gob = -jnp.einsum("voky,vkyu->voku", nvec_o, sys.b3)
    rel_c = sys.const3[:, None] - sys.obst_pos[None]
    h_obst = jnp.einsum("voky,voky->vok", nvec_o, rel_c) - d_o
    return gi, gj, gob, h_pair, h_obst


def _rows_from_selection(sys: con.ConstraintSystem,
                         sel_pair: jax.Array,       # (P, K) int in [0, 4)
                         sel_obst: jax.Array,       # (V, O, K) int
                         dsafe_pair: jax.Array, dsafe_obst: jax.Array,
                         obst_normals=None, obst_dists=None):
    """Dense ``(G (C, n), h (C,))`` rows for an explicit side assignment
    (thin scatter over :func:`_slabs_from_selection`; the enumeration
    oracle in tests/test_miqp.py brute-forces all assignments through
    this)."""
    v = sys.b3.shape[0]
    gi, gj, gob, h_pair, h_obst = _slabs_from_selection(
        sys, sel_pair, sel_obst, dsafe_pair, dsafe_obst,
        obst_normals, obst_dists)
    G = con.scatter_slabs(v, gi, gj, gob, dtype=sys.b3.dtype)
    h = jnp.concatenate([h_pair.reshape(-1), h_obst.reshape(-1)])
    return G, h


def _select_from_trajectory(sys: con.ConstraintSystem, u_ref: jax.Array,
                            obst_normals=None, obst_dists=None,
                            obst_sides=None, consistent_lateral=False,
                            u_max=None, lat_commit=None):
    """Heuristic side assignment from the geometry at ``u_ref``.

    ``obst_sides``: optional subset of side indices the obstacle selection
    may use (e.g. (2, 3) = lateral faces only) — the candidate restriction
    of :func:`solve_side_selection`'s first round.

    ``consistent_lateral``: commit each (vehicle, obstacle) to ONE lateral
    face for the WHOLE horizon — the side maximizing the worst-case margin
    ``min_k (n_s·delta_k - d_s)`` (``"flip"`` = the other side for
    crossing obstacles). A per-step argmax flips sides when an obstacle
    crosses the vehicle's path (selecting e.g. above-then-below, which no
    dynamically-feasible trajectory realizes); an optimal integer
    assignment in a crossing conflict holds one lateral side throughout
    (found by the randomized enumeration audit, tests/test_miqp.py).

    Side score: ``n_s·delta - d_s`` (signed satisfaction margin of face s).
    A face that is violated at ``u_ref`` is selectable only if it is
    REACHABLE — the margin the QP can recover through the controls,
    estimated as ``||n_s · B_k||_1 * u_max``, covers the deficit. With
    axis-aligned faces this reduces to the geometric fact that steering
    cannot move a constant-speed vehicle along its own track (the
    track-aligned gradient rows are ~0, so unsatisfied longitudinal faces
    are un-actionable); with rotated obstacle frames a "longitudinal" face
    can carry a large lateral gradient component and becomes correctly
    selectable (enumeration-audit counterexample, tests/test_miqp.py).
    Without ``u_max`` the conservative satisfied-only rule is applied to
    the longitudinal faces.
    """
    pos = con.positions(sys, u_ref)
    d_pair = pos[sys.pair_i] - pos[sys.pair_j]           # (P, K, 2)
    sel_pair = jnp.argmax(select_sides(d_pair), axis=-1)
    d_obst = pos[:, None] - sys.obst_pos[None]           # (V, O, K, 2)
    if obst_normals is None:
        normals = jnp.broadcast_to(jnp.asarray(_SIDES, d_obst.dtype),
                                   d_obst.shape[:-1] + (4, 2))
        dists = jnp.broadcast_to(
            jnp.sqrt(sys.dsafe2_obst)[:, :, None, None],
            d_obst.shape[:-1] + (4,))
    else:
        normals = jnp.broadcast_to(obst_normals[None, :, None],
                                   d_obst.shape[:-1] + (4, 2))
        dists = jnp.broadcast_to(obst_dists[:, :, None],
                                 d_obst.shape[:-1] + (4,))
    score = jnp.einsum("...sy,...y->...s", normals, d_obst) - dists
    neg_inf = jnp.asarray(-jnp.inf, score.dtype)

    def committed_side(mode):
        """ONE lateral face per (vehicle, obstacle) for the whole horizon:
        the side maximizing the worst-case margin (mode "flip" = the other
        side for crossing obstacles, whose per-step lateral preference is
        not constant — the worst-case margin at u_ref cannot tell which
        side is reachable, so both are probed as candidates)."""
        worst = jnp.min(score[..., 2:4], axis=2)         # (V, O, 2)
        pick = 2 + jnp.argmax(worst, axis=-1)            # (V, O)
        if mode == "flip":
            per_step = jnp.argmax(score[..., 2:4], axis=-1)     # (V, O, K)
            crossing = jnp.any(per_step != per_step[..., :1], axis=-1)
            pick = jnp.where(crossing, 5 - pick, pick)
        return pick

    if consistent_lateral:
        pick = committed_side(consistent_lateral)
        sel_obst = jnp.broadcast_to(pick[..., None], score.shape[:-1])
        return sel_pair, sel_obst
    if lat_commit is not None:
        # Per-step choice among {behind, ahead, ONE committed lateral
        # side}: a per-step argmax over both lateral faces flips sides
        # mid-horizon when the obstacle drifts across the path (e.g.
        # lateral 3 on steps 1-2 then 2 on step 3) — an assignment no
        # dynamically-feasible trajectory satisfies. Optimal integer
        # assignments are lon-prefix / committed-lateral / lon-suffix
        # shaped (enumeration audit, tests/test_miqp.py).
        other = 5 - committed_side(lat_commit)           # (V, O) excluded
        excl = jnp.arange(4)[None, None, None, :] == other[..., None, None]
        score = jnp.where(excl, neg_inf, score)
    if u_max is not None:
        # reachability: margin recoverable by the controls, per face row
        grad = jnp.einsum("voksy,vkyu->voksu", normals, sys.b3)
        cap = jnp.sum(jnp.abs(grad), -1) * u_max[:, None, None, None]
        # Rank reachable faces by margin PLUS a correctability credit: at a
        # near-tie between a barely-actionable face and one the controls
        # push hard (e.g. a longitudinal vs a late-horizon lateral face),
        # the QP resolves the heavily-actuated face but not the other —
        # prefer it upfront (enumeration-audit counterexample).
        score = jnp.where(score + cap < 0, neg_inf, score + 0.3 * cap)
    else:
        lon = jnp.arange(4) < 2
        score = jnp.where(lon & (score < 0), neg_inf, score)
    if obst_sides is not None:
        mask = jnp.zeros((4,), bool).at[jnp.asarray(obst_sides)].set(True)
        score = jnp.where(mask, score, neg_inf)
    sel_obst = jnp.argmax(score, axis=-1)
    return sel_pair, sel_obst


def rectangle_obstacle_geometry(obstacles: jax.Array,   # (O, 6) table
                                veh_speeds: jax.Array,  # (V,)
                                veh_length: jax.Array,  # (V,)
                                veh_width: jax.Array,   # (V,)
                                dt: float):
    """Rotated-rectangle obstacle faces of the big-M MIQP (obstAsQCQP=0).

    Reference MIQP.py:233-253: face distances are the obstacle HALF
    dimensions augmented by the vehicle half-diagonal ``RVeh`` and a
    sampling-chord term ``l_cord = (v_veh + v_obst) * dt`` (cos(pi/4)/2 of
    it per face, floored at l_cord/2); face normals are the obstacle's
    rotated axes (+-(c, s), +-(-s, c)).

    Returns (normals (O, 4, 2), dists (V, O, 4)) ordered to match
    ``_SIDES`` (+x', -x', +y', -y' in the obstacle frame).
    """
    import math

    heading = obstacles[:, 2]
    c, s = jnp.cos(heading), jnp.sin(heading)
    normals = jnp.stack([
        jnp.stack([c, s], -1), jnp.stack([-c, -s], -1),
        jnp.stack([-s, c], -1), jnp.stack([s, -c], -1)], axis=1)  # (O, 4, 2)

    r_veh = 0.5 * jnp.hypot(veh_length, veh_width)       # (V,)
    half_l = 0.5 * obstacles[:, 4]
    half_w = 0.5 * obstacles[:, 5]
    l_cord = (veh_speeds[:, None] + obstacles[None, :, 3]) * dt  # (V, O)
    pad = l_cord * (math.cos(math.pi / 4) / 2)
    l = jnp.maximum(half_l[None] + r_veh[:, None] + pad, l_cord / 2)
    w = jnp.maximum(half_w[None] + r_veh[:, None] + pad, l_cord / 2)
    dists = jnp.stack([l, l, w, w], axis=-1)             # (V, O, 4)
    return normals, dists


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


def _assemble_qp(sys: con.ConstraintSystem, ref_points, q_weight, q_final,
                 r_weight, u0, u_max, *, du_lim, slack_weight, slack_ub,
                 dtype):
    """Fixed (selection-independent) parts of the side-selection QP:
    objective, box bounds, rate rows, slack column."""
    v, hp, _, hu = sys.b3.shape
    n = v * hu

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

    # Rate rows: |u_k - u_{k-1}| <= du_lim (first row anchored at u0).
    D = (jnp.eye(hu, dtype=dtype) - jnp.eye(hu, k=-1, dtype=dtype))
    D_full = jax.scipy.linalg.block_diag(*([D] * v))
    rate_rhs0 = jnp.zeros((n,), dtype)
    rate_rhs0 = rate_rhs0.at[jnp.arange(v) * hu].set(u0.astype(dtype))
    G_rate = jnp.concatenate([D_full, -D_full], 0)
    G_rate = jnp.concatenate(
        [G_rate, jnp.zeros((2 * n, 1), dtype)], 1)
    h_rate = jnp.concatenate([du_lim + rate_rhs0, du_lim - rate_rhs0])
    return P_qp, q_qp, lb, ub, slack_col, G_rate, h_rate, phi


def solve_fixed_sides(sys: con.ConstraintSystem, ref_points, q_weight,
                      q_final, r_weight, u0, u_max,
                      sel_pair: jax.Array, sel_obst: jax.Array, *,
                      du_lim: float,
                      slack_weight: float = 1e5, slack_ub: float = 1e8,
                      obst_normals=None, obst_dists=None,
                      dsafe_pair=None, dsafe_obst=None,
                      qp_max_iter: int = 30, qp_tol: float = 1e-8):
    """Solve the convex QP for ONE explicit side assignment.

    This is the subproblem a branch-and-bound MIQP solves at each integer
    leaf; vmapping it over all 4^C assignments gives the exact integer
    optimum on small instances — the oracle that validates the heuristic
    selection (tests/test_miqp.py). Returns (u, obj, slack, converged).
    """
    v, hp, _, hu = sys.b3.shape
    n = v * hu
    dtype = sys.b3.dtype
    P_qp, q_qp, lb, ub, slack_col, G_rate, h_rate, _ = _assemble_qp(
        sys, ref_points, q_weight, q_final, r_weight, u0, u_max,
        du_lim=du_lim, slack_weight=slack_weight, slack_ub=slack_ub,
        dtype=dtype)
    if dsafe_pair is None:
        dsafe_pair = jnp.sqrt(sys.dsafe2_pair)
    if dsafe_obst is None:
        dsafe_obst = jnp.sqrt(sys.dsafe2_obst)
    G_sep, h_sep = _rows_from_selection(sys, sel_pair, sel_obst, dsafe_pair,
                                        dsafe_obst, obst_normals, obst_dists)
    G = jnp.concatenate([jnp.concatenate([G_sep, slack_col], axis=1),
                         G_rate], axis=0)
    h = jnp.concatenate([h_sep, h_rate])
    sol = qp.solve_qp(P_qp, q_qp, G, h, lb, ub,
                      max_iter=qp_max_iter, tol=qp_tol)
    return sol.x[:n], sol.obj, sol.x[n], sol.converged


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
                         multi_candidate: bool = True,
                         obst_normals=None, obst_dists=None,
                         dsafe_pair=None, dsafe_obst=None,
                         qp_max_iter: int = 30,
                         qp_tol: float = 1e-8,
                         qp_fixed_iters: int | None = None,
                         qp_candidate_iters: int | None = None,
                         qp_correctors: int = 0,
                         qp_use_pallas: bool | None = None
                         ) -> SideSelectionResult:
    """Solve the side-selection convex program for one scenario instance.

    This is the B = 1 view of :func:`solve_side_selection_stacked` — ONE
    implementation of the candidate set, rank rule, incumbent scan and
    fixed-point check serves both entry points (VERDICT r4 next #3: the
    two ~250-line near-twins had already drifted once, silently dropping
    the per-instance path's calibration knobs). All solver knobs —
    ``qp_fixed_iters`` / ``qp_candidate_iters`` / ``qp_correctors``
    (``config.TUNED_F32_SIDE_SELECTION``) — therefore reach the
    per-instance path identically.

    ``obst_normals``/``obst_dists`` (from
    :func:`rectangle_obstacle_geometry`) switch obstacle avoidance to the
    reference's rotated-rectangle mode (obstAsQCQP=0, MIQP.py:233-253);
    default is the circular-QCQP mode (obstAsQCQP=1).

    ``dsafe_pair (P,)`` / ``dsafe_obst (V, O)``: separation distances for
    the half-plane rows. The reference MIQP builds its rows from the RAW
    safety distances — ``dsafeExtra`` never enters them (MIQP.py:226-227,
    260, vs the SCP's +extra at SCP_controller.py:317) — so the engine
    passes the raw distances here; the default (None) falls back to the
    system's padded distances. Feasibility is evaluated at the same
    distances the rows enforce.
    """
    def b1(x):
        return (None if x is None
                else jax.tree_util.tree_map(lambda a: a[None], x))

    res = solve_side_selection_stacked(
        b1(sys), ref_points[None], q_weight[None], q_final[None],
        r_weight[None], u0[None], u_max[None], u_init[None],
        du_lim=du_lim, slack_weight=slack_weight, slack_ub=slack_ub,
        constraint_tolerance=constraint_tolerance, n_rounds=n_rounds,
        multi_candidate=multi_candidate,
        obst_normals=b1(obst_normals), obst_dists=b1(obst_dists),
        dsafe_pair=b1(dsafe_pair), dsafe_obst=b1(dsafe_obst),
        qp_max_iter=qp_max_iter, qp_tol=qp_tol,
        qp_fixed_iters=qp_fixed_iters,
        qp_candidate_iters=qp_candidate_iters,
        qp_correctors=qp_correctors, qp_use_pallas=qp_use_pallas)
    return jax.tree_util.tree_map(lambda a: a[0], res)


def solve_side_selection_stacked(
        sys: con.ConstraintSystem,        # batched: leading axis B on leaves
        ref_points: jax.Array,            # (B, V, Hp, 2)
        q_weight, q_final, r_weight,      # (B, V) each
        u0: jax.Array,                    # (B, V)
        u_max: jax.Array,                 # (B, V)
        u_init: jax.Array,                # (B, V*Hu)
        *,
        du_lim: float,
        slack_weight: float = 1e5,
        slack_ub: float = 1e8,
        constraint_tolerance: float = 2 * 2.1e-3,
        n_rounds: int = 2,
        multi_candidate: bool = True,
        obst_normals=None, obst_dists=None,   # (B, ...) batched when given
        dsafe_pair=None, dsafe_obst=None,     # (B, P) / (B, V, O)
        qp_max_iter: int = 30,
        qp_tol: float = 1e-8,
        qp_fixed_iters: int | None = None,
        qp_candidate_iters: int | None = None,
        qp_correctors: int = 0,
        qp_use_pallas: bool | None = None) -> SideSelectionResult:
    """Natively-batched :func:`solve_side_selection` (leading batch axis B).

    Same candidate/reselection/incumbent logic, but every QP goes through
    :func:`qp.solve_qp_batched` — the fused TPU IPM with in-kernel K
    formation — instead of per-instance ``solve_qp`` under vmap. The five
    first-round candidate assignments batch along the instance axis (one
    5B-wide solve), which is exactly the subset of integer leaves a
    branch-and-bound probes first, solved as one kernel launch sequence.

    Structure statement: the separation rows have the SCP pair/obstacle
    slab layout (each row touches one or two hu-wide vehicle blocks +
    the slack column), and the steering-rate rows ``|u_k - u_{k-1}| <=
    du_lim`` (hard, slack coefficient 0) are per-vehicle single-block
    slabs of the same height when hp == hu — so they ride the fused
    kernel's ``g_struct`` path as 2V extra "obstacle" slabs whose
    bidiagonal D blocks are also block-lower-triangular in (k, u).

    ``qp_fixed_iters``/``qp_correctors``: the f32 TPU calibration knobs
    (see config.TUNED_F32_OVERRIDES); None runs the adaptive while-loop
    solver (the CPU/f64 parity configuration, matching the per-instance
    path's solves exactly).
    """
    b, v, hp, _, hu = sys.b3.shape
    n = v * hu
    dtype = u_init.dtype
    n_obst = sys.obst_pos.shape[1]

    P_qp, q_qp, lb, ub, slack_col, G_rate, h_rate, phi = jax.vmap(
        lambda s, rp, qw, qf, rw, u0v, um: _assemble_qp(
            s, rp, qw, qf, rw, u0v, um, du_lim=du_lim,
            slack_weight=slack_weight, slack_ub=slack_ub, dtype=dtype)
    )(sys, ref_points, q_weight, q_final, r_weight, u0, u_max)
    if dsafe_pair is None:
        dsafe_pair = jnp.sqrt(sys.dsafe2_pair)
    if dsafe_obst is None:
        dsafe_obst = jnp.sqrt(sys.dsafe2_obst)
    # selection scores + feasibility evaluation run at the SAME distances
    # the rows enforce
    sys_sel = sys._replace(dsafe2_pair=dsafe_pair ** 2,
                           dsafe2_obst=dsafe_obst ** 2)

    # Static row-structure statement for the fused QP: pair slabs, then
    # vehicle-major obstacle slabs, then the rate rows as 2V single-block
    # slabs (+D blocks, then -D blocks). All slabs are hp rows tall, which
    # the rate rows satisfy only when hp == hu.
    g_struct = None
    if hp == hu:
        g_struct = (tuple(con._static_pairs(v)),
                    tuple([vv for vv in range(v) for _ in range(n_obst)]
                          + list(range(v)) * 2),
                    hp, hu, True)

    def _vsel(u_ref, **kw):
        """vmapped heuristic selection (u_max-aware variants)."""
        if obst_normals is None:
            return jax.vmap(lambda s, u, m: _select_from_trajectory(
                s, u, None, None, u_max=m, **kw))(sys_sel, u_ref, u_max)
        return jax.vmap(lambda s, u, on, od, m: _select_from_trajectory(
            s, u, on, od, u_max=m, **kw))(
                sys_sel, u_ref, obst_normals, obst_dists, u_max)

    def _vsel_nomax(u_ref, **kw):
        """vmapped selection for the committed-lateral candidates."""
        if obst_normals is None:
            return jax.vmap(lambda s, u: _select_from_trajectory(
                s, u, None, None, **kw))(sys_sel, u_ref)
        return jax.vmap(lambda s, u, on, od: _select_from_trajectory(
            s, u, on, od, **kw))(sys_sel, u_ref, obst_normals, obst_dists)

    def build_slabs(sel_pair, sel_obst):
        """Per-instance slabs for an assignment batch: gi/gj (B, P, K, U),
        gob5 (B, V, O, K, U), h_pair (B, P, K), h_obst (B, V, O, K)."""
        if obst_normals is None:
            return jax.vmap(lambda s, sp, so, dp, do: _slabs_from_selection(
                s, sp, so, dp, do))(
                    sys, sel_pair, sel_obst, dsafe_pair, dsafe_obst)
        return jax.vmap(_slabs_from_selection)(
            sys, sel_pair, sel_obst, dsafe_pair, dsafe_obst,
            obst_normals, obst_dists)

    # selection-independent rate slabs (per-vehicle bidiagonal blocks) and
    # the per-row slack mask: separation rows carry the implicit -1 slack
    # coefficient, the HARD rate rows carry 0 (qp g_slack_mask contract)
    D_blk = jnp.eye(hu, dtype=dtype) - jnp.eye(hu, k=-1, dtype=dtype)
    rate_slabs1 = jnp.concatenate(
        [jnp.broadcast_to(D_blk, (v, hu, hu)),
         jnp.broadcast_to(-D_blk, (v, hu, hu))])             # (2V, hu, hu)
    slack_mask = _np.concatenate(
        [_np.ones((sys.dsafe2_pair.shape[1] + v * n_obst) * hp),
         _np.zeros(2 * n)])

    def build_rows(sel_pair, sel_obst):
        """Dense rows + rhs + flat slab statement for one assignment batch.

        Returns (G, h, slabs) where slabs = (gi, gj, gob_flat) with
        gob_flat (B, V*O + 2V, K, U) in the g_struct obst_veh order
        (obstacles v-major, then the +D and -D rate blocks) — the dense G
        is the fallback operand and dead-code-eliminates when the
        structured path consumes the slabs.
        """
        gi, gj, gob5, h_pair, h_obst = build_slabs(sel_pair, sel_obst)
        bsz = gi.shape[0]
        G_sep = jax.vmap(
            lambda a, c, g: con.scatter_slabs(v, a, c, g, dtype=dtype)
        )(gi, gj, gob5)
        h_sep = jnp.concatenate(
            [h_pair.reshape(bsz, -1), h_obst.reshape(bsz, -1)], axis=1)
        rep = bsz // b
        G = jnp.concatenate([
            jnp.concatenate([G_sep, _tile_b(slack_col, rep)], axis=2),
            _tile_b(G_rate, rep)], axis=1)
        h = jnp.concatenate([h_sep, _tile_b(h_rate, rep)], axis=1)
        slabs = None
        if hp == hu:
            gob_flat = jnp.concatenate([
                gob5.reshape(bsz, v * n_obst, hp, hu),
                jnp.broadcast_to(rate_slabs1, (bsz, 2 * v, hu, hu))],
                axis=1)
            slabs = (gi, gj, gob_flat)
        return G, h, slabs

    def _tile_b(x, rep):
        if rep == 1:
            return x
        return jnp.broadcast_to(
            x[None], (rep,) + x.shape).reshape((rep * b,) + x.shape[1:])

    def solve_batch(G, h, u_ref, q_, lb_, ub_, phi_,
                    fixed_iters=None, slabs=None):
        fixed_iters = fixed_iters or qp_fixed_iters
        x0 = jnp.concatenate(
            [u_ref, jnp.zeros((u_ref.shape[0], 1), dtype)], axis=1)
        # P stated by p_blocks (+ zero slack tail): the dense tiled
        # (n_cand*B, n+1, n+1) P never materializes on the fused path
        sol = qp.solve_qp_batched(
            None, q_, G, h, lb_, ub_,
            max_iter=qp_max_iter, tol=qp_tol, x0=x0,
            fixed_iters=fixed_iters, correctors=qp_correctors,
            g_slabs=slabs, g_slack_mask=slack_mask if slabs else None,
            p_blocks=2.0 * phi_, slack_schur=True,
            # fixed-iteration (calibrated f32) solves use the cheap
            # rp-recurrence certificate like the SCP hot path — the honest
            # recomputation costs two full G passes per solve and only
            # feeds the `converged` diagnostic
            certificate=fixed_iters is None,
            g_struct=g_struct, use_pallas=qp_use_pallas)
        ok = jnp.all(jnp.isfinite(sol.x), axis=1)
        u_new = jnp.where(ok[:, None], sol.x[:, :n], u_ref)
        return u_new, sol.obj, sol.x[:, n], sol.converged & ok, sol.iters

    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    def rank(obj, slack):
        # hard = within the QCQP tolerance (see solve_side_selection.rank)
        hard = slack < jnp.asarray(constraint_tolerance, dtype)
        return jnp.where(hard, obj, big * 0.5 + slack)

    def one_round(carry, _):
        u_ref, it_acc = carry
        sel_pair_r, sel_obst_r = _vsel(u_ref, lat_commit=True)
        G, h, slabs = build_rows(sel_pair_r, sel_obst_r)
        u_new, obj, slack, conv, iters = solve_batch(
            G, h, u_ref, q_qp, lb, ub, phi, slabs=slabs)
        return ((u_new, it_acc + iters),
                (u_new, obj, slack, conv, sel_pair_r, sel_obst_r))

    use_candidates = multi_candidate and n_obst > 0
    if use_candidates:
        sel_pair0, sel_a = _vsel(u_init, lat_commit=True)
        _, sel_b = _vsel(u_init, lat_commit="flip")
        _, sel_lon = _vsel(u_init, obst_sides=(0, 1))
        _, sel_lat_c = _vsel_nomax(u_init, consistent_lateral=True)
        _, sel_lat_f = _vsel_nomax(u_init, consistent_lateral="flip")
        cand_obst = jnp.stack([sel_a, sel_b, sel_lon, sel_lat_c,
                               sel_lat_f])               # (5, B, V, O, K)
        n_cand = cand_obst.shape[0]

        def tile(x):
            return jnp.broadcast_to(
                x[None], (n_cand,) + x.shape).reshape(
                    (n_cand * b,) + x.shape[1:])

        G5, h5, slabs5 = jax.vmap(
            lambda so: build_rows(sel_pair0, so))(cand_obst)
        Gc = G5.reshape((n_cand * b,) + G5.shape[2:])
        hc = h5.reshape(n_cand * b, -1)
        slabs_c = (None if slabs5 is None else tuple(
            x.reshape((n_cand * b,) + x.shape[2:]) for x in slabs5))

        # Candidate solves only need RANKING fidelity — the winner is
        # refined at full accuracy by the reselection round(s), and a
        # not-yet-converged objective is an overestimate (conservative for
        # the incumbent comparison) — so a calibrated lower iteration
        # count here cuts the 5-candidate phase's cost.
        u5, obj5, sl5, cv5, it5 = solve_batch(
            Gc, hc, tile(u_init),
            tile(q_qp), tile(lb), tile(ub), tile(phi),
            fixed_iters=qp_candidate_iters, slabs=slabs_c)
        bi = jnp.arange(b)
        pick = jnp.argmin(rank(obj5, sl5).reshape(n_cand, b), axis=0)
        u0_ = u5.reshape(n_cand, b, n)[pick, bi]
        obj0 = obj5.reshape(n_cand, b)[pick, bi]
        slack0 = sl5.reshape(n_cand, b)[pick, bi]
        conv0 = cv5.reshape(n_cand, b)[pick, bi]
        qp_its0 = jnp.sum(it5.reshape(n_cand, b), axis=0)
        sel0 = (sel_pair0, cand_obst[pick, bi])
        scan_rounds = n_rounds - 1
    else:
        u0_ = u_init
        obj0 = jnp.full((b,), big, dtype)
        slack0 = jnp.full((b,), big, dtype)
        conv0 = jnp.zeros((b,), bool)
        qp_its0 = jnp.zeros((b,), jnp.int32)
        sel0 = _vsel(u_init, lat_commit=True)
        scan_rounds = n_rounds

    if scan_rounds > 0:
        (_, qp_its), ys = jax.lax.scan(one_round, (u0_, qp_its0), None,
                                       length=scan_rounds)
        # best incumbent across the initial pick and every reselection
        # round, per instance (B&B keeps its incumbent)
        all_u = jnp.concatenate([u0_[None], ys[0]])        # (R+1, B, n)
        all_obj = jnp.concatenate([obj0[None], ys[1]])
        all_slack = jnp.concatenate([slack0[None], ys[2]])
        all_conv = jnp.concatenate([conv0[None], ys[3]])
        all_selp = jnp.concatenate([sel0[0][None], ys[4]])
        all_selo = jnp.concatenate([sel0[1][None], ys[5]])
        bi = jnp.arange(b)
        best = jnp.argmin(rank(all_obj, all_slack), axis=0)  # (B,)
        u = all_u[best, bi]
        obj = all_obj[best, bi]
        slack = all_slack[best, bi]
        conv = all_conv[best, bi]
        sel_last = (all_selp[best, bi], all_selo[best, bi])
    else:
        u, obj, slack, conv, qp_its = u0_, obj0, slack0, conv0, qp_its0
        sel_last = sel0

    # fixed-point check (see solve_side_selection): identical induced
    # selection, or the incumbent already satisfies every induced row —
    # evaluated on the slabs directly (the dense scatter never builds)
    sel_pair_f, sel_obst_f = _vsel(u, lat_commit=True)
    identical = (jnp.all(sel_last[0] == sel_pair_f, axis=(1, 2))
                 & jnp.all(sel_last[1] == sel_obst_f, axis=(1, 2, 3)))
    gi_f, gj_f, gob_f, hp_f, ho_f = build_slabs(sel_pair_f, sel_obst_f)
    uv_f = u.reshape(b, v, hu)
    pairs_f = con._static_pairs(v)
    if pairs_f:
        pi_f = jnp.asarray([i for i, _ in pairs_f], jnp.int32)
        pj_f = jnp.asarray([j for _, j in pairs_f], jnp.int32)
        res_p = (jnp.einsum("bpku,bpu->bpk", gi_f, uv_f[:, pi_f])
                 + jnp.einsum("bpku,bpu->bpk", gj_f, uv_f[:, pj_f])) - hp_f
        max_p = jnp.max(res_p.reshape(b, -1), axis=1, initial=-jnp.inf)
    else:
        max_p = jnp.full((b,), -jnp.inf, dtype)
    res_o = jnp.einsum("bvoku,bvu->bvok", gob_f, uv_f) - ho_f
    max_o = jnp.max(res_o.reshape(b, -1), axis=1, initial=-jnp.inf)
    induced_ok = jnp.maximum(max_p, max_o) <= constraint_tolerance
    sides_stable = identical | induced_ok
    ev = jax.vmap(lambda s, uu: con.evaluate(
        s, uu, constraint_tolerance, compat_q5=False))(sys_sel, u)
    return SideSelectionResult(u=u, obj=obj, slack=slack,
                               feasible=ev.feasible, converged=conv,
                               rounds=jnp.full((b,), n_rounds),
                               sides_stable=sides_stable,
                               qp_iters=qp_its)
