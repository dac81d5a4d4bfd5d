"""SCP outer loop: iterated convexification with an exact-penalty slack.

Reference: ``SCPcontroller.SCP_optimizer`` (SCP_controller.py:74-197). Each
iteration linearizes the concave avoidance constraints at the current iterate,
appends one slack variable ω (weight 1e5) shared by all avoidance rows
(SCP_controller.py:123-127), solves the convex QP, and stops when the
exact-penalty merit ``objective + w * max_violation`` decreases by less than
``delta_tol`` while the worst violation is inside tolerance
(SCP_controller.py:159-195; the single-vehicle escape branch at 191-192 also
stops on a stalled merit with violation *above* tolerance).

TPU-first: the loop is a ``jax.lax.while_loop`` over fixed-shape arrays; the
whole solver jits and ``vmap``s over scenario batches, with per-instance
``done`` masks so converged instances freeze while the batch continues.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from scp_tpu.ops import constraints as con
from scp_tpu.solvers import qp


class SCPProblem(NamedTuple):
    """One scenario instance's SCP data (vmap adds batch axes)."""
    sys: con.ConstraintSystem
    phi0: jax.Array    # (V, hu, hu) per-vehicle cost blocks
    psi0: jax.Array    # (V, hu)
    gamma0: jax.Array  # (V,)
    # Optional stage data for the banded (Riccati) KKT path
    # (qp.BandedData minus the per-iterate row coefficients):
    # (a_blk (V,NX,NX), b_blk (V,NX), qy (V,hp) = 2q/2q_final, ru (V,) = 2r)
    banded_pre: tuple | None = None


class SCPResult(NamedTuple):
    u: jax.Array              # (n,) final stacked controls
    feasible: jax.Array       # bool — exact constraints within tolerance
    converged: jax.Array      # bool — merit stop triggered before iteration cap
    obj: jax.Array            # tracking objective at u
    max_violation: jax.Array
    iters: jax.Array          # SCP iterations used
    qp_iters: jax.Array       # total inner-QP iterations
    qp_fails: jax.Array       # inner QPs that did not reach tolerance


class SCPTrace(NamedTuple):
    """Per-SCP-iteration diagnostic record (``solve_scp(trace=True)``).

    The TPU analog of the reference's per-iteration ``optimization_log`` /
    merit printout (SCP_controller.py:88-189,162) — its only observability
    into a misbehaving solve. All arrays have leading axis ``max_scp_iter``;
    entries past the stop are frozen and flagged inactive.
    """
    active: jax.Array         # (I,) bool — iteration actually ran
    obj: jax.Array            # (I,) QCQP objective after the iteration
    #   (the reference's per-iteration objValue / 'QCQP_ObjVal')
    max_violation: jax.Array  # (I,) worst constraint violation
    merit: jax.Array          # (I,) exact-penalty merit obj + w*viol
    delta: jax.Array          # (I,) merit decrease vs the previous iterate
    #   (the reference's 'delta', SCP_controller.py:161)
    qp_converged: jax.Array   # (I,) bool — inner QP certificate


def solve_scp(problem: SCPProblem, u_init: jax.Array, *,
              u_lim: float,
              max_scp_iter: int = 20,
              delta_tol: float = 1e-3,
              delta_tol_rel: float = 0.0,
              u_step_tol: float = 0.0,
              merit_patience: int = 0,
              keep_best: bool = False,
              slack_weight: float = 1e5,
              slack_ub: float = 1e8,
              constraint_tolerance: float = 2 * 2.1 * 1e-3,
              qp_max_iter: int = 30,
              qp_tol: float = 1e-8,
              qp_fixed_iters: int | None = None,
              qp_cheap_k: bool = False,
              qp_warm_dual: bool = False,
              qp_correctors: int = 0,
              qp_kkt: str = "dense",
              compat_q5: bool = True,
              axis_name: str | None = None,
              n_con_total: int | None = None,
              trace: bool = False):
    """Solve one SCP instance. Shapes are static; vmap for batches.

    ``qp_kkt``: ``"dense"`` (condensed O(n^3) factorization — the default
    and the golden-parity path), ``"banded"`` (the block-banded/Riccati
    formulation, ops/riccati.py — O(hp) factor work, requires
    ``problem.banded_pre``), or ``"auto"`` (per-instance: dense; the
    stacked path resolves auto to banded only where the fused dense
    kernel cannot run). Ignored in horizon-sharded mode (``axis_name``),
    which keeps the row-sharded dense formation.

    ``trace=True``: additionally return an :class:`SCPTrace` with the
    per-iteration (objective, max_violation, merit, delta, qp_converged)
    record — the reference's per-iteration merit printout / optimization
    log (SCP_controller.py:159-189) as structured arrays. The loop then
    runs as a fixed-length masked scan whose final state is identical to
    the while-loop's (entries past the stop are frozen and flagged
    inactive), so the traced result equals the untraced one.

    ``axis_name``: horizon-block SPMD mode (SURVEY.md §5 "long-context"
    analog) for use inside ``shard_map``: ``problem.sys`` holds only this
    shard's horizon block of the constraint system (``parallel.horizon.
    shard_system``), so linearization, constraint evaluation and the QP's
    constraint rows all run on hp/n_shards steps per device;
    ``n_con_total`` is the global avoidance-row count. Violation maxima and
    feasibility flags are pmax/psum-reduced so the merit/stop logic — and
    therefore the whole while loop — stays in lockstep across shards.

    ``delta_tol`` is the reference's absolute merit-decrease threshold
    (SCP_controller.py:83). In float32 the merit carries ~1e-7 relative
    noise, so absolute 1e-3 can be unreachable when the objective is ~1e5;
    set ``delta_tol_rel`` (e.g. 1e-5) to stop once the decrease is small
    *relative to the merit*, and/or ``u_step_tol`` (radians, e.g. 1e-5) to
    stop when the iterate itself has stopped moving — the scale-free
    criterion that works at any objective magnitude.

    ``merit_patience``: with a fixed-iteration f32 inner QP the merit
    oscillates at the plateau with amplitude slightly above the delta
    threshold, so the two-sided ``|delta|`` stop can fail to fire for the
    whole iteration cap. With patience k > 0, the loop also stops (when
    feasible) after k consecutive iterations that fail to improve the
    best-seen merit by the threshold — measured to cut capped instances
    from 20 to ~5 iterations at equal solution quality.
    """
    sys = problem.sys
    dtype = u_init.dtype
    v, hp, _, hu = sys.b3.shape
    n = v * hu
    n_con = sys.dsafe2_pair.shape[0] * hp + v * sys.obst_pos.shape[0] * hp
    single_veh = v == 1

    # Numerical nudge of u[0] (SCP_controller.py:75-76).
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    u_init = jnp.where(
        jnp.abs(u_init[0]) < eps,
        u_init.at[0].set(eps),
        u_init)

    # Fixed QP cost: blockdiag(2 * phi0) plus a zero slack row/col; the slack
    # enters linearly with weight ``slack_weight`` (SCP_controller.py:120-127).
    P_qp = jnp.zeros((n + 1, n + 1), dtype)
    for i in range(v):  # static unroll over vehicles
        P_qp = P_qp.at[i * hu:(i + 1) * hu, i * hu:(i + 1) * hu].set(
            2.0 * problem.phi0[i])
    q_qp = jnp.concatenate([problem.psi0.reshape(n),
                            jnp.array([slack_weight], dtype)])
    lb = jnp.concatenate([jnp.full((n,), -u_lim, dtype),
                          jnp.zeros((1,), dtype)])
    ub = jnp.concatenate([jnp.full((n,), u_lim, dtype),
                          jnp.full((1,), slack_ub, dtype)])
    slack_col = jnp.full((n_con, 1), -1.0, dtype)

    def reduce_ev(ev):
        """Global (feasible, max_violation) from a shard-local evaluation."""
        feas, mv = ev.feasible, ev.max_violation
        if axis_name is not None:
            mv = jax.lax.pmax(mv, axis_name)
            feas = jax.lax.psum(jnp.where(feas, 0, 1), axis_name) == 0
        return feas, mv

    ev0 = con.evaluate(sys, u_init, constraint_tolerance, compat_q5)
    feas0, viol0 = reduce_ev(ev0)
    obj_init = con.objective(problem.phi0, problem.psi0, problem.gamma0, u_init)

    class Carry(NamedTuple):
        u: jax.Array
        obj: jax.Array
        viol: jax.Array
        feasible: jax.Array
        done: jax.Array
        it: jax.Array
        qp_iters: jax.Array
        qp_fails: jax.Array
        best_merit: jax.Array
        stall: jax.Array
        z: jax.Array
        best: "tuple | None" = None   # (u, obj, viol, feasible) best-merit

    m_qp = n_con + 2 * (n + 1)
    best0 = ((u_init, obj_init, viol0, feas0) if keep_best else None)
    init = Carry(u=u_init, obj=obj_init, viol=viol0,
                 feasible=feas0, done=jnp.array(False),
                 it=jnp.array(0), qp_iters=jnp.array(0),
                 qp_fails=jnp.array(0),
                 best_merit=obj_init + slack_weight * viol0,
                 stall=jnp.array(0),
                 z=jnp.zeros((m_qp,), dtype),
                 best=best0)

    use_banded = (qp_kkt == "banded" and problem.banded_pre is not None
                  and axis_name is None)

    def body(c: Carry) -> Carry:
        G_c, rhs = con.linearize(sys, c.u)
        G = jnp.concatenate([G_c, slack_col], axis=1)
        x0 = jnp.concatenate([c.u, jnp.zeros((1,), dtype)])
        if use_banded:
            a_blk, b_blk, qy, ru = problem.banded_pre
            yp, yo = con.linearize_ycoefs(sys, c.u)
            banded_arg = qp.BandedData(a_blk, b_blk, yp, yo, qy, ru)
        else:
            banded_arg = None
        sol = qp.solve_qp(P_qp, q_qp, G, rhs, lb, ub,
                          max_iter=qp_max_iter, tol=qp_tol, x0=x0,
                          z0=c.z if qp_warm_dual else None,
                          fixed_iters=qp_fixed_iters, cheap_k=qp_cheap_k,
                          correctors=qp_correctors,
                          axis_name=axis_name, mg_total=n_con_total,
                          banded=banded_arg)
        # NaN guard: a diverged inner solve must not poison the iterate.
        # (sol.x is replicated across horizon shards, so no cross-shard
        # reduction is needed here.)
        ok = jnp.all(jnp.isfinite(sol.x))
        u_new = jnp.where(ok, sol.x[:n], c.u)
        ev_local = con.evaluate(sys, u_new, constraint_tolerance, compat_q5)
        feas_new, viol_new = reduce_ev(ev_local)
        obj_new = con.objective(problem.phi0, problem.psi0, problem.gamma0,
                                u_new)
        # Merit decrease (SCP_controller.py:161): previous-iterate merit minus
        # current merit, both with the exact-penalty violation term.
        merit_prev = c.obj + slack_weight * c.viol
        merit_new = obj_new + slack_weight * viol_new
        delta = merit_prev - merit_new
        thresh = delta_tol + delta_tol_rel * jnp.abs(merit_new)
        small_delta = (jnp.abs(delta) < thresh) | ~ok
        if u_step_tol > 0:
            small_step = jnp.max(jnp.abs(u_new - c.u)) < u_step_tol
            small_delta = small_delta | small_step
        if merit_patience > 0:
            improved = (c.best_merit - merit_new) >= thresh
            stall = jnp.where(improved, 0, c.stall + 1)
            small_delta = small_delta | (stall >= merit_patience)
        else:
            stall = c.stall
        best_merit = jnp.minimum(c.best_merit, merit_new)
        if keep_best:
            better = merit_new < c.best_merit
            best = tuple(
                jnp.where(better, new_v, old_v) for new_v, old_v in zip(
                    (u_new, obj_new, viol_new, feas_new), c.best))
        else:
            best = None
        if single_veh:
            stop = small_delta  # both reference break branches fire
        else:
            stop = small_delta & (viol_new <= constraint_tolerance)
        carry = Carry(
            u=u_new, obj=obj_new, viol=viol_new, feasible=feas_new,
            done=stop, it=c.it + 1, qp_iters=c.qp_iters + sol.iters,
            qp_fails=c.qp_fails + jnp.where(sol.converged, 0, 1),
            best_merit=best_merit, stall=stall, z=sol.z, best=best)
        extras = (obj_new, viol_new, merit_new, delta, sol.converged)
        return carry, extras

    def cond(c: Carry):
        return (c.it < max_scp_iter) & (~c.done)

    if trace:
        # fixed-length masked scan: identical final state to the while
        # loop (frozen after the stop), plus the per-iteration record
        def scan_body(c, _):
            active = cond(c)
            c2, ex = body(c)
            c_new = jax.tree_util.tree_map(
                lambda a, b: jnp.where(active, a, b), c2, c)
            rec = (active,) + tuple(
                jnp.where(active, e, jnp.zeros_like(e)) for e in ex)
            return c_new, rec

        out, recs = jax.lax.scan(scan_body, init, None,
                                 length=max_scp_iter)
        trace_out = SCPTrace(*recs)
    else:
        out = jax.lax.while_loop(cond, lambda c: body(c)[0], init)
    if keep_best:
        u_f, obj_f, viol_f, feas_f = out.best
    else:
        u_f, obj_f, viol_f, feas_f = out.u, out.obj, out.viol, out.feasible
    res = SCPResult(u=u_f, feasible=feas_f, converged=out.done,
                    obj=obj_f, max_violation=viol_f, iters=out.it,
                    qp_iters=out.qp_iters, qp_fails=out.qp_fails)
    if trace:
        return res, trace_out
    return res


def solve_scp_stacked(problem: SCPProblem, u_init: jax.Array, *,
                      u_lim: float,
                      max_scp_iter: int = 20,
                      delta_tol: float = 1e-3,
                      delta_tol_rel: float = 0.0,
                      u_step_tol: float = 0.0,
                      merit_patience: int = 0,
                      keep_best: bool = False,
                      slack_weight: float = 1e5,
                      slack_ub: float = 1e8,
                      constraint_tolerance: float = 2 * 2.1 * 1e-3,
                      qp_max_iter: int = 30,
                      qp_tol: float = 1e-8,
                      qp_fixed_iters: int | None = None,
                      qp_cheap_k: bool = False,
                      qp_warm_dual: bool = False,
                      qp_correctors: int = 0,
                      qp_kkt: str = "dense",
                      qp_certificate: bool = False,
                      qp_use_pallas: bool | None = None,
                      compat_q5: bool = True) -> SCPResult:
    """Natively-batched :func:`solve_scp` (leading batch axis).

    Functionally equivalent to ``vmap(solve_scp)`` — same merit/violation
    stopping, per-lane freeze semantics — but the inner QP runs through
    :func:`qp.solve_qp_batched`, which controls TPU memory layout explicitly
    (lane-layout factors/matvecs, no per-iteration transposes). Measured
    ~1.4x faster than the vmapped path on a v5e at B=1024.
    """
    if qp_cheap_k:
        raise NotImplementedError(
            "qp_cheap_k (single-pass bf16 KKT) is a per-instance-path "
            "experiment — measured to break SCP convergence (BENCHMARKS.md) "
            "— and is not supported by the stacked/fused QP path")
    sys = problem.sys
    dtype = u_init.dtype
    b, v, hp, _, hu = sys.b3.shape
    n = v * hu
    n_con = sys.dsafe2_pair.shape[1] * hp + v * sys.obst_pos.shape[1] * hp
    single_veh = v == 1

    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    u_init = u_init.at[:, 0].set(
        jnp.where(jnp.abs(u_init[:, 0]) < eps, eps, u_init[:, 0]))

    P_qp = jnp.zeros((b, n + 1, n + 1), dtype)
    for i in range(v):  # static unroll over vehicles
        P_qp = P_qp.at[:, i * hu:(i + 1) * hu, i * hu:(i + 1) * hu].set(
            2.0 * problem.phi0[:, i])
    q_qp = jnp.concatenate([problem.psi0.reshape(b, n),
                            jnp.full((b, 1), slack_weight, dtype)], axis=1)
    lb = jnp.concatenate([jnp.full((b, n), -u_lim, dtype),
                          jnp.zeros((b, 1), dtype)], axis=1)
    ub = jnp.concatenate([jnp.full((b, n), u_lim, dtype),
                          jnp.full((b, 1), slack_ub, dtype)], axis=1)
    slack_col = jnp.full((b, n_con, 1), -1.0, dtype)

    ev_fn = jax.vmap(
        lambda s, u: con.evaluate(s, u, constraint_tolerance, compat_q5))
    obj_fn = jax.vmap(con.objective)
    ev0 = ev_fn(sys, u_init)
    obj_init = obj_fn(problem.phi0, problem.psi0, problem.gamma0, u_init)

    class Carry(NamedTuple):
        u: jax.Array
        obj: jax.Array
        viol: jax.Array
        feasible: jax.Array
        done: jax.Array
        it: jax.Array
        qp_iters: jax.Array
        qp_fails: jax.Array
        best_merit: jax.Array
        stall: jax.Array
        z: jax.Array
        best: "tuple | None" = None   # (u, obj, viol, feasible) best-merit

    zero = jnp.zeros((b,), jnp.int32)
    m_qp = n_con + 2 * (n + 1)
    best0 = ((u_init, obj_init, ev0.max_violation, ev0.feasible)
             if keep_best else None)
    init = Carry(u=u_init, obj=obj_init, viol=ev0.max_violation,
                 feasible=ev0.feasible, done=jnp.zeros((b,), bool),
                 it=zero, qp_iters=zero, qp_fails=zero,
                 best_merit=obj_init + slack_weight * ev0.max_violation,
                 stall=zero,
                 z=jnp.zeros((b, m_qp), dtype),
                 best=best0)

    # Static pair structure of the constraint rows (con.linearize's layout:
    # pair-major then (vehicle, obstacle) blocks, hp rows each, hu-wide
    # vehicle column blocks, slack column last) — lets the fused QP form
    # the KKT matrix from per-pair slabs in VMEM (qp.solve_qp_batched's
    # ``g_struct``).
    n_obst = sys.obst_pos.shape[1]
    # 5th element: the condensed prediction matrix is block-lower-triangular
    # (MPC_Iter.py:129-149), so every slab row k touches only controls
    # u <= k — the fused kernel's K formation skips the zero blocks.
    g_struct = (tuple(con._static_pairs(v)),
                tuple(vv for vv in range(v) for _ in range(n_obst)),
                hp, hu, True)

    use_banded = (qp_kkt in ("banded", "auto")
                  and problem.banded_pre is not None)

    def body(c: Carry) -> Carry:
        active = (c.it < max_scp_iter) & (~c.done)
        gi_b, gj_b, gob_b, rhs = jax.vmap(
            lambda s, u: con.linearize_slabs(s, u))(sys, c.u)
        # Dense G for the fallback paths only: when the structured fused
        # QP engages it never reads G, so XLA dead-code-eliminates this
        # scatter (~40 MB/iteration at B=1024).
        G_c = jax.vmap(
            lambda gi, gj, go: con.scatter_slabs(v, gi, gj, go, dtype)
        )(gi_b, gj_b, gob_b)
        G = jnp.concatenate([G_c, slack_col], axis=2)
        x0 = jnp.concatenate([c.u, jnp.zeros((b, 1), dtype)], axis=1)
        if use_banded:
            # banded stage statement (batched); unused operands DCE away
            # when the dense fused path is selected under qp_kkt="auto"
            a_blk, b_blk, qy, ru = problem.banded_pre
            yp_b, yo_b = jax.vmap(
                lambda s, u: con.linearize_ycoefs(s, u))(sys, c.u)
            banded_arg = qp.BandedData(a_blk, b_blk, yp_b, yo_b, qy, ru)
        else:
            banded_arg = None
        sol = qp.solve_qp_batched(P_qp, q_qp, G, rhs, lb, ub,
                                  max_iter=qp_max_iter, tol=qp_tol, x0=x0,
                                  z0=c.z if qp_warm_dual else None,
                                  fixed_iters=qp_fixed_iters,
                                  p_blocks=2.0 * problem.phi0,
                                  correctors=qp_correctors,
                                  slack_schur=True,
                                  certificate=qp_certificate,
                                  use_pallas=qp_use_pallas,
                                  g_struct=g_struct,
                                  g_slabs=(gi_b, gj_b, gob_b),
                                  banded=banded_arg, kkt=qp_kkt)
        ok = jnp.all(jnp.isfinite(sol.x), axis=1)
        u_new = jnp.where(ok[:, None], sol.x[:, :n], c.u)
        ev = ev_fn(sys, u_new)
        obj_new = obj_fn(problem.phi0, problem.psi0, problem.gamma0, u_new)
        merit_prev = c.obj + slack_weight * c.viol
        merit_new = obj_new + slack_weight * ev.max_violation
        delta = merit_prev - merit_new
        thresh = delta_tol + delta_tol_rel * jnp.abs(merit_new)
        small_delta = (jnp.abs(delta) < thresh) | ~ok
        if u_step_tol > 0:
            small_step = jnp.max(jnp.abs(u_new - c.u), axis=1) < u_step_tol
            small_delta = small_delta | small_step
        if merit_patience > 0:
            improved = (c.best_merit - merit_new) >= thresh
            stall = jnp.where(improved, 0, c.stall + 1)
            small_delta = small_delta | (stall >= merit_patience)
        else:
            stall = c.stall
        best_merit = jnp.minimum(c.best_merit, merit_new)
        sel = active
        selc = sel[:, None]
        if keep_best:
            better = sel & (merit_new < c.best_merit)
            cand = (u_new, obj_new, ev.max_violation, ev.feasible)
            best = tuple(
                jnp.where(better[:, None] if new_v.ndim == 2 else better,
                          new_v, old_v)
                for new_v, old_v in zip(cand, c.best))
        else:
            best = None
        if single_veh:
            stop = small_delta
        else:
            stop = small_delta & (ev.max_violation <= constraint_tolerance)

        # freeze inactive lanes (matches vmapped while_loop select semantics)
        return Carry(
            u=jnp.where(selc, u_new, c.u),
            obj=jnp.where(sel, obj_new, c.obj),
            viol=jnp.where(sel, ev.max_violation, c.viol),
            feasible=jnp.where(sel, ev.feasible, c.feasible),
            done=jnp.where(sel, stop, c.done),
            it=c.it + sel,
            qp_iters=c.qp_iters + jnp.where(sel, sol.iters, 0),
            qp_fails=c.qp_fails + jnp.where(sel & ~sol.converged, 1, 0),
            best_merit=jnp.where(sel, best_merit, c.best_merit),
            stall=jnp.where(sel, stall, c.stall),
            z=jnp.where(selc, sol.z, c.z),
            best=best)

    def cond(c: Carry):
        return jnp.any((c.it < max_scp_iter) & (~c.done))

    out = jax.lax.while_loop(cond, body, init)
    if keep_best:
        u_f, obj_f, viol_f, feas_f = out.best
    else:
        u_f, obj_f, viol_f, feas_f = out.u, out.obj, out.viol, out.feasible
    return SCPResult(u=u_f, feasible=feas_f, converged=out.done,
                     obj=obj_f, max_violation=viol_f, iters=out.it,
                     qp_iters=out.qp_iters, qp_fails=out.qp_fails)


def solve_scp_batch(problems: SCPProblem, u_init: jax.Array, *,
                    u_lim: float,
                    max_scp_iter: int = 20,
                    phase1_iters: int = 8,
                    straggler_frac: int = 4,
                    phases: tuple[tuple[int, int], ...] | None = None,
                    stacked: bool | None = None,
                    **kw) -> SCPResult:
    """Multi-phase batched SCP with straggler repacking.

    A vmapped ``solve_scp`` runs in lockstep: the whole batch pays for the
    slowest instance, and in conflict-heavy batches ~90% of instances
    converge within ~8 iterations while a few percent run to the 20-cap.
    ``phases`` is a schedule of ``(iters, frac)`` stages: stage k runs up to
    ``iters`` further SCP iterations on a ``1/frac``-width sub-batch into
    which the still-unconverged stragglers are gathered (argsort-packed).
    Default: the legacy two-phase ``((phase1_iters, 1),
    (max_scp_iter - phase1_iters, straggler_frac))``. Continuation is exact:
    ``solve_scp`` re-derives its merit carry from the entry iterate, which
    equals the state the uninterrupted loop would hold (the merit-patience
    stall counter restarts per phase — strictly more iterations, never
    fewer).

    ``problems``/``u_init`` carry a leading batch axis. Stragglers beyond a
    stage's capacity keep their prior-stage result (equivalent to a lower
    iteration cap for them; pick fracs so capacity is ~2x the expected
    straggler count from the done-by-k histogram).

    A phase entry may carry an optional third element overriding
    ``qp_fixed_iters`` for that phase: early full-batch phases tolerate
    looser inner QPs (the SCP iterate is far from its fixed point), while
    straggler phases — by construction the hard instances — keep the
    accurate setting.
    """
    b = u_init.shape[0]
    if phases is None:
        phases = ((phase1_iters, 1),
                  (max_scp_iter - phase1_iters, straggler_frac))
    assert phases[0][1] == 1, "first phase must cover the full batch"
    if stacked is None:
        stacked = jax.default_backend() == "tpu"

    def run(p, u, iters, qp_it=None):
        kw2 = kw if qp_it is None else {**kw, "qp_fixed_iters": qp_it}
        if stacked:
            return solve_scp_stacked(p, u, u_lim=u_lim,
                                     max_scp_iter=iters, **kw2)
        return jax.vmap(
            lambda pi, ui: solve_scp(pi, ui, u_lim=u_lim,
                                     max_scp_iter=iters, **kw2))(p, u)

    res = run(problems, u_init, phases[0][0], *phases[0][2:])

    for iters_k, frac_k, *qp_over in phases[1:]:
        m = max(b // frac_k, 1)
        # pack unconverged to the front (False sorts before True)
        order = jnp.argsort(res.converged)
        idx = order[:m]
        sub_problems = jax.tree_util.tree_map(lambda x: x[idx], problems)
        res_k = run(sub_problems, res.u[idx], iters_k, *qp_over)

        take = ~res.converged[idx]
        res_k = res_k._replace(
            iters=res_k.iters + res.iters[idx],
            qp_iters=res_k.qp_iters + res.qp_iters[idx],
            qp_fails=res_k.qp_fails + res.qp_fails[idx])

        def merge(a, b_k, take=take, idx=idx):
            sel = take.reshape((-1,) + (1,) * (b_k.ndim - 1))
            return a.at[idx].set(jnp.where(sel, b_k, a[idx]))

        res = SCPResult(*[merge(a, b_k) for a, b_k in zip(res, res_k)])
    return res


def solve_scp_multistart(problem: SCPProblem, u_init: jax.Array, *,
                         u_lim: float, **kw) -> SCPResult:
    """Multi-start SCP: warm start plus saturated-left/right restarts.

    The reference's single-vehicle infeasibility fallback
    (SCP_controller.py:51-66) retries from all-left / all-right saturated
    controls but is dead code (it unpacks 3 of 4 return values). Here the
    restarts are a free ``vmap`` over 3 candidate starts; the feasible result
    with the lowest objective wins (warm start wins ties).
    """
    n = u_init.shape[0]
    starts = jnp.stack([
        u_init,
        jnp.full((n,), u_lim, u_init.dtype),
        jnp.full((n,), -u_lim, u_init.dtype),
    ])
    res = jax.vmap(lambda u0: solve_scp(problem, u0, u_lim=u_lim, **kw))(starts)
    # Order candidates: feasible first, then objective; prefer earlier starts.
    big = jnp.asarray(jnp.finfo(u_init.dtype).max, u_init.dtype)
    score = jnp.where(res.feasible, res.obj, big) \
        + jnp.arange(3, dtype=u_init.dtype) * 1e-6
    best = jnp.argmin(score)
    return jax.tree_util.tree_map(lambda x: x[best], res)


def forward_u(sys: con.ConstraintSystem, u: jax.Array):
    """Predicted trajectory and per-vehicle controls (``forward_U``,
    SCP_controller.py:199-213). Returns (traj (hp, NY, V), U (hp, V))."""
    v, hp, _, hu = sys.b3.shape
    pos = con.positions(sys, u)          # (V, hp, NY)
    traj = jnp.transpose(pos, (1, 2, 0))
    U = u.reshape(v, hu).T
    return traj, U
