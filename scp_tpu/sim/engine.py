"""Closed-loop MPC simulation engine — one ``lax.scan`` over MPC steps.

Reference: ``Simulation.runsimulation`` (main.py:82-231). Each scan step
reproduces the reference pipeline:

1. dynamic steering limit from lateral acceleration (main.py:106-110);
2. delay compensation: forward-integrate the plant over
   ``delay_x + dt + delay_u`` holding the last commanded steering
   (``IterClass``, MPC_Iter.py:25-33);
3. reference resampling + obstacle prediction (MPC_Iter.py:35-51);
4. linearize/discretize/condense (``MPCclass``, MPC_Iter.py:57-149);
5. SCP solve (SCP_controller.py:74-197);
6. steering magnitude/rate clamps, applied sequentially along the horizon
   (main.py:164-174);
7. plant rollout at tick resolution with the actuator-delay control switch:
   the first ``ticks_delay_u`` ticks of step ``i`` still run on the command
   from step ``i-2``, the rest on step ``i-1``'s (write pattern at
   main.py:176-182);
8. metrics (``evaluateInOriginalProblem``, SCP_controller.py:343-400).

Everything is fixed-shape: ``jit`` once, ``vmap`` over scenario batches,
``shard_map`` over device meshes. Process noise is injected per plant tick
with explicit PRNG keys (reference adds N(0, 3e-6) inside the ODE,
Model.py:84-87).

Control timeline note (delay_x = 0 as in all shipped scenarios): the command
computed at step ``i`` covers ticks ``(i+1)*tps + delay_u + 1`` through
``(i+2)*tps + delay_u``. Plant integration per tick holds the control value
of the tick being entered (piecewise-constant), which differs from the
reference's restart-from-step-start integration (Q10, main.py:184-191) by
O(integrator tolerance) over the 3 delay ticks.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from scp_tpu.config import NX, NY, SCPConfig, ScenarioData
from scp_tpu.models import bicycle
from scp_tpu.ops import condensed, constraints as con, discretize, reference_path
from scp_tpu.scenarios.builders import (OBST_HEADING, OBST_SPEED, OBST_X,
                                        OBST_Y)
from scp_tpu.solvers import scp


class SimCarry(NamedTuple):
    state: jax.Array    # (V, NX) plant state at the current tick
    u_prev2: jax.Array  # (V,) command applied during the delay window
    u_prev1: jax.Array  # (V,) last command (active for the rest of the step)
    u_warm: jax.Array   # (V*HP,) SCP warm start = previous solution
    step: jax.Array     # scalar int step index
    key: jax.Array      # PRNG key for plant noise
    state_meas: jax.Array | None = None
    # (V, NX) the MEASURED state: the plant state ticks_delay_x ticks in the
    # past (main.py:101-103 tick_of_measurement). Equals ``state`` when
    # delay_x == 0 (all shipped scenarios); None defaults to ``state``.
    state_hist: jax.Array | None = None
    # (ticks_delay_x, V, NX) ring buffer of the plant states at the
    # ticks_delay_x ticks BEFORE the current step boundary — lets
    # ticks_delay_x span any number of MPC steps (the reference reads the
    # full-resolution path array, main.py:101-103); None when delay_x == 0.


class StepOutput(NamedTuple):
    states: jax.Array         # (ticks_per_sim, V, NX) plant path this step
    u_applied: jax.Array      # (V,) clamped first command
    u_pred: jax.Array         # (HP, V) clamped control prediction
    traj_pred: jax.Array      # (HP, NY, V) predicted trajectory
    ref_points: jax.Array     # (V, HP, 2) sampled reference
    x0_pred: jax.Array        # (V, NX) delay-compensated linearization state
    feasible: jax.Array
    converged: jax.Array
    obj: jax.Array            # SCP tracking objective
    max_violation: jax.Array
    scp_iters: jax.Array
    qp_iters: jax.Array
    pred_obj: jax.Array       # evaluateInOriginalProblem objective
    pred_feasible: jax.Array  # trajectory-distance feasibility
    delay_traj: jax.Array     # (10, NX, V) delay-compensation rollout
    # (MPC_delay_compensation_trajectory, MPC_Iter.py:31-33)
    clamp_mag_events: jax.Array   # steering MAGNITUDE audit count this step
    clamp_rate_events: jax.Array  # steering RATE audit count this step
    # (|U| > uMax + 1e-3 / |dU| > duLim + 1e-3 on the RAW prediction before
    # clamping — the reference's warning printout, main.py:144-161, minus
    # its Q8 always-true flag bug)
    feas_disagree: jax.Array      # 1 when the QCQP-based and the
    # trajectory-distance feasibility criteria DISAGREE on this step —
    # the reference's "feasibility criteria disagree" warning
    # (SCP_controller.py:391-393), surfaced as a countable diagnostic
    sides_stable: jax.Array       # side_selection controller: reselection
    # fixed point reached this step (True for the SCP controller)


def dynamic_steering_limit(cfg: SCPConfig, data: ScenarioData,
                           state: jax.Array) -> jax.Array:
    """min(mechanical, atan(a_lat_max * L / v^2)) per vehicle (main.py:106-110)."""
    speed = state[:, 3]
    L = data.params.lf + data.params.lr
    dyn = jnp.arctan(cfg.lateral_accel_limit * L /
                     jnp.maximum(speed ** 2, 1e-9))
    return jnp.minimum(cfg.mechanical_steering_limit, dyn)


def delay_compensate(cfg: SCPConfig, data: ScenarioData, state, u_last):
    """Integrate the nominal plant over the delay horizon (MPC_Iter.py:25-33).

    Returns (x0 (V, NX), trajectory (10, NX, V)) — 10 points to mirror the
    reference's ``MPC_delay_compensation_trajectory``.
    """
    T = cfg.delay_comp_time
    n_steps = 9

    def one(x, u, lf, lr):
        return bicycle.integrate(x, u, lf, lr, h=T / n_steps,
                                 n_steps=n_steps, substeps=4)

    traj = jax.vmap(one)(state, u_last, data.params.lf, data.params.lr)
    x0 = traj[:, -1, :]
    return x0, jnp.transpose(traj, (1, 2, 0))


def predict_obstacles(cfg: SCPConfig, data: ScenarioData, step) -> jax.Array:
    """Constant-velocity obstacle forecast (MPC_Iter.py:45-51) from the
    measured state at tick ``step*tps - ticks_delay_x``. Returns (O, HP, 2)."""
    if cfg.n_obst == 0:
        return jnp.zeros((0, cfg.hp, 2), data.x0.dtype)
    obst = data.obstacles
    t_meas = (step * cfg.ticks_per_sim - cfg.ticks_delay_x) * cfg.tick_length
    t_meas = jnp.maximum(t_meas, 0.0)
    speed = obst[:, OBST_SPEED]
    heading = obst[:, OBST_HEADING]
    vel = speed[:, None] * jnp.stack([jnp.cos(heading), jnp.sin(heading)], -1)
    base = obst[:, [OBST_X, OBST_Y]] + t_meas * vel
    horizon = ((jnp.arange(1, cfg.hp + 1, dtype=obst.dtype)) * cfg.dt
               + cfg.delay_comp_time)
    return base[:, None, :] + horizon[None, :, None] * vel[:, None, :]


def clamp_controls(cfg: SCPConfig, U, u0, u_max):
    """Sequential magnitude/rate clamps (main.py:164-174).

    U: (HP, V) raw prediction; u0: (V,) previous command; u_max: (V,).
    The clamp order (min umax, max -umax, min prev+du, max prev-du) is
    preserved exactly — it matters when the rate window falls outside the
    magnitude box.
    """
    def row(prev, u_row):
        u = jnp.minimum(u_row, u_max)
        u = jnp.maximum(u, -u_max)
        u = jnp.minimum(u, prev + cfg.du_lim)
        u = jnp.maximum(u, prev - cfg.du_lim)
        return u, u

    _, clamped = jax.lax.scan(row, u0, U)
    return clamped


def rollout_plant(cfg: SCPConfig, data: ScenarioData, state, u_prev2, u_prev1,
                  key):
    """Integrate the true plant over one MPC step at tick resolution.

    The control entering tick m (1-based) is ``u_prev2`` for
    ``m <= ticks_delay_u`` and ``u_prev1`` after (write pattern of
    main.py:176-182). Returns (ticks_per_sim, V, NX).
    """
    tps = cfg.ticks_per_sim
    h = cfg.tick_length
    m_idx = jnp.arange(1, tps + 1)
    if cfg.plant_compat_q10:
        # Q10 compat: the reference's per-tick restart integration means the
        # carried state only ever sees the latest command (main.py:184-191).
        use_prev2 = jnp.zeros((tps,), bool)
    else:
        use_prev2 = m_idx <= cfg.ticks_delay_u       # (tps,)
    keys = jax.random.split(key, tps)

    def tick(x, inp):
        is_old, k = inp
        u = jnp.where(is_old, u_prev2, u_prev1)      # (V,)

        def one(xv, uv, lf, lr, kv):
            xnew = xv
            for _ in range(cfg.rk4_substeps):
                xnew = bicycle.rk4_step(xnew, uv, lf, lr,
                                        h / cfg.rk4_substeps)
            if cfg.noise_std > 0:
                noise = cfg.noise_std * h * jax.random.normal(kv, (2,),
                                                              xv.dtype)
                xnew = xnew.at[:2].add(noise)
            return xnew

        vkeys = jax.random.split(k, x.shape[0])
        x = jax.vmap(one)(x, u, data.params.lf, data.params.lr, vkeys)
        return x, x

    _, states = jax.lax.scan(tick, state, (use_prev2, keys))
    return states


def controller_pre(cfg: SCPConfig, data: ScenarioData, carry: SimCarry):
    """Controller preprocessing: IterClass + MPCclass (delay compensation,
    reference sampling, obstacle forecast, discretize, condense).

    Returns (problem, aux) where ``aux = (sys_, u_max, ref_pts, x0, obst_pos,
    delay_traj)``.
    """
    # The steering limit uses the CURRENT state (main.py:106-110 reads the
    # path at tick_now); delay compensation starts from the MEASURED state,
    # ticks_delay_x in the past (main.py:101-103, 113-117).
    u_max = dynamic_steering_limit(cfg, data, carry.state)
    x_meas = carry.state if carry.state_meas is None else carry.state_meas

    x0, delay_traj = delay_compensate(cfg, data, x_meas, carry.u_prev1)
    step_sizes = x0[:, 3] * cfg.dt
    ref_pts = reference_path.sample_reference_batch(
        data.ref_points, data.ref_valid, x0[:, :2], step_sizes, cfg.hp, True)
    obst_pos = predict_obstacles(cfg, data, carry.step)

    A, B, E = discretize.linearize_and_discretize_batch(
        x0, carry.u_prev1, data.params.lf, data.params.lr, cfg.dt)
    ref_stack = ref_pts.reshape(cfg.n_veh, cfg.hp * NY)
    cm = condensed.build_condensed_batch(
        A, B, E, x0, ref_stack, data.params.q, data.params.r,
        data.params.q_final, cfg.hp, cfg.hu)

    sys_ = con.make_system(cm.math_b, cm.const_term, obst_pos,
                           data.dsafe_veh, data.dsafe_obst,
                           cfg.dsafe_extra, cfg.hp, cfg.hu)
    banded_pre = None
    if cfg.qp_kkt != "dense":
        # stage statement of the SAME problem for the banded (Riccati)
        # KKT path: dynamics + the cost's stage decomposition
        # (P == 2*blockdiag(B^T Q B + r I), MPC_Iter.py:116-127)
        qy = 2.0 * jnp.broadcast_to(data.params.q[:, None],
                                    (cfg.n_veh, cfg.hp))
        qy = qy.at[:, -1].set(2.0 * data.params.q_final)
        banded_pre = (A, B[:, :, 0], qy.astype(data.x0.dtype),
                      2.0 * data.params.r)
    problem = scp.SCPProblem(sys=sys_, phi0=cm.phi0, psi0=cm.psi0,
                             gamma0=cm.gamma0, banded_pre=banded_pre)
    return problem, (sys_, u_max, ref_pts, x0, obst_pos, delay_traj)


def _scp_kwargs(cfg: SCPConfig) -> dict:
    return dict(
        u_lim=cfg.u_lim,
        delta_tol=cfg.delta_tol, delta_tol_rel=cfg.delta_tol_rel,
        u_step_tol=cfg.u_step_tol,
        merit_patience=cfg.merit_patience,
        keep_best=cfg.scp_keep_best,
        slack_weight=cfg.slack_weight,
        slack_ub=cfg.slack_ub,
        constraint_tolerance=cfg.constraint_tolerance,
        qp_max_iter=cfg.qp_max_iter, qp_tol=cfg.qp_tol,
        qp_fixed_iters=cfg.qp_fixed_iters or None,
        qp_correctors=cfg.qp_correctors,
        qp_warm_dual=cfg.qp_warm_dual,
        qp_cheap_k=cfg.qp_cheap_k,
        qp_kkt=cfg.qp_kkt,
        compat_q5=cfg.compat_q5)


def step_post(cfg: SCPConfig, data: ScenarioData, carry: SimCarry,
              res, aux, key, key_noise,
              sides_stable=None) -> tuple[SimCarry, StepOutput]:
    """Post-solve half of the MPC step: clamps, plant rollout, metrics."""
    sys_, u_max, ref_pts, x0, obst_pos, delay_traj = aux
    traj_pred, U_raw = scp.forward_u(sys_, res.u)
    U = clamp_controls(cfg, U_raw, carry.u_prev1, u_max)
    u_cmd = U[0]

    # Steering-limit audit on the RAW prediction (main.py:144-161): counts of
    # magnitude/rate excursions the clamps will remove, as diagnostics
    # (the reference prints warnings; its summary flag is Q8-broken).
    audit_eps = 1e-3
    mag_events = jnp.sum(jnp.abs(U_raw) > u_max[None, :] + audit_eps)
    dU_raw = jnp.diff(U_raw, axis=0, prepend=carry.u_prev1[None, :])
    rate_events = jnp.sum(jnp.abs(dU_raw) > cfg.du_lim + audit_eps)

    states = rollout_plant(cfg, data, carry.state, carry.u_prev2,
                           carry.u_prev1, key_noise)

    # evaluateInOriginalProblem metrics (SCP_controller.py:343-400)
    sq_err = (jnp.transpose(ref_pts, (1, 2, 0)) - traj_pred) ** 2  # (HP,NY,V)
    obj_x = jnp.sum(data.params.q * jnp.sum(sq_err[:-1], axis=(0, 1))) \
        + jnp.sum(data.params.q_final * jnp.sum(sq_err[-1], axis=0))
    obj_u = jnp.sum(data.params.r * jnp.sum(U ** 2, axis=0))
    pred_obj = obj_x + obj_u
    pos_t = jnp.transpose(traj_pred, (2, 0, 1))  # (V, HP, NY)
    iu, ju = sys_.pair_i, sys_.pair_j
    d2 = jnp.sum((pos_t[iu] - pos_t[ju]) ** 2, -1)       # (P, HP)
    ci_v = data.dsafe_veh[iu, ju][:, None] ** 2 - d2
    d2o = jnp.sum((pos_t[:, None] - obst_pos[None]) ** 2, -1)
    ci_o = data.dsafe_obst[:, :, None] ** 2 - d2o
    pred_feasible = (jnp.max(ci_v, initial=-jnp.inf) <= cfg.constraint_tolerance) & \
                    (jnp.max(ci_o, initial=-jnp.inf) <= cfg.constraint_tolerance)

    d_ticks = cfg.ticks_delay_x
    if carry.state_meas is None:
        state_meas = state_hist = None
    elif d_ticks == 0:
        state_meas, state_hist = states[-1], None
    else:
        # Tick-resolution measurement history: ``full`` covers ticks
        # T-D .. T+tps of the global tick grid (T = this step's start,
        # D = ticks_delay_x); the measured state at the NEXT boundary is
        # tick T+tps-D and the carried history the D ticks before it.
        # Works for delay_x spanning ANY number of MPC steps — the
        # reference's tick bookkeeping reads the full-resolution path
        # array the same way (main.py:101-103).
        full = jnp.concatenate(
            [carry.state_hist, carry.state[None], states], axis=0)
        state_meas = full[cfg.ticks_per_sim]
        state_hist = full[cfg.ticks_per_sim:cfg.ticks_per_sim + d_ticks]
    new_carry = SimCarry(
        state=states[-1],
        u_prev2=carry.u_prev1,
        u_prev1=u_cmd,
        u_warm=res.u,
        step=carry.step + 1,
        key=key,
        state_meas=state_meas,
        state_hist=state_hist,
    )
    out = StepOutput(
        states=states, u_applied=u_cmd, u_pred=U, traj_pred=traj_pred,
        ref_points=ref_pts, x0_pred=x0,
        feasible=res.feasible, converged=res.converged, obj=res.obj,
        max_violation=res.max_violation, scp_iters=res.iters,
        qp_iters=res.qp_iters, pred_obj=pred_obj,
        pred_feasible=pred_feasible, delay_traj=delay_traj,
        clamp_mag_events=mag_events, clamp_rate_events=rate_events,
        # "feasibility criteria disagree" (SCP_controller.py:391-393):
        # QCQP evaluation (with dsafe_extra margin) vs raw trajectory
        # distance — countable instead of a printed warning.
        feas_disagree=(res.feasible != pred_feasible).astype(jnp.int32),
        sides_stable=(jnp.array(True) if sides_stable is None
                      else sides_stable))
    return new_carry, out


def mpc_controller(cfg: SCPConfig, data: ScenarioData, carry: SimCarry):
    """Controller half of one MPC step — the reference's controllerTimer
    window (main.py:120-142): preprocessing + SCP / side-selection solve.

    Returns ``(res, aux, sides_stable, key, key_noise)``;
    :func:`step_post` completes the step. Split out so host drivers can
    time the controller separately (``simulate_timed``)."""
    key, key_noise = jax.random.split(carry.key)
    problem, aux = controller_pre(cfg, data, carry)
    sys_, u_max, ref_pts, x0, obst_pos, delay_traj = aux

    if cfg.controller == "scp":
        res = scp.solve_scp(problem, carry.u_warm,
                            max_scp_iter=cfg.max_scp_iter,
                            **_scp_kwargs(cfg))
        return res, aux, None, key, key_noise
    elif cfg.controller == "side_selection":
        from scp_tpu.solvers import miqp

        if cfg.obst_as_qcqp or cfg.n_obst == 0:
            rect = {}
        else:
            # obstAsQCQP=0: rotated-rectangle obstacle faces with
            # chord-augmented dimensions (MIQP.py:233-253), built from the
            # delay-compensated speeds like the reference's state0.
            normals, dists = miqp.rectangle_obstacle_geometry(
                data.obstacles, x0[:, 3], data.params.length,
                data.params.width, cfg.dt)
            rect = {"obst_normals": normals, "obst_dists": dists}
        ss = miqp.solve_side_selection(
            sys_, ref_pts, data.params.q, data.params.q_final, data.params.r,
            carry.u_prev1, u_max, carry.u_warm,
            du_lim=cfg.u_lim,
            slack_weight=cfg.slack_weight, slack_ub=cfg.slack_ub,
            constraint_tolerance=cfg.constraint_tolerance,
            n_rounds=cfg.side_selection_rounds,
            # the reference MIQP's rows use the RAW safety distances —
            # dsafeExtra never enters them (MIQP.py:226-227,260)
            dsafe_pair=data.dsafe_veh[sys_.pair_i, sys_.pair_j],
            dsafe_obst=data.dsafe_obst,
            qp_max_iter=cfg.qp_max_iter, qp_tol=cfg.qp_tol,
            # calibration knobs (config.TUNED_F32_SIDE_SELECTION) — same
            # plumbing as _side_selection_step_batch (VERDICT r4 next #2:
            # the per-instance path used to drop them silently)
            qp_fixed_iters=cfg.qp_fixed_iters or None,
            qp_candidate_iters=cfg.side_selection_cand_iters or None,
            qp_correctors=cfg.qp_correctors, **rect)
        res = scp.SCPResult(
            u=ss.u, feasible=ss.feasible, converged=ss.converged,
            obj=ss.obj, max_violation=jnp.maximum(ss.slack, 0.0),
            iters=ss.rounds, qp_iters=ss.qp_iters,
            qp_fails=jnp.asarray(0))
        return res, aux, ss.sides_stable, key, key_noise
    else:
        raise ValueError(f"unknown controller {cfg.controller!r}")


def mpc_step(cfg: SCPConfig, data: ScenarioData, carry: SimCarry,
             dtype=None) -> tuple[SimCarry, StepOutput]:
    """One complete MPC step (controller + plant)."""
    res, aux, sides_stable, key, key_noise = mpc_controller(cfg, data, carry)
    return step_post(cfg, data, carry, res, aux, key, key_noise,
                     sides_stable=sides_stable)


def mpc_step_horizon(cfg: SCPConfig, data: ScenarioData, carry: SimCarry,
                     *, axis_name: str = "model",
                     n_shards: int) -> tuple[SimCarry, StepOutput]:
    """One MPC step with the SCP solve horizon-sharded over a mesh axis.

    For use INSIDE ``shard_map`` over a mesh that has ``axis_name`` (see
    scp_tpu/parallel/horizon.py): preprocessing and post-processing are
    replicated across the axis (per-vehicle work, ~cheap), while the
    constraint rows — evaluation, linearization, and the IPM's dominant
    G^T W G formation — run on hp/n_shards horizon steps per shard with
    psum/pmin/pmax collectives gluing the replicated Newton/merit state.
    Being a plain per-step function, it composes with ``lax.scan`` for
    whole-closed-loop sharded execution (one shard_map around the scan).
    """
    from scp_tpu.parallel import horizon

    assert cfg.controller == "scp", "horizon sharding targets the SCP path"
    key, key_noise = jax.random.split(carry.key)
    problem, aux = controller_pre(cfg, data, carry)
    local_sys = horizon.shard_system(
        problem.sys, jax.lax.axis_index(axis_name), n_shards)
    res = scp.solve_scp(problem._replace(sys=local_sys), carry.u_warm,
                        max_scp_iter=cfg.max_scp_iter,
                        axis_name=axis_name,
                        n_con_total=horizon.padded_n_con(cfg, n_shards),
                        **_scp_kwargs(cfg))
    return step_post(cfg, data, carry, res, aux, key, key_noise)


def mpc_step_batch(cfg: SCPConfig, data: ScenarioData, carry: SimCarry,
                   phase1_iters: int = 8, straggler_frac: int = 4,
                   phases: tuple[tuple[int, int], ...] | None = None):
    """Batched MPC step with two-phase straggler repacking.

    ``data``/``carry`` carry a leading batch axis. Functionally equivalent
    to ``vmap(mpc_step)`` (up to the straggler-capacity note in
    ``solve_scp_batch``), but typically ~1.5x faster: converged instances
    stop paying for the few that run to the SCP iteration cap.
    """
    if cfg.controller == "side_selection":
        if phases is not None:
            # the side-selection controller runs a FIXED round count; a
            # straggler phase schedule has no meaning for it and must not
            # be dropped silently (ADVICE r4)
            raise ValueError(
                "phases (SCP straggler schedule) is not applicable to the "
                "side_selection controller; pass phases=None")
        return _side_selection_step_batch(cfg, data, carry)
    if cfg.controller != "scp":
        # unknown controllers fall back to the per-instance dispatcher
        return jax.vmap(lambda d, c: mpc_step(cfg, d, c))(data, carry)
    keys = jax.vmap(jax.random.split)(carry.key)   # (B, 2, key)
    key, key_noise = keys[:, 0], keys[:, 1]

    problem, aux = jax.vmap(
        lambda d, c: controller_pre(cfg, d, c))(data, carry)
    res = scp.solve_scp_batch(
        problem, carry.u_warm,
        max_scp_iter=cfg.max_scp_iter,
        phase1_iters=phase1_iters, straggler_frac=straggler_frac,
        phases=phases,
        **_scp_kwargs(cfg))
    return jax.vmap(
        lambda d, c, r, a, k, kn: step_post(cfg, d, c, r, a, k, kn)
    )(data, carry, res, aux, key, key_noise)


def _side_selection_step_batch(cfg: SCPConfig, data: ScenarioData,
                               carry: SimCarry):
    """Batched side-selection MPC step: the controller's QPs (all
    first-round candidates + every reselection round) run through the
    natively-batched/fused ``solve_qp_batched`` path
    (``miqp.solve_side_selection_stacked``) instead of per-instance
    ``solve_qp`` under vmap — the same treatment the SCP controller gets
    from ``solve_scp_stacked`` (VERDICT r3 top item)."""
    from scp_tpu.solvers import miqp

    keys = jax.vmap(jax.random.split)(carry.key)   # (B, 2, key)
    key, key_noise = keys[:, 0], keys[:, 1]
    problem, aux = jax.vmap(
        lambda d, c: controller_pre(cfg, d, c))(data, carry)
    sys_, u_max, ref_pts, x0, obst_pos, delay_traj = aux
    b = carry.u_warm.shape[0]

    if cfg.obst_as_qcqp or cfg.n_obst == 0:
        rect = {}
    else:
        normals, dists = jax.vmap(
            lambda ob, sp, ln, wd: miqp.rectangle_obstacle_geometry(
                ob, sp, ln, wd, cfg.dt)
        )(data.obstacles, x0[:, :, 3], data.params.length,
          data.params.width)
        rect = {"obst_normals": normals, "obst_dists": dists}
    ss = miqp.solve_side_selection_stacked(
        sys_, ref_pts, data.params.q, data.params.q_final, data.params.r,
        carry.u_prev1, u_max, carry.u_warm,
        du_lim=cfg.u_lim,
        slack_weight=cfg.slack_weight, slack_ub=cfg.slack_ub,
        constraint_tolerance=cfg.constraint_tolerance,
        n_rounds=cfg.side_selection_rounds,
        dsafe_pair=jax.vmap(lambda d, s: d.dsafe_veh[s.pair_i, s.pair_j])(
            data, sys_),
        dsafe_obst=data.dsafe_obst,
        qp_max_iter=cfg.qp_max_iter, qp_tol=cfg.qp_tol,
        qp_fixed_iters=cfg.qp_fixed_iters or None,
        qp_candidate_iters=cfg.side_selection_cand_iters or None,
        qp_correctors=cfg.qp_correctors, **rect)
    res = scp.SCPResult(
        u=ss.u, feasible=ss.feasible, converged=ss.converged,
        obj=ss.obj, max_violation=jnp.maximum(ss.slack, 0.0),
        iters=ss.rounds, qp_iters=ss.qp_iters,
        qp_fails=jnp.zeros((b,), jnp.int32))
    return jax.vmap(
        lambda d, c, r, a, k, kn, st: step_post(cfg, d, c, r, a, k, kn,
                                                sides_stable=st)
    )(data, carry, res, aux, key, key_noise, ss.sides_stable)


def init_carry(cfg: SCPConfig, data: ScenarioData, key=None) -> SimCarry:
    if key is None:
        key = jax.random.PRNGKey(0)
    return SimCarry(
        state=data.x0,
        u_prev2=data.u0,
        u_prev1=data.u0,
        u_warm=jnp.zeros((cfg.n_veh * cfg.hp,), data.x0.dtype),
        step=jnp.array(0),
        key=key,
        # tick_of_measurement = max(0, 0 - ticks_delay_x) -> initial state
        state_meas=data.x0,
        # ticks before t=0 measure the initial state (the max(0, .) clamp)
        state_hist=(jnp.broadcast_to(
            data.x0, (cfg.ticks_delay_x,) + data.x0.shape) + 0.0
            if cfg.ticks_delay_x > 0 else None),
    )


def simulate_batch(cfg: SCPConfig, data: ScenarioData, keys=None,
                   n_steps: int | None = None,
                   phases: tuple | None = None):
    """Batched closed loop: ``lax.scan`` over :func:`mpc_step_batch`.

    ``data`` carries a leading batch axis (broadcast a single scenario for
    Monte-Carlo over ``keys``). With ``phases`` (e.g.
    ``config.TUNED_F32_PHASES``) each step runs the straggler-repacked
    batched SCP — the bench-calibrated production path. Returns
    ``(final_carries, outputs)`` with outputs stacked (n_steps, B, ...).
    """
    b = jax.tree_util.tree_leaves(data)[0].shape[0]
    if keys is None:
        keys = jax.random.split(jax.random.PRNGKey(0), b)
    carry = jax.vmap(lambda d, k: init_carry(cfg, d, k))(data, keys)
    n = n_steps if n_steps is not None else cfg.n_sim
    kw = {"phases": phases} if phases is not None else {}

    def step(c, _):
        return mpc_step_batch(cfg, data, c, **kw)

    return jax.lax.scan(step, carry, None, length=n)


def simulate_timed(cfg: SCPConfig, data: ScenarioData, key=None,
                   n_steps: int | None = None, warmup: bool = True):
    """Host-driven closed loop with per-step wall-clock measurement.

    The reference measures ``controllerRuntime`` around the controller call
    (main.py:120,142) and ``stepTime`` around the whole step
    (main.py:100,194) and dumps both per step. The scanned
    :func:`simulate` runs all steps inside one XLA program, so no per-step
    host time exists there; this driver dispatches each step as two jitted
    calls (controller, then clamp/plant/metrics) with forced readbacks
    between (``block_until_ready`` does not sync through the TPU tunnel).

    ``warmup``: run one throwaway step first so compile time is not billed
    to step 0 (the step functions are pure — the discarded warm-up run is
    side-effect-free).

    Returns ``(final_carry, stacked StepOutput, step_times,
    controller_runtimes)`` — the time lists in seconds, ready for
    ``results.export_reference_json``.
    """
    import functools
    import time

    import numpy as np

    ctrl_j = jax.jit(functools.partial(mpc_controller, cfg, data))
    post_j = jax.jit(functools.partial(step_post, cfg, data))
    carry = init_carry(cfg, data, key)
    n = n_steps if n_steps is not None else cfg.n_sim
    if warmup:
        res_w, aux_w, ss_w, k_w, kn_w = ctrl_j(carry)
        jax.device_get(post_j(carry, res_w, aux_w, k_w, kn_w,
                              sides_stable=ss_w)[1].obj)
    outs, step_times, ctrl_times = [], [], []
    for _ in range(n):
        t0 = time.time()
        res, aux, ss, k, kn = ctrl_j(carry)
        jax.device_get(res.obj)                    # forced readback
        t1 = time.time()
        carry, out = post_j(carry, res, aux, k, kn, sides_stable=ss)
        outs.append(jax.device_get(out))
        t2 = time.time()
        ctrl_times.append(t1 - t0)
        step_times.append(t2 - t0)
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *outs)
    return carry, stacked, step_times, ctrl_times


def simulate(cfg: SCPConfig, data: ScenarioData, key=None,
             n_steps: int | None = None):
    """Run the full closed loop. Returns (final_carry, stacked StepOutput).

    jit with ``static_argnums`` on cfg/n_steps, or wrap in a partial.
    """
    carry = init_carry(cfg, data, key)
    n = n_steps if n_steps is not None else cfg.n_sim

    def step(c, _):
        return mpc_step(cfg, data, c)

    return jax.lax.scan(step, carry, None, length=n)
