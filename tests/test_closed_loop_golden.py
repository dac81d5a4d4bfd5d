"""Golden test: full closed-loop simulation vs the reference Simulation.

Runs the *original* main.Simulation (cvxpy shimmed to our f64 QP solver)
for a short horizon and compares applied controls and vehicle states
step-by-step against scp_tpu.sim.engine.simulate.
"""
import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "tests")
from reference_oracle import load_reference, make_scenario  # noqa: E402
import cvxpy_shim  # noqa: E402

from scp_tpu.scenarios import builders  # noqa: E402
from scp_tpu.sim import engine  # noqa: E402


def run_reference_sim(n_veh=3, n_steps=5, tmpdir="/tmp/scp_ref_data",
                      delay_x=None):
    cvxpy_shim.install()
    ref, sc = make_scenario("circle", n_veh)
    sc.T_end = n_steps * sc.dt
    if delay_x is not None:
        sc.delay_x = delay_x
    sc.complete_scenario()
    sc.uLim = sc.mechanicalSteeringLimit

    import main as ref_main
    ref_main.scenario_choice = "Circle"  # Q9: module-global read
    os.makedirs(os.path.join(os.getcwd(), "Data"), exist_ok=True)
    sim = ref_main.Simulation(sc, doOnlinePlot=False, isNoise=False)
    sim.runsimulation("SCP")
    return sc, sim


def test_closed_loop_circle_3veh():
    n_veh, n_steps = 3, 5
    sc, sim = run_reference_sim(n_veh, n_steps)

    cfg, data = builders.circle(n_veh)
    cfg = cfg.replace(rk4_substeps=2)
    carry, out = engine.simulate(cfg, data, n_steps=n_steps)

    # applied controls per step
    ref_u = sim.controlPredictions[0, :, :n_steps].T          # (n_steps, V)
    np.testing.assert_allclose(np.asarray(out.u_applied), ref_u,
                               rtol=1e-5, atol=1e-7)

    # full control prediction of the last step
    np.testing.assert_allclose(np.asarray(out.u_pred[-1]),
                               sim.controlPredictions[:, :, n_steps - 1],
                               rtol=1e-4, atol=1e-6)

    # vehicle states at each step boundary (position/heading/steering)
    tps = sc.ticks_per_sim
    for i in range(n_steps):
        ref_state = sim.vehiclePathFullRes[:, :, (i + 1) * tps].T  # (V, 6)
        got_state = np.asarray(out.states[i, -1])
        np.testing.assert_allclose(got_state, ref_state, rtol=1e-5, atol=2e-5,
                                   err_msg=f"step {i}")

    # SCP diagnostics sane
    assert bool(jnp.all(out.feasible))
    assert bool(jnp.all(out.converged))


def test_closed_loop_circle_8veh_short():
    """Headline 8-vehicle circle (main.py:238-244 default), 2 steps."""
    n_veh, n_steps = 8, 2
    sc, sim = run_reference_sim(n_veh, n_steps)

    cfg, data = builders.circle(n_veh)
    cfg = cfg.replace(rk4_substeps=2)
    carry, out = engine.simulate(cfg, data, n_steps=n_steps)

    ref_u = sim.controlPredictions[0, :, :n_steps].T
    np.testing.assert_allclose(np.asarray(out.u_applied), ref_u,
                               rtol=1e-4, atol=1e-6)
    tps = sc.ticks_per_sim
    for i in range(n_steps):
        ref_state = sim.vehiclePathFullRes[:, :, (i + 1) * tps].T
        np.testing.assert_allclose(np.asarray(out.states[i, -1]), ref_state,
                                   rtol=1e-4, atol=5e-5, err_msg=f"step {i}")


def test_closed_loop_delay_x_spanning_steps():
    """Multi-step measurement delay (delay_x = 0.5 s = 50 ticks > one
    40-tick MPC step) against the reference's tick bookkeeping
    (main.py:101-103 reads the full-resolution path array; our carry holds
    a tick-resolution ring buffer). Pins the r4 delay_x cap lift against
    the actual reference, not just our own semantics."""
    n_veh, n_steps = 3, 5
    sc, sim = run_reference_sim(n_veh, n_steps, delay_x=0.5)
    assert sc.ticks_delay_x == 50 > sc.ticks_per_sim

    cfg, data = builders.circle(n_veh)
    cfg = cfg.replace(rk4_substeps=2, delay_x=0.5)
    carry, out = engine.simulate(cfg, data, n_steps=n_steps)

    ref_u = sim.controlPredictions[0, :, :n_steps].T          # (n_steps, V)
    np.testing.assert_allclose(np.asarray(out.u_applied), ref_u,
                               rtol=1e-5, atol=1e-7)
    # delay-compensation rollouts start from the same MEASURED (lagged)
    # states the reference used
    np.testing.assert_allclose(
        np.asarray(out.delay_traj),
        np.transpose(sim.MPC_delay_compensation_trajectory, (3, 0, 1, 2))
        [:n_steps],
        rtol=1e-5, atol=1e-6)
    tps = sc.ticks_per_sim
    for i in range(n_steps):
        ref_state = sim.vehiclePathFullRes[:, :, (i + 1) * tps].T  # (V, 6)
        np.testing.assert_allclose(np.asarray(out.states[i, -1]), ref_state,
                                   rtol=1e-5, atol=2e-5, err_msg=f"step {i}")
