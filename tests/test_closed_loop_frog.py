"""Closed-loop golden test: Frog scenario (1 vehicle, 22 moving obstacles).

Exercises the obstacle-prediction path, the Q5 compat behavior in the SCP
stop rule, and the single-vehicle merit-stall break branch end-to-end
against the reference Simulation.
"""
import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "tests")
from reference_oracle import make_scenario  # noqa: E402
import cvxpy_shim  # noqa: E402

from scp_tpu.scenarios import builders  # noqa: E402
from scp_tpu.sim import engine  # noqa: E402


def test_closed_loop_frog():
    n_steps = 4
    cvxpy_shim.install()
    ref, sc = make_scenario("frog")
    sc.T_end = n_steps * sc.dt
    sc.complete_scenario()
    sc.uLim = sc.mechanicalSteeringLimit

    import main as ref_main
    ref_main.scenario_choice = "Frog"
    os.makedirs(os.path.join(os.getcwd(), "Data"), exist_ok=True)
    sim = ref_main.Simulation(sc, doOnlinePlot=False, isNoise=False)
    sim.runsimulation("SCP")

    cfg, data = builders.frog()
    cfg = cfg.replace(rk4_substeps=2)
    carry, out = engine.simulate(cfg, data, n_steps=n_steps)

    ref_u = sim.controlPredictions[0, :, :n_steps].T
    np.testing.assert_allclose(np.asarray(out.u_applied), ref_u,
                               rtol=1e-4, atol=1e-6)

    tps = sc.ticks_per_sim
    for i in range(n_steps):
        ref_state = sim.vehiclePathFullRes[:, :, (i + 1) * tps].T
        got_state = np.asarray(out.states[i, -1])
        np.testing.assert_allclose(got_state, ref_state, rtol=1e-4, atol=5e-5,
                                   err_msg=f"step {i}")

    # obstacle predictions must match IterClass exactly
    it0 = sim.iterationStructs[0]
    from scp_tpu.sim.engine import predict_obstacles
    import jax
    obst = predict_obstacles(cfg, data, jnp.array(0))
    want = np.transpose(it0.obstacleFutureTrajectories, (0, 2, 1))
    np.testing.assert_allclose(np.asarray(obst), want, rtol=1e-9, atol=1e-9)
