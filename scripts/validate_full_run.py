"""Full-length closed-loop parity validation vs the reference.

Runs the ORIGINAL reference Simulation (cvxpy shimmed to our f64 QP solver)
for the full 50-step horizon and compares applied controls and states
step-by-step against scp_tpu.sim.engine. Slow (minutes) — run manually:

    python scripts/validate_full_run.py [n_veh] [n_steps]

Writes a summary to artifacts/validation_<scenario>.json.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main(n_veh=3, n_steps=50):
    from test_closed_loop_golden import run_reference_sim
    from scp_tpu.scenarios import builders
    from scp_tpu.sim import engine

    print(f"running reference Simulation: {n_veh} vehicles, {n_steps} steps")
    sc, sim = run_reference_sim(n_veh, n_steps)

    print("running scp_tpu engine")
    cfg, data = builders.circle(n_veh)
    cfg = cfg.replace(rk4_substeps=2)
    carry, out = engine.simulate(cfg, data, n_steps=n_steps)

    ref_u = sim.controlPredictions[0, :, :n_steps].T
    got_u = np.asarray(out.u_applied)
    u_err = np.abs(got_u - ref_u)

    tps = sc.ticks_per_sim
    state_err = np.zeros(n_steps)
    pos_err = np.zeros(n_steps)
    for i in range(n_steps):
        ref_state = sim.vehiclePathFullRes[:, :, (i + 1) * tps].T
        got_state = np.asarray(out.states[i, -1])
        state_err[i] = np.abs(got_state - ref_state).max()
        pos_err[i] = np.abs(got_state[:, :2] - ref_state[:, :2]).max()

    summary = {
        "scenario": "circle",
        "n_veh": n_veh,
        "n_steps": n_steps,
        "max_abs_control_error_rad": float(u_err.max()),
        "max_abs_state_error": float(state_err.max()),
        "max_abs_position_error_m": float(pos_err.max()),
        "final_position_error_m": float(pos_err[-1]),
        "all_feasible": bool(np.all(np.asarray(out.feasible))),
        "ref_steering_exceeded": bool(sim.steeringLimitsExceeded),
    }
    print(json.dumps(summary, indent=2))
    os.makedirs("artifacts", exist_ok=True)
    with open(f"artifacts/validation_circle_{n_veh}veh.json", "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    n_veh = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    main(n_veh, n_steps)
