"""Side-selection (MIQP replacement) controller behavior tests.

There is no runnable integer-programming oracle in this environment (the
reference MIQP needs Gurobi, and its index mapping is corrupted — SURVEY.md
Q7), so these tests check the replacement's contract: hard feasibility of the
selected-side convex program and collision-free predicted trajectories on
scenarios where the MIQP formulation applies.
"""
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "tests")
from test_constraints_golden import build_ref_controller, build_my_system  # noqa: E402

from scp_tpu.ops import constraints as con  # noqa: E402
from scp_tpu.solvers import miqp  # noqa: E402


def test_select_sides_dominant_axis():
    d = jnp.array([[3.0, 1.0], [-2.0, 0.5], [0.1, -5.0], [1.0, 1.5]])
    onehot = np.asarray(miqp.select_sides(d))
    assert onehot.argmax(-1).tolist() == [0, 1, 3, 2]


def _solve(kind, n_veh, n_rounds=2):
    ref, sc, it, ctrl = build_ref_controller(kind, n_veh)
    sys_, phi0, psi0, gamma0 = build_my_system(sc, it, ctrl)
    v, hp = sc.nVeh, sc.Hp
    q = jnp.array(sc.Q, float)
    qf = jnp.array(sc.Q_final, float)
    r = jnp.array(sc.R, float)
    u0 = jnp.zeros((v,))
    u_max = jnp.full((v,), sc.mechanicalSteeringLimit)
    ref_pts = jnp.array(np.transpose(it.ReferenceTrajectoryPoints, (2, 0, 1)))
    res = miqp.solve_side_selection(
        sys_, ref_pts, q, qf, r, u0, u_max,
        jnp.zeros((v * hp,)), du_lim=sc.uLim, n_rounds=n_rounds)
    return sc, sys_, res


def test_frog_obstacle_avoidance():
    sc, sys_, res = _solve("frog", 1)
    assert bool(res.converged)
    # separated sides are conservative w.r.t. the circular QCQP constraint:
    # the hard program (slack ~ 0) implies true feasibility
    assert float(res.slack) < 1e-4
    c_pair, c_obst = con.constraint_values(sys_, res.u)
    assert float(jnp.max(c_obst)) <= sc.config.QCQP.constraintTolerance \
        if hasattr(sc, "config") else float(jnp.max(c_obst)) <= 2 * 2.1e-3
    # control respects bounds
    assert float(jnp.max(jnp.abs(res.u))) <= sc.mechanicalSteeringLimit + 1e-9


def test_circle_vehicle_separation():
    sc, sys_, res = _solve("circle", 4)
    assert bool(res.converged)
    c_pair, _ = con.constraint_values(sys_, res.u)
    # predicted trajectories keep the full safety distance on every step
    assert float(jnp.max(c_pair)) <= 2 * 2.1e-3
    # rate limits respected (first difference vs u0=0)
    u = np.asarray(res.u).reshape(sc.nVeh, sc.Hp)
    du = np.diff(np.concatenate([np.zeros((sc.nVeh, 1)), u], axis=1), axis=1)
    assert np.abs(du).max() <= sc.uLim + 1e-8
