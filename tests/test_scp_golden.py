"""Golden test: full SCP loop vs the reference SCP_optimizer.

The reference loop runs with our mini-cvxpy shim (same f64 QP solver
underneath), so differences isolate the outer-loop logic: linearization,
slack handling, merit bookkeeping, stopping rule.
"""
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "tests")
from test_constraints_golden import build_ref_controller, build_my_system  # noqa: E402

from scp_tpu.solvers import scp  # noqa: E402


def run_pair(kind, n_veh, seed=0):
    ref, sc, it, ctrl = build_ref_controller(kind, n_veh)
    sys_, phi0, psi0, gamma0 = build_my_system(sc, it, ctrl)

    rng = np.random.default_rng(seed)
    u0 = rng.uniform(-0.01, 0.01, size=(sc.nVeh * sc.Hp, 1))

    u_ref, feas_ref, obj_ref, log = ctrl.SCP_optimizer(u0.copy())

    problem = scp.SCPProblem(sys=sys_, phi0=phi0, psi0=psi0, gamma0=gamma0)
    res = scp.solve_scp(problem, jnp.array(u0[:, 0]),
                        u_lim=sc.uLim, qp_tol=1e-10, qp_max_iter=60)
    return sc, u_ref, feas_ref, log, res


def test_scp_circle_3veh():
    sc, u_ref, feas_ref, log, res = run_pair("circle", 3)
    assert int(res.iters) == len(log["u"])
    np.testing.assert_allclose(np.asarray(res.u), u_ref[:, 0],
                               rtol=1e-5, atol=1e-7)
    assert bool(res.feasible) == bool(log["feasible"][-1])


def test_scp_circle_5veh():
    sc, u_ref, feas_ref, log, res = run_pair("circle", 5, seed=1)
    assert int(res.iters) == len(log["u"])
    np.testing.assert_allclose(np.asarray(res.u), u_ref[:, 0],
                               rtol=1e-5, atol=1e-7)


def test_scp_frog_single_vehicle():
    sc, u_ref, feas_ref, log, res = run_pair("frog", 1, seed=2)
    assert int(res.iters) == len(log["u"])
    np.testing.assert_allclose(np.asarray(res.u), u_ref[:, 0],
                               rtol=1e-4, atol=1e-6)
