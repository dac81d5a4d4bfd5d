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


def test_scp_trace_matches_reference_log():
    """solve_scp(trace=True)'s per-iteration record reproduces the
    reference's printed merit sequence (SCP_controller.py:159-189):
    objValue ('QCQP_ObjVal') and the merit decrease ('delta') per SCP
    iteration, plus identical final state to the untraced solve
    (VERDICT r4 next #5)."""
    ref, sc, it, ctrl = build_ref_controller("circle", 3)
    sys_, phi0, psi0, gamma0 = build_my_system(sc, it, ctrl)
    rng = np.random.default_rng(0)
    u0 = rng.uniform(-0.01, 0.01, size=(sc.nVeh * sc.Hp, 1))
    u_ref, feas_ref, obj_ref, log = ctrl.SCP_optimizer(u0.copy())

    problem = scp.SCPProblem(sys=sys_, phi0=phi0, psi0=psi0, gamma0=gamma0)
    res, tr = scp.solve_scp(problem, jnp.array(u0[:, 0]),
                            u_lim=sc.uLim, qp_tol=1e-10, qp_max_iter=60,
                            trace=True)
    n_it = int(np.asarray(tr.active).sum())
    assert n_it == len(log["QCQP_ObjVal"])
    # per-iteration objective sequence == the reference's logged objValue
    np.testing.assert_allclose(
        np.asarray(tr.obj)[:n_it],
        np.asarray([float(np.ravel(v)[0]) for v in log["QCQP_ObjVal"]]),
        rtol=1e-5, atol=1e-7)
    # per-iteration merit decrease == the reference's 'delta'
    np.testing.assert_allclose(
        np.asarray(tr.delta)[:n_it],
        np.asarray([float(np.ravel(v)[0]) for v in log["delta"]]),
        rtol=1e-4, atol=1e-6)
    assert bool(np.asarray(tr.qp_converged)[:n_it].all())
    # traced == untraced (the scan freezes exactly where the loop stops)
    res_plain = scp.solve_scp(problem, jnp.array(u0[:, 0]),
                              u_lim=sc.uLim, qp_tol=1e-10, qp_max_iter=60)
    np.testing.assert_array_equal(np.asarray(res.u),
                                  np.asarray(res_plain.u))
    assert int(res.iters) == int(res_plain.iters) == n_it


def test_scp_trace_debug_entry_point():
    """utils.debug.scp_iteration_trace: the engine-level opt-in trace for
    one instance returns the truncated per-iteration record."""
    import jax

    from scp_tpu.scenarios import builders
    from scp_tpu.sim import engine
    from scp_tpu.utils import debug

    cfg, data = builders.circle(3, dtype=jnp.float64)
    cfg = cfg.replace(hp=5, hu=5, max_scp_iter=6, qp_max_iter=20)
    tr = debug.scp_iteration_trace(cfg, data)
    n_it = tr["iters"]
    assert 1 <= n_it <= 6
    for k in ("obj", "max_violation", "merit", "delta", "qp_converged"):
        assert tr[k].shape == (n_it,), k
    # merit bookkeeping is self-consistent: merit = obj + w * viol
    np.testing.assert_allclose(
        tr["merit"], tr["obj"] + cfg.slack_weight * tr["max_violation"],
        rtol=1e-12)
    # the traced endpoint equals the engine's own step result
    carry = engine.init_carry(cfg, data)
    res, *_ = engine.mpc_controller(cfg, data, carry)
    np.testing.assert_allclose(tr["u"], np.asarray(res.u), rtol=1e-12)
