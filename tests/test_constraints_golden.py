"""Golden tests: structured constraints vs the reference's dense QCQP tensors."""
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "tests")
from reference_oracle import load_reference, make_scenario  # noqa: E402

from scp_tpu.ops import constraints as con  # noqa: E402
from scp_tpu.ops import discretize, condensed  # noqa: E402


def build_ref_controller(kind="circle", n_veh=3):
    """Reference SCPcontroller (QCQP_formulate done in __init__)."""
    import cvxpy_shim
    cvxpy_shim.install()
    ref, sc = make_scenario(kind, n_veh)
    x_measured = np.hstack(sc.x0).T
    u_path = np.zeros((sc.nVeh, sc.ticks_delay_x + sc.ticks_per_sim + sc.ticks_delay_u))
    u_max = np.full((1, sc.nVeh), sc.mechanicalSteeringLimit)
    if sc.nObst:
        obst_state = sc.obstacles[:, :, 0]
    else:
        obst_state = np.zeros((0, 6))
    it = ref.MPC_Iter.IterClass(sc, x_measured, u_path, obst_state, u_max)
    ctrl = ref.SCP_controller.SCPcontroller(sc, it, {})
    return ref, sc, it, ctrl


def build_my_system(sc, it, ctrl):
    """Build our ConstraintSystem + cost blocks from the same Iter state."""
    n_veh, hp, hu = sc.nVeh, sc.Hp, sc.Hu
    math_b = jnp.array(np.transpose(ctrl.mpc.Mathcal_B, (2, 0, 1)))  # (V,...)
    const = jnp.array(ctrl.mpc.const_term[:, 0, :].T)                 # (V, hp*2)
    if sc.nObst:
        obst = jnp.array(np.transpose(it.obstacleFutureTrajectories, (0, 2, 1)))
    else:
        obst = jnp.zeros((0, hp, 2))
    sys_ = con.make_system(math_b, const, obst,
                           jnp.array(sc.dsafeVehicles),
                           jnp.array(sc.dsafeObstacles).reshape(n_veh, -1),
                           sc.dsafeExtra, hp, hu)
    phi0 = jnp.array(np.transpose(ctrl.mpc.Phi_0, (2, 0, 1)))
    psi0 = jnp.array(ctrl.mpc.Psi_0[:, 0, :].T)
    gamma0 = jnp.array(ctrl.mpc.gamma_0[0, :])
    return sys_, phi0, psi0, gamma0


def _ref_rows(ctrl, u0):
    """Reference linearized Aineq/bineq rows (SCP_controller.py:96-114)."""
    nv, hp, nobst = ctrl.nVeh, ctrl.Hp, ctrl.nObst
    rows, rhs = [], []
    for i in range(nv - 1):
        for j in range(i + 1, nv):
            for k in range(hp):
                phi = ctrl.qcqp["Phi"][i, j, k]
                rows.append(ctrl.qcqp["Psi"][i, j, k][:, 0] + 2 * u0[:, 0] @ phi)
                rhs.append(-(ctrl.qcqp["gamma"][i, j, k] - u0[:, 0] @ phi @ u0[:, 0]))
    for i in range(nv):
        for o in range(nobst):
            for k in range(hp):
                phi = ctrl.qcqp["Phi_o"][i, o, k]
                rows.append(ctrl.qcqp["Psi_o"][i, o, k][:, 0] + 2 * u0[:, 0] @ phi)
                rhs.append(-(ctrl.qcqp["gamma_o"][i, o, k] - u0[:, 0] @ phi @ u0[:, 0]))
    return np.array(rows), np.array(rhs)


def test_constraint_values_and_rows_circle():
    ref, sc, it, ctrl = build_ref_controller("circle", 3)
    sys_, phi0, psi0, gamma0 = build_my_system(sc, it, ctrl)
    rng = np.random.default_rng(3)
    u = rng.uniform(-0.05, 0.05, size=(sc.nVeh * sc.Hp, 1))

    # exact constraint values vs reference QCQP_evaluate
    (feas, objv, _, _, maxv, sumv, cveh, _) = ctrl.QCQP_evaluate(u)
    c_pair, _ = con.constraint_values(sys_, jnp.array(u[:, 0]))
    iu, ju = np.triu_indices(sc.nVeh, k=1)
    np.testing.assert_allclose(np.asarray(c_pair), cveh[iu, ju, :],
                               rtol=1e-9, atol=1e-9)

    ev = con.evaluate(sys_, jnp.array(u[:, 0]), 2 * 2.1e-3, compat_q5=True)
    assert bool(ev.feasible) == feas
    np.testing.assert_allclose(float(ev.max_violation), maxv, atol=1e-10)
    np.testing.assert_allclose(float(ev.sum_violations), sumv, atol=1e-9)

    obj = con.objective(phi0, psi0, gamma0, jnp.array(u[:, 0]))
    np.testing.assert_allclose(float(obj), objv[0, 0], rtol=1e-9)

    # linearized rows vs reference Aineq/bineq
    A_ref, b_ref = _ref_rows(ctrl, u)
    G, rhs = con.linearize(sys_, jnp.array(u[:, 0]))
    np.testing.assert_allclose(np.asarray(G), A_ref, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(rhs), b_ref, rtol=1e-8, atol=1e-9)


def test_constraint_values_and_rows_frog():
    """Single vehicle + 22 obstacles (Frog): exercises the obstacle path and
    the Q5 compat skip."""
    ref, sc, it, ctrl = build_ref_controller("frog", 1)
    sys_, phi0, psi0, gamma0 = build_my_system(sc, it, ctrl)
    rng = np.random.default_rng(4)
    u = rng.uniform(-0.05, 0.05, size=(sc.nVeh * sc.Hp, 1))

    (feas, objv, _, _, maxv, sumv, _, cobs) = ctrl.QCQP_evaluate(u)
    # Q5: reference never evaluates obstacle constraints with nVeh == 1.
    ev = con.evaluate(sys_, jnp.array(u[:, 0]), 2 * 2.1e-3, compat_q5=True)
    assert bool(ev.feasible) == feas
    np.testing.assert_allclose(float(ev.max_violation), maxv, atol=1e-12)

    # but the true obstacle constraint values must match the dense tensors
    c_pair, c_obst = con.constraint_values(sys_, jnp.array(u[:, 0]))
    want = np.zeros((1, sc.nObst, sc.Hp))
    for o in range(sc.nObst):
        for k in range(sc.Hp):
            phi = ctrl.qcqp["Phi_o"][0, o, k]
            want[0, o, k] = (u[:, 0] @ phi @ u[:, 0]
                             + ctrl.qcqp["Psi_o"][0, o, k][:, 0] @ u[:, 0]
                             + ctrl.qcqp["gamma_o"][0, o, k])
    np.testing.assert_allclose(np.asarray(c_obst), want, rtol=1e-8, atol=1e-9)

    A_ref, b_ref = _ref_rows(ctrl, u)
    G, rhs = con.linearize(sys_, jnp.array(u[:, 0]))
    np.testing.assert_allclose(np.asarray(G), A_ref, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(rhs), b_ref, rtol=1e-8, atol=1e-9)


def test_penalty_score_gradient_matches_reference():
    ref, sc, it, ctrl = build_ref_controller("circle", 4)
    sys_, phi0, psi0, gamma0 = build_my_system(sc, it, ctrl)
    rng = np.random.default_rng(9)
    # push vehicles into violation so penalty terms activate
    u = rng.uniform(-0.05, 0.05, size=(sc.nVeh * sc.Hp, 1))
    (_, _, score_ref, grad_ref, *_rest) = ctrl.QCQP_evaluate(u)
    score, grad = con.penalty_score(sys_, phi0, psi0, gamma0,
                                    jnp.array(u[:, 0]))
    np.testing.assert_allclose(float(score), np.asarray(score_ref).item(),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_ref)[:, 0],
                               rtol=1e-7, atol=1e-6)


def test_penalty_score_gradient_frog_q5():
    ref, sc, it, ctrl = build_ref_controller("frog", 1)
    sys_, phi0, psi0, gamma0 = build_my_system(sc, it, ctrl)
    rng = np.random.default_rng(10)
    u = rng.uniform(-0.05, 0.05, size=(sc.nVeh * sc.Hp, 1))
    (_, _, score_ref, grad_ref, *_rest) = ctrl.QCQP_evaluate(u)
    score, grad = con.penalty_score(sys_, phi0, psi0, gamma0,
                                    jnp.array(u[:, 0]))
    np.testing.assert_allclose(float(score), np.asarray(score_ref).item(),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_ref)[:, 0],
                               rtol=1e-7, atol=1e-6)
