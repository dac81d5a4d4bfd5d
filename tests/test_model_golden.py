"""Golden tests: bicycle model + discretization + condensed matrices vs reference."""
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "tests")
from reference_oracle import load_reference, make_scenario  # noqa: E402

from scp_tpu.models import bicycle  # noqa: E402
from scp_tpu.ops import condensed, discretize  # noqa: E402


def random_states(n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 6))
    x[:, 3] = rng.uniform(1.0, 6.0, size=n)       # speed
    x[:, 5] = rng.uniform(-0.05, 0.05, size=n)    # steering
    return x


def test_ode_matches_reference():
    ref = load_reference()
    model = ref.Model.BicyleModel(is_noise=False)
    lf = lr = 0.34
    for x in random_states(16):
        for u in (-0.05, 0.0, 0.03):
            want = model.ode(x.copy(), 0.0, u, lf, lr)
            got = np.asarray(bicycle.ode(jnp.array(x), jnp.array(u), lf, lr))
            np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_autodiff_jacobian_matches_symbolic():
    ref = load_reference()
    model = ref.Model.BicyleModel(is_noise=False)
    lf, lr = 0.34, 0.34
    for x in random_states(8, seed=1):
        u = np.array([0.01])
        Ac_ref, Bc_ref, _, Ec_ref = model.comp_jacobian(x, u, lf, lr)
        Ac, Bc, Ec = bicycle.linearize(jnp.array(x), jnp.array(u[0]), lf, lr)
        np.testing.assert_allclose(np.asarray(Ac), Ac_ref, rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(Bc), Bc_ref, rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(Ec).ravel(), Ec_ref.ravel(),
                                   rtol=1e-9, atol=1e-11)


def test_rk4_matches_odeint():
    import scipy.integrate

    ref = load_reference()
    model = ref.Model.BicyleModel(is_noise=False)
    lf = lr = 0.34
    x0 = np.array([0.0, 0.0, 0.3, 4.0, 0.0, 0.01])
    u = 0.02
    T = 0.43
    ts = np.linspace(0, T, 10)
    want = scipy.integrate.odeint(model.ode, x0, ts, args=(u, lf, lr))
    # RK4 on the same 10-point grid with substeps per interval.
    got = bicycle.integrate(jnp.array(x0), jnp.array(u), lf, lr,
                            h=float(ts[1] - ts[0]), n_steps=9, substeps=4)
    # odeint's own default tolerance is ~1.5e-8; RK4 at this step size is
    # ~1e-12, so the comparison is bounded by the reference integrator.
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=5e-8)


def test_zoh_matches_reference_discretize():
    ref, sc = make_scenario("circle", 3)
    mpc_cls = ref.MPC_Iter.MPCclass.__new__(ref.MPC_Iter.MPCclass)
    model = sc.model
    x0 = np.array([-20.0, 3.0, 0.4, 4.0, 0.0, 0.01])
    u0 = np.array([0.005])
    Ad_ref, Bd_ref, _, Ed_ref = mpc_cls.discretize(x0, u0, 0.34, 0.34, sc.dt, model)
    Ad, Bd, Ed = discretize.linearize_and_discretize(
        jnp.array(x0), jnp.array(u0[0]), 0.34, 0.34, sc.dt)
    np.testing.assert_allclose(np.asarray(Ad), Ad_ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Bd), Bd_ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Ed), Ed_ref.ravel(), rtol=1e-9, atol=1e-12)


def test_condensed_matrices_match_reference():
    ref, sc = make_scenario("circle", 3)
    n_veh, hp, hu = sc.nVeh, sc.Hp, sc.Hu
    x_measured = np.hstack(sc.x0).T          # (nVeh, 6)
    u_path = np.zeros((n_veh, sc.ticks_delay_x + sc.ticks_per_sim + sc.ticks_delay_u))
    u_max = np.full((1, n_veh), sc.mechanicalSteeringLimit)
    it = ref.MPC_Iter.IterClass(sc, x_measured, u_path, np.zeros((0, 6)), u_max)
    mpc = ref.MPC_Iter.MPCclass(sc, it)

    for v in range(n_veh):
        A, B, E = discretize.linearize_and_discretize(
            jnp.array(it.x0[v]), jnp.array(it.u0[v, 0]),
            sc.Lf[v], sc.Lr[v], sc.dt)
        reference = jnp.array(
            it.ReferenceTrajectoryPoints[:, :, v].reshape(hp * 2))
        cm = condensed.build_condensed(
            A, B, E, jnp.array(it.x0[v]), reference,
            sc.Q[v], sc.R[v], sc.Q_final[v], hp, hu)
        np.testing.assert_allclose(np.asarray(cm.math_a), mpc.Mathcal_A[:, :, v],
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(cm.math_b), mpc.Mathcal_B[:, :, v],
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(cm.math_c), mpc.Mathcal_C[:, 0, v],
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(cm.const_term), mpc.const_term[:, 0, v],
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(cm.phi0), mpc.Phi_0[:, :, v],
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(cm.psi0), mpc.Psi_0[:, 0, v],
                                   rtol=1e-8, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cm.gamma0), mpc.gamma_0[0, v],
                                   rtol=1e-8, atol=1e-6)
