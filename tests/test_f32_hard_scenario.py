"""Regression: f32 closed loop on the hardest scenario (8-veh parallel).

Pins the Jacobi-scaled KKT factorization: without it the f32 IPM's
Cholesky destroys the O(1) tracking rows of the scale-disparate KKT matrix
(absolute error ~eps*max|K|), injecting ~2e-2 rad of steering noise per
step; the closed loop then enters the obstacle field on a wrong homotopy
and goes infeasible from step ~11 (f64 is feasible throughout). See
BENCHMARKS.md "f32 Cholesky on a scale-disparate KKT".
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np


def test_parallel8_f32_closed_loop_feasible():
    from scp_tpu.scenarios import builders
    from scp_tpu.sim import engine

    cfg, data = builders.parallel(n_veh=8, dtype=jnp.float32)
    cfg = cfg.replace(delta_tol_rel=1e-4, u_step_tol=1e-5, qp_tol=1e-6,
                      qp_fixed_iters=14)
    sim = jax.jit(functools.partial(engine.simulate, cfg, n_steps=15))
    _, out = sim(data, key=jax.random.PRNGKey(0))
    feas = np.asarray(out.feasible)
    assert feas.all(), f"infeasible steps: {np.where(~feas)[0].tolist()}"
    assert float(np.asarray(out.max_violation).max()) == 0.0


def test_flat_objective_qp_f32_accuracy():
    """The step-0 parallel QP has a near-zero tracking objective; the f32
    solution must resolve it to ~1e-3 in u (was 2.4e-2 before the Jacobi
    scaling)."""
    from scp_tpu.ops import constraints as con
    from scp_tpu.scenarios import builders
    from scp_tpu.sim import engine
    from scp_tpu.solvers import qp

    cfg, data = builders.parallel(n_veh=8, dtype=jnp.float32)
    carry = engine.init_carry(cfg, data)
    problem, _ = jax.jit(
        lambda d, c: engine.controller_pre(cfg, d, c))(data, carry)
    v, hu, n = 8, 10, 80
    dtype = jnp.float32
    P = jnp.zeros((n + 1, n + 1), dtype)
    for i in range(v):
        P = P.at[i * hu:(i + 1) * hu, i * hu:(i + 1) * hu].set(
            2.0 * problem.phi0[i])
    q = jnp.concatenate([problem.psi0.reshape(n),
                         jnp.array([cfg.slack_weight], dtype)])
    lb = jnp.concatenate([jnp.full((n,), -cfg.u_lim, dtype),
                          jnp.zeros((1,), dtype)])
    ub = jnp.concatenate([jnp.full((n,), cfg.u_lim, dtype),
                          jnp.full((1,), cfg.slack_ub, dtype)])
    u0 = jnp.zeros((n,), dtype).at[0].set(jnp.finfo(dtype).eps)
    G_c, rhs = con.linearize(problem.sys, u0)
    G = jnp.concatenate(
        [G_c, jnp.full((G_c.shape[0], 1), -1.0, dtype)], axis=1)
    sol = qp.solve_qp(P, q, G, rhs, lb, ub,
                      x0=jnp.concatenate([u0, jnp.zeros((1,), dtype)]),
                      fixed_iters=14, tol=1e-6)
    # the optimum is u ~ 0 (vehicle on its reference); f32 must land close
    # (2.4e-2 before the Jacobi scaling, ~2.4e-3 after: the production
    # freeze-on-stall stops a little earlier than the unguarded method)
    assert float(jnp.abs(sol.x[:n]).max()) < 5e-3
