"""Scenario-batch randomization: distinct instances for every family.

VERDICT r1 weak-point 5: frog/parallel batches used to tile one instance, so
large-batch benchmarks of those families solved n copies of the same problem.
Each family's randomizer must produce distinct instances that remain feasible
at u = 0 on step 0 (the reference's initial-feasibility guard,
main.py:196-199).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scp_tpu.scenarios import batch as batch_lib
from scp_tpu.sim import engine
from scp_tpu.ops import constraints as con


@pytest.mark.parametrize("kind", ["circle", "frog", "parallel"])
def test_batch_instances_distinct(kind):
    cfg, data = batch_lib.make_batch(kind, 4, key=jax.random.PRNGKey(3),
                                     dtype=jnp.float64)
    x0 = np.asarray(data.x0)
    # initial conditions differ across the batch
    assert np.ptp(x0, axis=0).max() > 1e-3, f"{kind}: identical x0 batch"
    if kind in ("frog", "parallel"):
        obst = np.asarray(data.obstacles)
        assert np.ptp(obst[:, :, :2], axis=0).max() > 1e-3, (
            f"{kind}: identical obstacle batch")
    if kind == "parallel":
        ref = np.asarray(data.ref_points)
        assert np.ptp(ref[:, :, :, 1], axis=0).max() > 1e-3, (
            "parallel: lane set not shifted")


@pytest.mark.parametrize("kind", ["circle", "frog", "parallel"])
def test_batch_instances_initially_feasible(kind):
    """Every randomized instance passes the u=0 step-0 QCQP feasibility
    guard (main.py:196-199) — jitter must not create broken problems."""
    cfg, data = batch_lib.make_batch(kind, 8, key=jax.random.PRNGKey(11),
                                     dtype=jnp.float64)

    def initial_feasible(d):
        carry = engine.init_carry(cfg, d)
        problem, _ = engine.controller_pre(cfg, d, carry)
        u0 = jnp.zeros((cfg.n_veh * cfg.hu,), d.x0.dtype)
        ev = con.evaluate(problem.sys, u0, cfg.constraint_tolerance,
                          compat_q5=False)
        return ev.feasible

    feas = jax.vmap(initial_feasible)(data)
    assert bool(jnp.all(feas)), f"{kind}: infeasible instance in batch"
