"""Sharded batch execution on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from scp_tpu.parallel import mesh as mesh_lib
from scp_tpu.scenarios import batch as batch_lib
from scp_tpu.sim import engine


def test_sharded_mpc_step_matches_vmap():
    n_dev = len(jax.devices())
    assert n_dev == 8, f"conftest should give 8 CPU devices, got {n_dev}"
    cfg, data = batch_lib.make_batch("circle", 16, key=jax.random.PRNGKey(1),
                                     dtype=jnp.float64, n_veh=3)
    cfg = cfg.replace(hp=5, hu=5, max_scp_iter=3, qp_max_iter=10)

    def per_instance(d):
        carry = engine.init_carry(cfg, d)
        new_carry, out = engine.mpc_step(cfg, d, carry)
        return new_carry.state, (out.obj, out.max_violation)

    # plain vmap reference
    states_ref, metrics_ref = jax.vmap(per_instance)(data)

    m = mesh_lib.make_mesh()  # all 8 devices on 'data'
    run = mesh_lib.sharded_batch_run(per_instance, m)
    batch = mesh_lib.shard_batch(data, m)
    states, metrics = run(batch)

    np.testing.assert_allclose(np.asarray(states), np.asarray(states_ref),
                               rtol=1e-9, atol=1e-9)
    # psum-reduced totals equal the global sums
    np.testing.assert_allclose(float(metrics[0]),
                               float(jnp.sum(metrics_ref[0])), rtol=1e-9)


def test_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_monte_carlo_noise_vmap():
    cfg, data = batch_lib.make_batch("circle", 1, dtype=jnp.float64, n_veh=3)
    cfg = cfg.replace(hp=5, hu=5, max_scp_iter=2, qp_max_iter=8,
                      noise_std=1e-3)
    single = jax.tree_util.tree_map(lambda x: x[0], data)

    import functools
    sim = jax.jit(functools.partial(engine.simulate, cfg, single, n_steps=2))
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    carry, out = jax.vmap(lambda k: sim(key=k))(keys)
    states = np.asarray(carry.state)           # (4, V, NX)
    # noise makes rollouts differ across keys
    assert np.abs(states[0] - states[1]).max() > 0
    assert np.all(np.isfinite(states))


def test_distributed_sweep_8dev():
    from scp_tpu.parallel import distributed
    cfg, data = batch_lib.make_batch("circle", 16, key=jax.random.PRNGKey(5),
                                     dtype=jnp.float64, n_veh=3)
    cfg = cfg.replace(hp=5, hu=5, max_scp_iter=2, qp_max_iter=8)
    m = distributed.global_mesh()
    carries, summary = distributed.sweep(cfg, data, m, n_steps=2)
    total_obj, total_feas, total_iters = summary
    assert total_obj.shape == (2,)       # per-step reduced metrics
    assert float(total_feas[-1]) == 16.0  # all instances feasible
    assert np.all(np.isfinite(np.asarray(carries.state)))


def test_mpc_step_batch_matches_vmap():
    """Two-phase repacked batch step equals plain vmapped mpc_step."""
    cfg, data = batch_lib.make_batch("circle", 12, key=jax.random.PRNGKey(8),
                                     dtype=jnp.float64, n_veh=3)
    cfg = cfg.replace(hp=6, hu=6, max_scp_iter=6, qp_max_iter=20)
    carry = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)
    # align PRNG usage: both paths split each instance's key identically
    c2, out2 = jax.jit(lambda d, c: engine.mpc_step_batch(
        cfg, d, c, phase1_iters=3, straggler_frac=2))(data, carry)
    c1, out1 = jax.jit(jax.vmap(lambda d, c: engine.mpc_step(cfg, d, c)))(
        data, carry)
    np.testing.assert_allclose(np.asarray(out2.u_applied),
                               np.asarray(out1.u_applied),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(c2.state), np.asarray(c1.state),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(out2.feasible),
                                  np.asarray(out1.feasible))
