"""Does the production whole-step jit get the good (constant-like) layouts?

Time mpc_step_batch with flat phase schedules and diff per-iteration cost
against the separately-jitted solve_scp_stacked numbers (6 vs 9 ms/iter).
"""
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_default_matmul_precision", "highest")

from scp_tpu.scenarios import batch as batch_lib
from scp_tpu.sim import engine

BATCH, N_VEH, HP = 1024, 4, 20
cfg, data = batch_lib.make_batch(
    "circle", BATCH, key=jax.random.PRNGKey(42), dtype=jnp.float32,
    n_veh=N_VEH)
cfg = cfg.replace(hp=HP, hu=HP, delta_tol_rel=1e-4, u_step_tol=1e-5,
                  merit_patience=2, qp_tol=1e-6, qp_fixed_iters=9)
carry0 = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)
warm = jax.jit(lambda d, c: engine.mpc_step_batch(
    cfg, d, c, phases=((4, 1), (2, 2), (14, 8))))
carry, _ = warm(data, carry0)
float(carry.state.sum())


def timeit(fn, *args, iters=10):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.time() - t0) / iters


noop = jax.jit(lambda v: v + 1)
base = timeit(noop, jnp.zeros((1,)))
print(f"baseline: {base*1e3:.2f} ms")

ts = {}
for it in (2, 4):
    fn = jax.jit(lambda d, c, it=it: engine.mpc_step_batch(
        cfg, d, c, phases=((it, 1),)))
    ts[it] = timeit(fn, data, carry) - base
    print(f"step phases=(({it},1),): {ts[it]*1e3:.2f} ms")
print(f"production marginal: {(ts[4]-ts[2])/2*1e3:.2f} ms/iter")
