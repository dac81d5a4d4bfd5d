"""Break down the bench step (B=1024, n_veh=4, hp=20) into pre/solve/post.

Timing through the axon tunnel: force a scalar readback per measurement and
subtract the ~29 ms round-trip baseline (jax.block_until_ready does not
synchronize through the tunnel).
"""
import os
import sys
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
from scp_tpu.solvers import scp

from scp_tpu import config as config_lib

BATCH, N_VEH, HP = 1024, 4, 20
PHASES = config_lib.TUNED_F32_PHASES

cfg, data = batch_lib.make_batch(
    "circle", BATCH, key=jax.random.PRNGKey(42), dtype=jnp.float32,
    n_veh=N_VEH)
cfg = config_lib.tuned_f32(cfg.replace(hp=HP, hu=HP))
carry0 = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)

# advance one step so we time the warm-started steady state (same as bench)
step_full = jax.jit(lambda d, c: engine.mpc_step_batch(cfg, d, c,
                                                       phases=PHASES))
carry, _ = step_full(data, carry0)
float(carry.state.sum())


def timeit(fn, *args, iters=5):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())   # compile + warm
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.time() - t0 - 0.029) / iters


# readback baseline
x = jnp.zeros((1,))
noop = jax.jit(lambda v: v + 1)
base = timeit(noop, x)

kw = engine._scp_kwargs(cfg)

pre = jax.jit(lambda d, c: jax.vmap(
    lambda di, ci: engine.controller_pre(cfg, di, ci))(d, c))
problem, aux = pre(data, carry)

solve = jax.jit(lambda p, u: scp.solve_scp_batch(
    p, u, max_scp_iter=cfg.max_scp_iter, phases=PHASES, **kw))
res = solve(problem, carry.u_warm)

solve1 = jax.jit(lambda p, u: scp.solve_scp_stacked(
    p, u, max_scp_iter=1, **kw))
solve_p1 = jax.jit(lambda p, u: scp.solve_scp_stacked(
    p, u, max_scp_iter=4, **kw))

keys = jax.vmap(jax.random.split)(carry.key)
post = jax.jit(lambda d, c, r, a: jax.vmap(
    lambda di, ci, ri, ai, k, kn: engine.step_post(cfg, di, ci, ri, ai, k, kn)
)(d, c, r, a, keys[:, 0], keys[:, 1]))

t_full = timeit(step_full, data, carry)
t_pre = timeit(pre, data, carry)
t_solve = timeit(solve, problem, carry.u_warm)
t_1 = timeit(solve1, problem, carry.u_warm)
t_p1 = timeit(solve_p1, problem, carry.u_warm)
t_post = timeit(post, data, carry, res, aux)

print(f"readback baseline extra: {base*1e3:.1f} ms")
print(f"full step:        {t_full*1e3:7.1f} ms")
print(f"  pre:            {t_pre*1e3:7.1f} ms")
print(f"  solve (phases): {t_solve*1e3:7.1f} ms")
print(f"    1 scp iter:   {t_1*1e3:7.1f} ms")
print(f"    4 scp iters:  {t_p1*1e3:7.1f} ms")
print(f"  post:           {t_post*1e3:7.1f} ms")
print(f"  sum parts:      {(t_pre+t_solve+t_post)*1e3:7.1f} ms")
print(f"mean scp iters this step: {float(res.iters.mean()):.2f}, "
      f"converged: {float(res.converged.mean()):.3f}")
