"""Find what makes solve_scp_stacked cost ~10.2 ms/iter when an equivalent
fori-loop body costs ~7.2 ms: data-dependent while cond? kwargs? carry?

Runs a verbatim inline copy of the stacked loop with toggles.
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
from scp_tpu.solvers import scp

BATCH, N_VEH, HP = 1024, 4, 20

cfg, data = batch_lib.make_batch(
    "circle", BATCH, key=jax.random.PRNGKey(42), dtype=jnp.float32,
    n_veh=N_VEH)
cfg = cfg.replace(hp=HP, hu=HP, delta_tol_rel=1e-4, u_step_tol=1e-5,
                  merit_patience=2, qp_tol=1e-6, qp_fixed_iters=9)
carry0 = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)
step_full = jax.jit(lambda d, c: engine.mpc_step_batch(
    cfg, d, c, phases=((4, 1), (2, 2), (14, 8))))
carry, _ = step_full(data, carry0)
float(carry.state.sum())
pre = jax.jit(lambda d, c: jax.vmap(
    lambda di, ci: engine.controller_pre(cfg, di, ci))(d, c))
problem, aux = pre(data, carry)
u0 = carry.u_warm
kw = engine._scp_kwargs(cfg)
print("kw:", {k: v for k, v in kw.items()})


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


def t_variant(label, iters_list=(2, 4), **over):
    kw2 = dict(kw)
    kw2.update(over)
    ts = []
    for it in iters_list:
        fn = jax.jit(lambda p, u, it=it: scp.solve_scp_stacked(
            p, u, max_scp_iter=it, **kw2))
        ts.append(timeit(fn, problem, u0) - base)
    marg = (ts[-1] - ts[0]) / (iters_list[-1] - iters_list[0])
    print(f"{label:32s}: " + " / ".join(f"{t*1e3:.2f}" for t in ts)
          + f" ms  marginal {marg*1e3:.2f} ms")


t_variant("stacked as-bench")
t_variant("merit_patience=0", merit_patience=0)
t_variant("u_step_tol=0", u_step_tol=0)
t_variant("delta_tol_rel=0", delta_tol_rel=0)
t_variant("minimal merit logic", merit_patience=0, u_step_tol=0,
          delta_tol_rel=0)
t_variant("qp_tol=1e-8 (vs 1e-6)", qp_tol=1e-8)
