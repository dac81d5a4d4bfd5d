"""Bisect the real solve_scp_stacked vs the hand copy: import the real
function, time it, then time variants created by textual surgery on its
source (exec'd into a matching namespace)."""
import inspect
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

from typing import NamedTuple
from scp_tpu.scenarios import batch as batch_lib
from scp_tpu.sim import engine
from scp_tpu.ops import constraints as con
from scp_tpu.solvers import qp, scp

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

SRC = inspect.getsource(scp.solve_scp_stacked)


def variant(name, *edits):
    src = SRC
    for old, new in edits:
        assert old in src, f"edit target missing: {old[:60]}"
        src = src.replace(old, new)
    ns = dict(jax=jax, jnp=jnp, con=con, qp=qp, NamedTuple=NamedTuple,
              SCPResult=scp.SCPResult, SCPProblem=scp.SCPProblem)
    exec(src, ns)
    f = ns["solve_scp_stacked"]
    ts = []
    for it in (2, 4):
        jf = jax.jit(lambda p, u, it=it: f(p, u, max_scp_iter=it, **kw))
        ts.append(timeit(jf, problem, u0) - base)
    print(f"{name:36s}: 2/4 = {ts[0]*1e3:.2f} / {ts[1]*1e3:.2f} ms  "
          f"marginal {(ts[1]-ts[0])/2*1e3:.2f} ms")


variant("verbatim")
variant("while->fori",
        ("out = jax.lax.while_loop(cond, body, init)",
         "out = jax.lax.fori_loop(0, max_scp_iter, "
         "lambda _i, c: body(c), init)"))
variant("no z carry",
        ("z=jnp.where(selc, sol.z, c.z),", "z=c.z,"))
variant("no qp_fails (drop sol.converged)",
        ("qp_fails=c.qp_fails + jnp.where(sel & ~sol.converged, 1, 0),",
         "qp_fails=c.qp_fails,"))
variant("no z + no conv",
        ("z=jnp.where(selc, sol.z, c.z),", "z=c.z,"),
        ("qp_fails=c.qp_fails + jnp.where(sel & ~sol.converged, 1, 0),",
         "qp_fails=c.qp_fails,"))


def variant_const(name):
    """Same verbatim source, but problem enters as a closure constant."""
    ns = dict(jax=jax, jnp=jnp, con=con, qp=qp, NamedTuple=NamedTuple,
              SCPResult=scp.SCPResult, SCPProblem=scp.SCPProblem)
    exec(SRC, ns)
    f = ns["solve_scp_stacked"]
    ts = []
    for it in (2, 4):
        jf = jax.jit(lambda u, it=it: f(problem, u, max_scp_iter=it, **kw))
        ts.append(timeit(jf, u0) - base)
    print(f"{name:36s}: 2/4 = {ts[0]*1e3:.2f} / {ts[1]*1e3:.2f} ms  "
          f"marginal {(ts[1]-ts[0])/2*1e3:.2f} ms")


variant_const("verbatim, problem as constant")
