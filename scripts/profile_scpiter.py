"""Chained-marginal split of one PRODUCTION SCP iteration at B=1024.

Methodology (BENCHMARKS.md): pairs of programs with k vs k+delta chained
repetitions, differenced, so dispatch and the tunnel round trip cancel.

  - marginal SCP iteration: solve_scp_stacked with the stop rule disabled,
    max_scp_iter = 6 vs 9
  - marginal fused-QP iteration: the same solve at qp_fixed_iters 7 vs 14
    (isolates the kernel + per-QP setup from the SCP-level glue)
  - linearize_slabs + evaluate chained alone (the SCP-level glue)
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

from scp_tpu.ops import constraints as con
from scp_tpu.scenarios import batch as batch_lib
from scp_tpu.sim import engine
from scp_tpu.solvers import scp

BATCH, N_VEH, HP = 1024, 4, 20
cfg, data = batch_lib.make_batch(
    "circle", BATCH, key=jax.random.PRNGKey(42), dtype=jnp.float32,
    n_veh=N_VEH)
cfg = cfg.replace(hp=HP, hu=HP, delta_tol_rel=1e-4, u_step_tol=1e-5,
                  merit_patience=2, qp_tol=1e-6, qp_fixed_iters=7)
carry0 = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)
step = jax.jit(lambda d, c: engine.mpc_step_batch(
    cfg, d, c, phases=((3, 1), (2, 2), (15, 8))))
carry, _ = step(data, carry0)   # warm-started steady state
carry, _ = step(data, carry)
problem, aux = jax.jit(lambda d, c: jax.vmap(
    lambda di, ci: engine.controller_pre(cfg, di, ci))(d, c))(data, carry)
float(carry.state.sum())

kw = engine._scp_kwargs(cfg)
# disable every stop: all lanes run to the cap
kw_nostop = {**kw, "delta_tol": 0.0, "delta_tol_rel": 0.0,
             "u_step_tol": 0.0, "merit_patience": 0}


def timed(fn, *args, iters=8):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].sum())
        best = min(best, (time.time() - t0) / iters)
    return best


def scp_iters_t(k, qp_it=7):
    f = jax.jit(lambda p, u: scp.solve_scp_stacked(
        p, u, max_scp_iter=k, **{**kw_nostop, "qp_fixed_iters": qp_it}))
    return timed(f, problem, carry.u_warm)


t6 = scp_iters_t(6)
t9 = scp_iters_t(9)
marg_scp = (t9 - t6) / 3
print(f"marginal SCP iteration (7 qp iters): {marg_scp*1e3:7.3f} ms")

t6_14 = scp_iters_t(6, 14)
marg_qp = (t6_14 - t6) / (6 * 7)
print(f"marginal fused-QP iteration:         {marg_qp*1e3:7.3f} ms "
      f"(x7 = {marg_qp*7e3:.3f})")
print(f"SCP-level glue (iter - 7*qp):        "
      f"{(marg_scp - marg_qp*7)*1e3:7.3f} ms")


# linearize+evaluate chained alone
def lin_eval_chain(k):
    def f(u):
        def body(u, _):
            gi, gj, gob, rhs = jax.vmap(
                lambda s, uu: con.linearize_slabs(s, uu))(problem.sys, u)
            ev = jax.vmap(lambda s, uu: con.evaluate(
                s, uu, cfg.constraint_tolerance))(problem.sys, u)
            obj = jax.vmap(con.objective)(problem.phi0, problem.psi0,
                                          problem.gamma0, u)
            du = (jnp.sum(gi, (1, 2, 3)) + jnp.sum(gob, (1, 2, 3, 4))
                  + jnp.sum(rhs, 1) + ev.max_violation + obj)
            return u + du[:, None] * 1e-30, None

        return jax.lax.scan(body, u, None, length=k)[0]

    return jax.jit(f)


tl4 = timed(lin_eval_chain(4), carry.u_warm)
tl12 = timed(lin_eval_chain(12), carry.u_warm)
print(f"linearize+evaluate+objective:        {(tl12-tl4)/8*1e3:7.3f} ms")
