"""Isolate the while-vs-fori gap for the exact stacked-SCP body.

profile_body.py --bisect measured 6.6 ms/iter for the body in a fori_loop
with all carry extras; solve_scp_stacked (while_loop) measures ~9 ms/iter.
Same body, same carries, only the loop construct + done-freeze differ.
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
from scp_tpu.ops import constraints as con
from scp_tpu.solvers import qp

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

sys_ = problem.sys
dtype = u0.dtype
b, v, hp, _, hu = sys_.b3.shape
n = v * hu
n_con = sys_.dsafe2_pair.shape[1] * hp + v * sys_.obst_pos.shape[1] * hp
P_qp = jnp.zeros((b, n + 1, n + 1), dtype)
for i in range(v):
    P_qp = P_qp.at[:, i * hu:(i + 1) * hu, i * hu:(i + 1) * hu].set(
        2.0 * problem.phi0[:, i])
q_qp = jnp.concatenate([problem.psi0.reshape(b, n),
                        jnp.full((b, 1), kw["slack_weight"], dtype)], axis=1)
lb = jnp.concatenate([jnp.full((b, n), -kw["u_lim"], dtype),
                      jnp.zeros((b, 1), dtype)], axis=1)
ub = jnp.concatenate([jnp.full((b, n), kw["u_lim"], dtype),
                      jnp.full((b, 1), kw["slack_ub"], dtype)], axis=1)
slack_col = jnp.full((b, n_con, 1), -1.0, dtype)
m_qp = n_con + 2 * (n + 1)
z0 = jnp.zeros((b, m_qp), dtype)


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


def body_core(c):
    """Verbatim solve_scp_stacked body state update."""
    (u, obj, viol, feasible, done, it, qp_iters, qp_fails,
     best_merit, stall, z) = c
    max_scp_iter = 999  # loop construct supplies the cap
    active = ~done
    G_c, rhs = jax.vmap(con.linearize)(sys_, u)
    G = jnp.concatenate([G_c, slack_col], axis=2)
    x0 = jnp.concatenate([u, jnp.zeros((b, 1), dtype)], axis=1)
    sol = qp.solve_qp_batched(P_qp, q_qp, G, rhs, lb, ub,
                              max_iter=kw["qp_max_iter"], tol=kw["qp_tol"],
                              x0=x0, fixed_iters=kw["qp_fixed_iters"],
                              p_blocks=2.0 * problem.phi0)
    ok = jnp.all(jnp.isfinite(sol.x), axis=1)
    u_new = jnp.where(ok[:, None], sol.x[:, :n], u)
    ev = jax.vmap(lambda s, uu: con.evaluate(
        s, uu, kw["constraint_tolerance"], kw["compat_q5"]))(sys_, u_new)
    obj_new = jax.vmap(con.objective)(
        problem.phi0, problem.psi0, problem.gamma0, u_new)
    merit_prev = obj + kw["slack_weight"] * viol
    merit_new = obj_new + kw["slack_weight"] * ev.max_violation
    delta = merit_prev - merit_new
    thresh = kw["delta_tol"] + kw["delta_tol_rel"] * jnp.abs(merit_new)
    small_delta = (jnp.abs(delta) < thresh) | ~ok
    small_step = jnp.max(jnp.abs(u_new - u), axis=1) < kw["u_step_tol"]
    small_delta = small_delta | small_step
    improved = (best_merit - merit_new) >= thresh
    stall_n = jnp.where(improved, 0, stall + 1)
    small_delta = small_delta | (stall_n >= kw["merit_patience"])
    best_merit_n = jnp.minimum(best_merit, merit_new)
    sel = active
    selc = sel[:, None]
    stop = small_delta & (ev.max_violation <= kw["constraint_tolerance"])
    return (jnp.where(selc, u_new, u),
            jnp.where(sel, obj_new, obj),
            jnp.where(sel, ev.max_violation, viol),
            jnp.where(sel, ev.feasible, feasible),
            jnp.where(sel, stop, done),
            it + sel,
            qp_iters + jnp.where(sel, sol.iters, 0),
            qp_fails + jnp.where(sel & ~sol.converged, 1, 0),
            jnp.where(sel, best_merit_n, best_merit),
            jnp.where(sel, stall_n, stall),
            jnp.where(selc, sol.z, z))


def init_carry(u):
    ev0 = jax.vmap(lambda s, uu: con.evaluate(
        s, uu, kw["constraint_tolerance"], kw["compat_q5"]))(sys_, u)
    obj0 = jax.vmap(con.objective)(
        problem.phi0, problem.psi0, problem.gamma0, u)
    zero = jnp.zeros((b,), jnp.int32)
    return (u, obj0, ev0.max_violation, ev0.feasible,
            jnp.zeros((b,), bool), zero, zero, zero,
            obj0 + kw["slack_weight"] * ev0.max_violation, zero, z0)


def run_fori(iters_n):
    def f(u):
        c = init_carry(u)
        return jax.lax.fori_loop(0, iters_n, lambda i, c: body_core(c), c)
    return jax.jit(f)


def run_while(iters_n):
    def f(u):
        c = init_carry(u)

        def cond(c):
            return jnp.any((c[5] < iters_n) & (~c[4]))
        return jax.lax.while_loop(cond, body_core, c)
    return jax.jit(f)


for name, mk in (("fori", run_fori), ("while", run_while)):
    ta = timeit(mk(2), u0) - base
    tb = timeit(mk(4), u0) - base
    print(f"{name:6s}: 2/4 = {ta*1e3:.2f} / {tb*1e3:.2f} ms  "
          f"marginal {(tb-ta)/2*1e3:.2f} ms")

from scp_tpu.solvers import scp as scp_mod
for it in (2, 4):
    fn = jax.jit(lambda p, u, it=it: scp_mod.solve_scp_stacked(
        p, u, max_scp_iter=it, **kw))
    t = timeit(fn, problem, u0) - base
    print(f"real stacked {it}: {t*1e3:.2f} ms")

if "--hlo" in sys.argv:
    import collections
    import re

    def hist(compiled_text):
        h = collections.Counter()
        for line in compiled_text.splitlines():
            m = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = \S*\s*([a-z\-]+)\(",
                         line)
            if m:
                h[m.group(1)] += 1
        return h

    mine_txt = run_while(2).lower(u0).compile().as_text()
    real_txt = jax.jit(lambda p, u: scp_mod.solve_scp_stacked(
        p, u, max_scp_iter=2, **kw)).lower(problem, u0).compile().as_text()
    hm, hr = hist(mine_txt), hist(real_txt)
    for k in sorted(set(hm) | set(hr)):
        if hm.get(k, 0) != hr.get(k, 0):
            print(f"{k:24s} mine={hm.get(k,0):5d} real={hr.get(k,0):5d}")
    open("/tmp/mine.hlo", "w").write(mine_txt)
    open("/tmp/real.hlo", "w").write(real_txt)
