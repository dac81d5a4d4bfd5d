"""Pin down the SCP-loop body cost on the TPU.

Findings (2026-08-18, B=1024, n_veh=4, hp=20, qp_fixed_iters=9):
  - solve_scp_stacked marginal cost:       10.2 ms / SCP iteration
  - identical body as one standalone jit:   6.9 ms
  - body in while/fori/scan, carry=u only:  6.2-7.5 ms
  => the loop construct is innocent; the gap is in the carry extras
     (z dual carry, sol.converged certificates, merit bookkeeping) —
     run with --bisect to measure each.

Timing through the axon tunnel: force a scalar readback per measurement and
subtract the readback baseline (jax.block_until_ready does not synchronize
through the tunnel).
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

# --- the QP pieces exactly as solve_scp_stacked assembles them ---
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


def body_once(u, z, with_eval=True, use_z=True):
    G_c, rhs = jax.vmap(con.linearize)(sys_, u)
    G = jnp.concatenate([G_c, slack_col], axis=2)
    x0 = jnp.concatenate([u, jnp.zeros((b, 1), dtype)], axis=1)
    sol = qp.solve_qp_batched(P_qp, q_qp, G, rhs, lb, ub,
                              max_iter=kw["qp_max_iter"], tol=kw["qp_tol"],
                              x0=x0, fixed_iters=kw["qp_fixed_iters"],
                              p_blocks=2.0 * problem.phi0)
    ok = jnp.all(jnp.isfinite(sol.x), axis=1)
    u_new = jnp.where(ok[:, None], sol.x[:, :n], u)
    outs = [u_new, sol.converged]
    if with_eval:
        ev = jax.vmap(lambda s, uu: con.evaluate(
            s, uu, kw["constraint_tolerance"], kw["compat_q5"]))(sys_, u_new)
        obj = jax.vmap(con.objective)(
            problem.phi0, problem.psi0, problem.gamma0, u_new)
        outs += [ev.max_violation, obj]
    else:
        outs += [None, None]
    if use_z:
        outs.append(sol.z)
    return tuple(outs)


def main_overview():
    def t_stacked(iters_n):
        fn = jax.jit(lambda p, u: scp.solve_scp_stacked(
            p, u, max_scp_iter=iters_n, **kw))
        return timeit(fn, problem, u0) - base

    t2, t4, t8 = t_stacked(2), t_stacked(4), t_stacked(8)
    print(f"stacked 2/4/8: {t2*1e3:.2f} / {t4*1e3:.2f} / {t8*1e3:.2f} ms  "
          f"marginal {(t8-t4)/4*1e3:.2f} ms")
    t_body = timeit(jax.jit(lambda u, z: body_once(u, z)), u0, z0) - base
    print(f"standalone body: {t_body*1e3:.2f} ms")


def main_bisect():
    print("-- in-loop extras bisection (fori, marginal of 4 vs 2 iters) --")

    def mk_fori(extras, iters_n):
        use_z = "z" in extras
        with_eval = "merit" in extras

        def bd(i, c):
            u, z, stats = c
            u_new, conv, viol, obj, *zrest = body_once(
                u, z, with_eval=with_eval, use_z=use_z)
            z_new = zrest[0] if use_z else z
            new_stats = stats
            if "conv" in extras:
                new_stats = new_stats + jnp.where(conv, 0, 1)
            if "merit" in extras:
                merit = obj + 1e5 * viol
                new_stats = new_stats + (merit < 123.0)
            return (u_new, z_new, new_stats)

        def f(u, z):
            stats = jnp.zeros((b,), jnp.int32)
            return jax.lax.fori_loop(0, iters_n, bd, (u, z, stats))
        return jax.jit(f)

    for extras in ((), ("z",), ("conv",), ("merit",),
                   ("z", "conv", "merit")):
        ta = timeit(mk_fori(extras, 2), u0, z0) - base
        tb = timeit(mk_fori(extras, 4), u0, z0) - base
        print(f"extras={','.join(extras) or 'none':14s}: 2/4 = "
              f"{ta*1e3:.2f} / {tb*1e3:.2f} ms  "
              f"marginal {(tb-ta)/2*1e3:.2f} ms")


if __name__ == "__main__":
    if "--bisect" in sys.argv:
        main_bisect()
    else:
        main_overview()
