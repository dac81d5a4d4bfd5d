"""Break one SCP iteration (B=1024) into linearize / QP / evaluate, and the
QP into K-formation vs fused-kernel time."""
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
from scp_tpu.ops import constraints as con
from scp_tpu.solvers import qp

BATCH, N_VEH, HP = 1024, 4, 20

cfg, data = batch_lib.make_batch(
    "circle", BATCH, key=jax.random.PRNGKey(42), dtype=jnp.float32,
    n_veh=N_VEH)
cfg = cfg.replace(hp=HP, hu=HP, delta_tol_rel=1e-4, u_step_tol=1e-5,
                  merit_patience=2, qp_tol=1e-6, qp_fixed_iters=9)
carry = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)
pre = jax.jit(lambda d, c: jax.vmap(
    lambda di, ci: engine.controller_pre(cfg, di, ci))(d, c))
problem, aux = pre(data, carry)
sys_ = problem.sys
u = carry.u_warm
b, v, hp, _, hu = sys_.b3.shape
n = v * hu
dtype = u.dtype

# assemble the QP pieces exactly as solve_scp_stacked does
P_qp = jnp.zeros((b, n + 1, n + 1), dtype)
for i in range(v):
    P_qp = P_qp.at[:, i * hu:(i + 1) * hu, i * hu:(i + 1) * hu].set(
        2.0 * problem.phi0[:, i])
q_qp = jnp.concatenate([problem.psi0.reshape(b, n),
                        jnp.full((b, 1), cfg.slack_weight, dtype)], axis=1)
lb = jnp.concatenate([jnp.full((b, n), -cfg.u_lim, dtype),
                      jnp.zeros((b, 1), dtype)], axis=1)
ub = jnp.concatenate([jnp.full((b, n), cfg.u_lim, dtype),
                      jnp.full((b, 1), cfg.slack_ub, dtype)], axis=1)
n_con = sys_.dsafe2_pair.shape[1] * hp + v * sys_.obst_pos.shape[1] * hp
slack_col = jnp.full((b, n_con, 1), -1.0, dtype)


def lin(u):
    G_c, rhs = jax.vmap(con.linearize)(sys_, u)
    return jnp.concatenate([G_c, slack_col], axis=2), rhs


lin_j = jax.jit(lin)
G, rhs = lin_j(u)
x0 = jnp.concatenate([u, jnp.zeros((b, 1), dtype)], axis=1)

solve_j = jax.jit(lambda G, rhs, x0: qp.solve_qp_batched(
    P_qp, q_qp, G, rhs, lb, ub, max_iter=cfg.qp_max_iter, tol=cfg.qp_tol,
    x0=x0, fixed_iters=9))
solve1_j = jax.jit(lambda G, rhs, x0: qp.solve_qp_batched(
    P_qp, q_qp, G, rhs, lb, ub, max_iter=cfg.qp_max_iter, tol=cfg.qp_tol,
    x0=x0, fixed_iters=1))
solve0_j = jax.jit(lambda G, rhs, x0: qp.solve_qp_batched(
    P_qp, q_qp, G, rhs, lb, ub, max_iter=cfg.qp_max_iter, tol=cfg.qp_tol,
    x0=x0, fixed_iters=0))

ev_j = jax.jit(lambda u: jax.vmap(
    lambda s, ui: con.evaluate(s, ui, cfg.constraint_tolerance, True)
)(sys_, u))
obj_j = jax.jit(jax.vmap(con.objective, in_axes=(0, 0, 0, 0)))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.time() - t0 - 0.029) / iters


t_lin = timeit(lin_j, u)
t_qp9 = timeit(solve_j, G, rhs, x0)
t_qp1 = timeit(solve1_j, G, rhs, x0)
t_qp0 = timeit(solve0_j, G, rhs, x0)
t_ev = timeit(ev_j, u)
t_obj = timeit(obj_j, problem.phi0, problem.psi0, problem.gamma0, u)

print(f"shapes: G {G.shape}, n={n + 1}, mg={n_con}")
print(f"linearize:        {t_lin*1e3:7.2f} ms")
print(f"qp fixed=9:       {t_qp9*1e3:7.2f} ms")
print(f"qp fixed=1:       {t_qp1*1e3:7.2f} ms")
print(f"qp fixed=0 (setup+cert): {t_qp0*1e3:7.2f} ms")
print(f"  per-IPM-iter:   {(t_qp9 - t_qp1) / 8 * 1e3:7.2f} ms")
print(f"evaluate:         {t_ev*1e3:7.2f} ms")
print(f"objective:        {t_obj*1e3:7.2f} ms")
print(f"sum (lin+qp9+ev+obj): {(t_lin + t_qp9 + t_ev + t_obj)*1e3:7.2f} ms")
