"""Split one fused-IPM iteration (B=1024, n=81, mg=120) into the XLA side
(K formation matmul + lane transpose + px matvec) and the Pallas kernel."""
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_default_matmul_precision", "highest")

from scp_tpu.ops import pallas_linalg as pll

B, mg, n = 1024, 120, 81
n_pad = pll.pad_dim(n)
mg_pad = 128
m_true = mg + 2 * n
key = jax.random.PRNGKey(0)
f32 = jnp.float32

ks = jax.random.split(key, 10)
G_c = jax.random.normal(ks[0], (B, mg, n), f32) * 0.1
G_c_pad = jnp.pad(G_c, ((0, 0), (0, 0), (0, n_pad - n)))
G_lane = pll.to_lane3(G_c)
A = jax.random.normal(ks[1], (B, n, n), f32) * 0.1
P_s = jnp.einsum("bij,bkj->bik", A, A) + 10.0 * jnp.eye(n, dtype=f32)
P_pad = jnp.pad(P_s, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
diag_pad = jnp.arange(n, n_pad)
P_pad = P_pad.at[:, diag_pad, diag_pad].set(1.0)
P_lane = pll.to_lane3(P_s)
pdiag = jnp.ones((n_pad, B), f32).at[:n].set(
    jnp.transpose(jnp.diagonal(P_s, axis1=1, axis2=2), (1, 0)))

mrow = jnp.arange(mg_pad)[:, None] < mg
nrow = jnp.arange(n_pad)[:, None] < n
xl = jnp.zeros((n_pad, B), f32)
sg = jnp.where(mrow, 1.0 + jax.random.uniform(ks[2], (mg_pad, B)), 1.0)
su = jnp.where(nrow, 1.0 + jax.random.uniform(ks[3], (n_pad, B)), 1.0)
sl = jnp.where(nrow, 1.0 + jax.random.uniform(ks[4], (n_pad, B)), 1.0)
zg = jnp.where(mrow, 1.0 / sg, 0.0)
zu = jnp.where(nrow, 1.0 / su, 0.0)
zl = jnp.where(nrow, 1.0 / sl, 0.0)
rpg = jnp.zeros((mg_pad, B), f32)
rpu = jnp.zeros((n_pad, B), f32)
rpl = jnp.zeros((n_pad, B), f32)
scal = jnp.zeros((8, B), f32).at[0].set(jnp.finfo(f32).max)
q_lane = jnp.zeros((n_pad, B), f32)

t2 = lambda a: jnp.transpose(a, (1, 0))  # noqa: E731


def form_k(zg, sg, xl):
    wg_c = t2(zg[:mg] / sg[:mg])
    K = P_pad + jnp.matmul(
        jnp.swapaxes(G_c_pad, 1, 2) * wg_c[:, None, :],
        G_c_pad, precision=jax.lax.Precision.HIGH)
    K_lane = jnp.transpose(K, (2, 1, 0))
    px = pll.gmv_lane(P_lane, xl)
    return K_lane, px


form_j = jax.jit(form_k)
K_lane, px = form_j(zg, sg, xl)

kern_j = jax.jit(lambda K_lane, px: pll.ipm_iterate_lane(
    K_lane, G_lane, px, q_lane, pdiag,
    xl, sg, su, sl, zg, zu, zl, rpg, rpu, rpl, scal,
    mg=mg, n=n, m_true=m_true, tol=1e-6))
def _full(zg, sg, xl):
    K_lane, px = form_k(zg, sg, xl)
    return K_lane, px


full_j = jax.jit(lambda zg, sg, xl: pll.ipm_iterate_lane(
    form_k(zg, sg, xl)[0], G_lane, form_k(zg, sg, xl)[1], q_lane, pdiag,
    xl, sg, su, sl, zg, zu, zl, rpg, rpu, rpl, scal,
    mg=mg, n=n, m_true=m_true, tol=1e-6))

# pieces of form_k
matmul_j = jax.jit(lambda zg, sg: P_pad + jnp.matmul(
    jnp.swapaxes(G_c_pad, 1, 2) * t2(zg[:mg] / sg[:mg])[:, None, :],
    G_c_pad, precision=jax.lax.Precision.HIGH))
K_b = matmul_j(zg, sg)
transpose_j = jax.jit(lambda K: jnp.transpose(K, (2, 1, 0)))
px_j = jax.jit(lambda xl: pll.gmv_lane(P_lane, xl))

# factor-only and solve-only kernels for comparison
chol_j = jax.jit(pll.cholesky_lane)
Kspd = jnp.matmul(jnp.swapaxes(K_b, 1, 2), K_b,
                  precision=jax.lax.Precision.HIGH) / 100.0 \
    + 10.0 * jnp.eye(n_pad, dtype=f32)
Lt = chol_j(Kspd)
solve_j = jax.jit(pll.cho_solve_lane)


def timeit(fn, *args, iters=100):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.time() - t0 - 0.029) / iters


print(f"n_pad={n_pad} mg_pad={mg_pad}")
print(f"full iter (form+kernel): {timeit(full_j, zg, sg, xl)*1e3:7.3f} ms")
print(f"  form_k (matmul+T+px):  {timeit(form_j, zg, sg, xl)*1e3:7.3f} ms")
print(f"    matmul only:         {timeit(matmul_j, zg, sg)*1e3:7.3f} ms")
print(f"    transpose only:      {timeit(transpose_j, K_b)*1e3:7.3f} ms")
print(f"    px only:             {timeit(px_j, xl)*1e3:7.3f} ms")
print(f"  kernel only:           {timeit(kern_j, K_lane, px)*1e3:7.3f} ms")
print(f"  factor-only kernel:    {timeit(chol_j, Kspd)*1e3:7.3f} ms")
print(f"  solve-only kernel:     {timeit(solve_j, Lt, px)*1e3:7.3f} ms")
