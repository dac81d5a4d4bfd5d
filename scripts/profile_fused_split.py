"""Trustworthy marginal costs of one fused-IPM iteration's pieces.

Chained fori_loop measurements (like the production solver), comparing
programs with k vs k+delta repetitions of each piece so dispatch overhead
and readback cancel exactly:
  - full production iteration (K form + transpose + kernel)
  - kernel only (K fixed, state feeds back)
  - XLA glue only (scale+dot+transpose, w feeds back through a cheap map)
Production shapes: B=1024, mg=120, n=81, Schur ks=80, block-diag P.
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

from scp_tpu.ops import pallas_linalg as pll

B, mg, n = 1024, 120, 81
nu = n - 1
n_pad = pll.pad_dim(n)
mg_pad = 128
m_true = mg + 2 * n
f32 = jnp.float32
key = jax.random.PRNGKey(0)
ks_ = jax.random.split(key, 8)

G_c = jax.random.normal(ks_[0], (B, mg, n), f32) * 0.1
G_k = G_c[:, :, :nu]
G_lane = pll.to_lane3(G_c)
# block-diagonal P: 2 blocks of hu=40 controls (d=40) as production
nb, d = 2, 40
blocks = jax.random.normal(ks_[1], (B, nb, d, d), f32) * 0.1
pb = jnp.einsum("bnij,bnkj->bnik", blocks, blocks) \
    + 3.0 * jnp.eye(d, dtype=f32)
pb_lane = jnp.transpose(pb, (1, 2, 3, 0))                  # (nb, d, d, B)
pdiag = jnp.ones((n_pad, B), f32)
q_lane = jnp.zeros((n_pad, B), f32)

mrow = jnp.arange(mg_pad)[:, None] < mg
nrow = jnp.arange(n_pad)[:, None] < n
xl = jnp.zeros((n_pad, B), f32)
sg = jnp.where(mrow, 1.0 + jax.random.uniform(ks_[2], (mg_pad, B)), 1.0)
su = jnp.where(nrow, 1.0 + jax.random.uniform(ks_[3], (n_pad, B)), 1.0)
sl = jnp.where(nrow, 1.0 + jax.random.uniform(ks_[4], (n_pad, B)), 1.0)
zg = jnp.where(mrow, 1.0 / sg, 0.0)
zu = jnp.where(nrow, 1.0 / su, 0.0)
zl = jnp.where(nrow, 1.0 / sl, 0.0)
rpg = jnp.zeros((mg_pad, B), f32)
rpu = jnp.zeros((n_pad, B), f32)
rpl = jnp.zeros((n_pad, B), f32)
scal = jnp.zeros((8, B), f32).at[0].set(jnp.finfo(f32).max)
state0 = (xl, sg, su, sl, zg, zu, zl, rpg, rpu, rpl, scal)

t2 = lambda a: jnp.transpose(a, (1, 0))  # noqa: E731
HIGH = jax.lax.Precision.HIGH


def form_k(zg, sg):
    wg_c = t2(zg[:mg] / sg[:mg])
    Kprod = jax.lax.dot_general(G_k, G_k * wg_c[:, :, None],
                                (((1,), (1,)), ((0,), (0,))), precision=HIGH)
    return jnp.transpose(Kprod, (2, 1, 0))                 # (nu, nu, B)


def full_iter(state):
    xl, sg, su, sl, zg, zu, zl, rpg, rpu, rpl, scal = state
    K_lane = form_k(zg, sg)
    return pll.ipm_iterate_lane(
        K_lane, G_lane, None, q_lane, pdiag,
        xl, sg, su, sl, zg, zu, zl, rpg, rpu, rpl, scal,
        mg=mg, n=n, m_true=m_true, tol=1e-6, pb=pb_lane, schur_slack=True)


K_fix = jax.jit(form_k)(zg, sg)


def kernel_iter(state):
    xl, sg, su, sl, zg, zu, zl, rpg, rpu, rpl, scal = state
    return pll.ipm_iterate_lane(
        K_fix, G_lane, None, q_lane, pdiag,
        xl, sg, su, sl, zg, zu, zl, rpg, rpu, rpl, scal,
        mg=mg, n=n, m_true=m_true, tol=1e-6, pb=pb_lane, schur_slack=True)


def glue_iter(carry):
    zg, sg = carry
    K_lane = form_k(zg, sg)
    # cheap feedback so the dot can't be hoisted: fold K into w
    f = jnp.sum(K_lane, axis=(0, 1)) * 1e-9                # (B,)
    return zg + f[None, :] * 1e-9, sg


def form_k_sym(zg, sg):
    # Kprod is symmetric, so (1, 2, 0) is an equally valid kernel layout
    wg_c = t2(zg[:mg] / sg[:mg])
    Kprod = jax.lax.dot_general(G_k, G_k * wg_c[:, :, None],
                                (((1,), (1,)), ((0,), (0,))), precision=HIGH)
    return jnp.transpose(Kprod, (1, 2, 0))


def glue_iter_sym(carry):
    zg, sg = carry
    K_lane = form_k_sym(zg, sg)
    f = jnp.sum(K_lane, axis=(0, 1)) * 1e-9
    return zg + f[None, :] * 1e-9, sg


def chained(step_fn, init, k):
    def run(init):
        return jax.lax.fori_loop(0, k, lambda _, s: step_fn(s), init)
    return jax.jit(run)


def time_marginal(step_fn, init, k1=10, k2=30, reps=3):
    f1, f2 = chained(step_fn, init, k1), chained(step_fn, init, k2)
    o1, o2 = f1(init), f2(init)
    float(jax.tree_util.tree_leaves(o1)[0].sum())
    float(jax.tree_util.tree_leaves(o2)[0].sum())
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(10):
            o1 = f1(init)
        float(jax.tree_util.tree_leaves(o1)[0].sum())
        t1 = time.time()
        for _ in range(10):
            o2 = f2(init)
        float(jax.tree_util.tree_leaves(o2)[0].sum())
        t_2 = time.time()
        best = min(best, ((t_2 - t1) - (t1 - t0)) / (10 * (k2 - k1)))
    return best


def kernel_iter_cor(ncor):
    def f(state):
        xl, sg, su, sl, zg, zu, zl, rpg, rpu, rpl, scal = state
        return pll.ipm_iterate_lane(
            K_fix, G_lane, None, q_lane, pdiag,
            xl, sg, su, sl, zg, zu, zl, rpg, rpu, rpl, scal,
            mg=mg, n=n, m_true=m_true, tol=1e-6, pb=pb_lane,
            schur_slack=True, n_cor=ncor)
    return f


# --- pair-structured iteration: slabs + in-kernel K formation ---
n_veh, hp_p, hu_p = 4, 20, 20
import numpy as np                                          # noqa: E402
_iu, _ju = np.triu_indices(n_veh, k=1)
PAIRS = tuple(zip(_iu.tolist(), _ju.tolist()))
G_STRUCT = (PAIRS, (), hp_p, hu_p)
hu8 = 24


def _slab(parts):
    s = jnp.transpose(jnp.stack(parts), (0, 2, 3, 1))
    return jnp.pad(s, ((0, 0), (0, 0), (0, hu8 - hu_p), (0, 0)))


gi_sl = _slab([G_c[:, p * hp_p:(p + 1) * hp_p, i * hu_p:(i + 1) * hu_p]
               for p, (i, j) in enumerate(PAIRS)])
gj_sl = _slab([G_c[:, p * hp_p:(p + 1) * hp_p, j * hu_p:(j + 1) * hu_p]
               for p, (i, j) in enumerate(PAIRS)])
gsl_sl = jnp.zeros((mg_pad, B), f32).at[:mg].set(
    jnp.transpose(G_c[:, :, nu], (1, 0)))
# per-vehicle P blocks (structured mode requires pb_dims == (V, hu))
blocks4 = jax.random.normal(ks_[5], (B, n_veh, hu_p, hu_p), f32) * 0.1
pb4 = jnp.einsum("bnij,bnkj->bnik", blocks4, blocks4) \
    + 3.0 * jnp.eye(hu_p, dtype=f32)
pb4_lane = jnp.transpose(pb4, (1, 2, 3, 0))                 # (V, hu, hu, B)


def struct_iter(state):
    xl, sg, su, sl, zg, zu, zl, rpg, rpu, rpl, scal = state
    return pll.ipm_iterate_lane_struct(
        gi_sl, gj_sl, None, gsl_sl, pb4_lane, q_lane, pdiag,
        xl, sg, su, sl, zg, zu, zl, rpg, rpu, rpl, scal,
        g_struct=G_STRUCT, mg=mg, n=n, m_true=m_true, tol=1e-6)


print(f"full iteration:   {time_marginal(full_iter, state0)*1e3:7.3f} ms")
print(f"kernel only:      {time_marginal(kernel_iter, state0)*1e3:7.3f} ms")
print(f"glue only:        {time_marginal(glue_iter, (zg, sg))*1e3:7.3f} ms")
print(f"struct iteration: {time_marginal(struct_iter, state0)*1e3:7.3f} ms")
