"""Marginal cost of solve_qp_batched's setup vs its fused iterations.

Chained solves (output perturbs the next input so nothing hoists), k vs
k+delta chained calls differenced, at production shapes: B=1024, mg=120,
n=81, block-diagonal P, schur slack.
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

from scp_tpu.solvers import qp

B, mg, nv = 1024, 120, 80
n = nv + 1
f32 = jnp.float32
key = jax.random.PRNGKey(0)
ks_ = jax.random.split(key, 6)

nb, d = 2, 40
blocks = jax.random.normal(ks_[0], (B, nb, d, d), f32) * 0.1
pb = jnp.einsum("bnij,bnkj->bnik", blocks, blocks) \
    + 3.0 * jnp.eye(d, dtype=f32)
P = jnp.zeros((B, n, n), f32)
P = P.at[:, :d, :d].set(pb[:, 0]).at[:, d:2 * d, d:2 * d].set(pb[:, 1])
q = jnp.concatenate([jax.random.normal(ks_[1], (B, nv), f32),
                     jnp.full((B, 1), 1e5, f32)], axis=1)
G = jnp.concatenate([jax.random.normal(ks_[2], (B, mg, nv), f32) * 0.3,
                     jnp.full((B, mg, 1), -1.0, f32)], axis=2)
h = 1.0 + jax.random.uniform(ks_[3], (B, mg), f32)
lb = jnp.concatenate([jnp.full((B, nv), -2.0, f32),
                      jnp.zeros((B, 1), f32)], axis=1)
ub = jnp.concatenate([jnp.full((B, nv), 2.0, f32),
                      jnp.full((B, 1), 1e8, f32)], axis=1)


def make_chain(k, iters):
    def solve_once(qq):
        sol = qp.solve_qp_batched(P, qq, G, h, lb, ub, tol=1e-6,
                                  fixed_iters=iters, p_blocks=pb,
                                  slack_schur=True, certificate=False)
        return qq + 1e-12 * sol.x

    def run(qq):
        return jax.lax.fori_loop(0, k, lambda _, v: solve_once(v), qq)
    return jax.jit(run)


def marginal(k1, k2, iters, reps=3):
    f1, f2 = make_chain(k1, iters), make_chain(k2, iters)
    o1, o2 = f1(q), f2(q)
    float(o1.sum()), float(o2.sum())
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(6):
            o1 = f1(q)
        float(o1.sum())
        t1 = time.time()
        for _ in range(6):
            o2 = f2(q)
        float(o2.sum())
        t2 = time.time()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (6 * (k2 - k1)))
    return best


s1 = marginal(4, 10, 1)
s7 = marginal(4, 10, 7)
per_it = (s7 - s1) / 6
print(f"solve fixed=1:   {s1*1e3:7.3f} ms")
print(f"solve fixed=7:   {s7*1e3:7.3f} ms")
print(f"  per-iteration: {per_it*1e3:7.3f} ms")
print(f"  setup+finish:  {(s1-per_it)*1e3:7.3f} ms")
