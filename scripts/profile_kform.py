"""Microbenchmark: structured in-kernel K formation vs XLA dot + transpose.

The per-IPM-iteration KKT product ``K = G^T W G`` currently runs as a
batch-major MXU dot plus a (B, n, n) -> (n, n, B) layout transpose
(BENCHMARKS.md "Known headroom": the largest non-kernel cost). But the SCP
constraint rows are PAIR-SPARSE: row (p, k) touches only the two hu-wide
vehicle blocks of pair p (ops/constraints.py::linearize), so the dense
m*n^2 contraction does ~4x the necessary MACs and pays ~160 MB/iteration of
HBM traffic for operands/results the fused kernel could keep in VMEM.

This measures a standalone Pallas kernel that forms K directly in kernel
lane layout from per-pair row slabs (P, hp, hu8, TB) via VPU outer-product
accumulation — zero HBM round-trip for K, no transpose — against the
production dot+transpose glue, with the chained-marginal methodology of
profile_fused_split.py.
"""
import os
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_default_matmul_precision", "highest")

B, n_veh, hp, hu = 1024, 4, 20, 20
n = n_veh * hu + 1
nu = n - 1
mg = (n_veh * (n_veh - 1) // 2) * hp
TB = 128
SUB = 8
hu8 = ((hu + SUB - 1) // SUB) * SUB
mg_pad = ((mg + 31) // 32) * 32
import numpy as np
iu, ju = np.triu_indices(n_veh, k=1)
PAIRS = list(zip(iu.tolist(), ju.tolist()))
P = len(PAIRS)

f32 = jnp.float32
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
G_c = jax.random.normal(k1, (B, mg, n), f32) * 0.1
G_k = G_c[:, :, :nu]
w0 = jax.random.uniform(k2, (mg_pad, B), f32) + 0.5

HIGH = jax.lax.Precision.HIGH


def form_k_glue(w):
    wg_c = jnp.transpose(w[:mg], (1, 0))
    Kprod = jax.lax.dot_general(G_k, G_k * wg_c[:, :, None],
                                (((1,), (1,)), ((0,), (0,))), precision=HIGH)
    return jnp.transpose(Kprod, (2, 1, 0))                 # (nu, nu, B)


# --- structured kernel ---
# slabs: gpi/gpj (P, hp, hu8, TB) with gpi[p, k, c, b] = G_b[p*hp+k, i_p*hu+c]
def make_slabs(G_c):
    gi = jnp.stack([
        G_c[:, p * hp:(p + 1) * hp, i * hu:(i + 1) * hu]
        for p, (i, j) in enumerate(PAIRS)])                # (P, B, hp, hu)
    gj = jnp.stack([
        G_c[:, p * hp:(p + 1) * hp, j * hu:(j + 1) * hu]
        for p, (i, j) in enumerate(PAIRS)])
    gi = jnp.pad(jnp.transpose(gi, (0, 2, 3, 1)),
                 ((0, 0), (0, 0), (0, hu8 - hu), (0, 0)))  # (P, hp, hu8, B)
    gj = jnp.pad(jnp.transpose(gj, (0, 2, 3, 1)),
                 ((0, 0), (0, 0), (0, hu8 - hu), (0, 0)))
    return gi, gj


def kform_kernel(gi_ref, gj_ref, w_ref, out_ref, diag_ref):
    # zero the diagonal-block accumulators
    diag_ref[...] = jnp.zeros_like(diag_ref)
    for p, (i, j) in enumerate(PAIRS):
        wp = w_ref[pl.ds(p * hp, hp), :]                   # (hp, TB)
        gi = gi_ref[p]                                     # (hp, hu8, TB)
        gj = gj_ref[p]
        wgi = gi * wp[:, None, :]
        wgj = gj * wp[:, None, :]

        def outer_sum(a, b):
            acc = a[0][:, None, :] * b[0][None, :, :]
            for k in range(1, hp):
                acc = acc + a[k][:, None, :] * b[k][None, :, :]
            return acc                                      # (hu8, hu8, TB)

        # lower-triangle off-diagonal block K[jblk, iblk] in kernel layout
        # out[c, r, b] = K_b[r, c]: major = col block (i), sublane = row (j)
        blk = outer_sum(wgi, gj)
        out_ref[pl.ds(i * hu, hu), pl.ds(j * hu, hu), :] = \
            blk[:hu, :hu, :]
        diag_ref[i] = diag_ref[i] + outer_sum(wgi, gi)
        diag_ref[j] = diag_ref[j] + outer_sum(wgj, gj)
    for v in range(n_veh):
        out_ref[pl.ds(v * hu, hu), pl.ds(v * hu, hu), :] = \
            diag_ref[v][:hu, :hu, :]
    # zero the untouched upper-triangle blocks is unnecessary: the factor
    # reads the lower triangle only. For the microbench leave them garbage.


def form_k_struct(gi, gj, w):
    return pl.pallas_call(
        kform_kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((P, hp, hu8, TB), lambda b: (0, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, hp, hu8, TB), lambda b: (0, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mg_pad, TB), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nu, nu, TB), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nu, nu, B), f32),
        scratch_shapes=[pltpu.VMEM((n_veh, hu8, hu8, TB), f32)],
    )(gi, gj, w)


GI, GJ = jax.jit(make_slabs)(G_c)


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


# feedback reads column 0 only (always-written lower triangle: the struct
# kernel leaves upper blocks as garbage, which must not poison the carry)
def glue_step(w):
    K = form_k_glue(w)
    f = jnp.sum(K[0], axis=0) * 1e-12                      # (B,)
    return w + f[None, :] * 1e-12


def struct_step(w):
    K = form_k_struct(GI, GJ, w)
    f = jnp.sum(K[0], axis=0) * 1e-12
    return w + f[None, :] * 1e-12


# correctness: lower triangle must match the glue product
Kg = jax.jit(form_k_glue)(w0)
Ks = jax.jit(lambda w: form_k_struct(GI, GJ, w))(w0)
tri = jnp.tril(jnp.ones((nu, nu), bool)).T  # kernel layout: [c, r] with r>=c
err = jnp.max(jnp.abs(jnp.where(tri[:, :, None], Ks - Kg, 0.0)))
rel = float(err) / float(jnp.max(jnp.abs(Kg)))
print(f"lower-triangle rel err: {rel:.2e}")

print(f"glue  (dot+transpose): {time_marginal(glue_step, w0)*1e3:7.3f} ms")
print(f"struct (pallas VPU):   {time_marginal(struct_step, w0)*1e3:7.3f} ms")
