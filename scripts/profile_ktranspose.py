"""K-formation variants at production shapes (B=1024, mg=120, ks=80).

The fused IPM path pays, per iteration, an XLA (B,ks,ks)->(ks,ks,B)
transpose measured ~0.24 ms (SOL ~0.065 ms) plus a dot measured ~0.67 ms
(SOL ~0.25 ms). Probes, each guarded so one failure doesn't kill the rest.

OUTCOME (bench A/B, same session): variant c (pre-transposed lhs, NT dot)
won the isolated probe (0.331 vs 0.383 ms) but regressed the full bench
32523 -> 31439 solves/s — the loop-invariant swapaxes copy of G_k costs
more HBM traffic per SCP iteration than the per-IPM-iteration dot saves.
The committed TN form stands. Pallas in-kernel transposes (e, f) were not
competitive either.
"""
import os
import time
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_default_matmul_precision", "highest")

B, mg, ks = 1024, 120, 80
TB = 128
f32 = jnp.float32
key = jax.random.PRNGKey(0)
ks_ = jax.random.split(key, 4)
G = jax.random.normal(ks_[0], (B, mg, ks), f32) * 0.1
GT = jax.jit(lambda g: jnp.swapaxes(g, 1, 2) + 0.0)(G)
w = jax.random.uniform(ks_[1], (B, mg), f32) + 0.5
HIGH = jax.lax.Precision.HIGH


def dot_only(G, w):
    return jax.lax.dot_general(G, G * w[:, :, None],
                               (((1,), (1,)), ((0,), (0,))), precision=HIGH)


def var_a(G, w):
    return jnp.transpose(dot_only(G, w), (2, 1, 0))


def var_b(G, w):
    return jnp.transpose(dot_only(G, w), (1, 2, 0))


def dot_nt(GT, G, w):
    return jax.lax.dot_general(GT, G * w[:, :, None],
                               (((2,), (1,)), ((0,), (0,))), precision=HIGH)


def var_c(GT, G, w):
    return jnp.transpose(dot_nt(GT, G, w), (2, 1, 0))


# --- in-kernel 3D transpose, lane-padded minor (B, ks, 128) ---
def _tr3_kernel(k_hbm, out_ref, kv_ref, sem):
    i = pl.program_id(0)
    pltpu.make_async_copy(k_hbm.at[pl.ds(i * TB, TB), :, :], kv_ref,
                          sem).wait()
    out_ref[...] = jnp.transpose(kv_ref[...], (2, 1, 0))[:ks]


def pallas_tr3(Kp):  # (B, ks, 128) -> (ks, ks, B)
    return pl.pallas_call(
        _tr3_kernel,
        grid=(B // TB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((ks, ks, TB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ks, ks, B), f32),
        scratch_shapes=[pltpu.VMEM((TB, ks, 128), f32),
                        pltpu.SemaphoreType.DMA(())],
    )(Kp)


def var_e(G, w):
    Gw = G * w[:, :, None]
    Gw = jnp.pad(Gw, ((0, 0), (0, 0), (0, 128 - ks)))
    Kp = jax.lax.dot_general(G, Gw, (((1,), (1,)), ((0,), (0,))),
                             precision=HIGH)          # (B, ks, 128)
    return pallas_tr3(Kp)


# --- in-kernel 2D flatten transpose: (B, ks*ks) -> (ks, ks, B) ---
def _tr2_kernel(k_ref, out_ref):
    out_ref[...] = jnp.transpose(k_ref[...], (1, 0)).reshape(ks, ks, TB)


def pallas_tr2(Kf):  # (B, ks*ks)
    return pl.pallas_call(
        _tr2_kernel,
        grid=(B // TB,),
        in_specs=[pl.BlockSpec((TB, ks * ks), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ks, ks, TB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ks, ks, B), f32),
    )(Kf)


def var_f(G, w):
    K = dot_only(G, w).reshape(B, ks * ks)
    return pallas_tr2(K)


def dot_nt2(GT, w):
    # G stored transposed (B, ks, mg): minor dim 120/128 lanes, scale
    # broadcasts w across sublanes, contraction on the minor axis of both.
    Gw = GT * w[:, None, :]
    return jax.lax.dot_general(GT, Gw, (((2,), (2,)), ((0,), (0,))),
                               precision=HIGH)


def var_g(GT, w):
    return jnp.transpose(dot_nt2(GT, w), (2, 1, 0))


def scale_nt(GT, w):
    return GT * w[:, None, :]


def timeit(fn, *args, iters=300, reps=3):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].sum())
        best = min(best, time.time() - t0 - 0.029)
    return best / iters


Ka = jax.jit(var_a)(G, w)
scale_j = jax.jit(lambda G, w: G * w[:, :, None])

probes = [
    ("scale only", scale_j, (G, w)),
    ("dot only (TN)", jax.jit(dot_only), (G, w)),
    ("dot only (NT, preT lhs)", jax.jit(dot_nt), (GT, G, w)),
    ("a) dotTN + xlaT(2,1,0)", jax.jit(var_a), (G, w)),
    ("b) dotTN + xlaT(1,2,0)", jax.jit(var_b), (G, w)),
    ("c) dotNT + xlaT(2,1,0)", jax.jit(var_c), (GT, G, w)),
    ("e) dot pad128 + pallas 3dT", jax.jit(var_e), (G, w)),
    ("f) dot + reshape + pallas 2dT", jax.jit(var_f), (G, w)),
    ("scale only (NT layout)", jax.jit(scale_nt), (GT, w)),
    ("dot only (NT2, minor contract)", jax.jit(dot_nt2), (GT, w)),
    ("g) dotNT2 + xlaT(2,1,0)", jax.jit(var_g), (GT, w)),
]
for name, fn, args in probes:
    try:
        out = fn(*args)
        if out.shape == Ka.shape:
            ok = "match" if jnp.allclose(out, Ka, atol=1e-5) else "MISMATCH"
        else:
            ok = "-"
        print(f"{name:32s} {timeit(fn, *args)*1e3:7.3f} ms   [{ok}]")
    except Exception as e:
        print(f"{name:32s} FAILED: {str(e).splitlines()[0][:90]}")
