"""Pallas TPU kernels for the banded (Riccati) KKT sweep.

The pure-JAX Riccati recursion (ops/riccati.py) is a ``lax.scan`` of tiny
batched einsums — measured 86 ms/SCP-iteration at (hp=64, B=256) on a v5e,
i.e. AT the dense fallback's cost: ~hp sequential stages times ~15 small
fused regions each never fills the machine. These kernels run the whole
sweep per 128-instance lane tile inside ONE launch, with the stage loop as
an in-kernel ``fori_loop`` over VMEM-resident stage data:

* ``riccati_factor_lane`` — the backward factorization sweep: per stage,
  the position-block cost-to-go update, the V x V input-Hessian Cholesky
  (statically unrolled on lane scalars), and the feedback gains;
* ``riccati_solve_lane`` — backward linear sweep + forward rollout for one
  RHS against the stored stage factors.

Layout: batch on the 128-lane axis (batched-small-LA layout, as
pallas_linalg). The cost-to-go ``P`` lives in a (W, W, TB) scratch with
W = V*NX, addressed BY SYMMETRY (``pt_ref[r]`` is row r == column r), so
every contraction is a natural major-dim read. The per-vehicle block
structure of A and B is exploited statically: A arrives as (V, NX, NX)
blocks and the dense W-sweeps contract only the 6 in-block terms.

Per-vehicle input dimension is NU = 1 (the steering-rate reference,
reference Model.py:36-38) — the V x V input Hessian is the whole
``Hu + B^T P B``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scp_tpu.config import NX
from scp_tpu.ops.pallas_linalg import TB, _pad_to

# Tests flip this to run in interpret mode on CPU.
INTERPRET = False


def _chol_scalar(hm, v):
    """Unrolled V x V Cholesky on lane-scalar (TB,) entries."""
    L = [[None] * v for _ in range(v)]
    for j in range(v):
        s = hm[j][j]
        for p in range(j):
            s = s - L[j][p] * L[j][p]
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, v):
            s2 = hm[i][j]
            for p in range(j):
                s2 = s2 - L[i][p] * L[j][p]
            L[i][j] = s2 * inv_d
    return L


def _chol_solve_rows(L, rhs, v):
    """Solve (L L^T) x = rhs for per-vehicle rows ``rhs[v]`` of any vector
    shape (entries are (..., TB) values; L entries are (TB,) scalars)."""
    def mul(c, x):
        return c[None, :] * x if x.ndim == 2 else c * x

    y = [None] * v
    for i in range(v):
        s = rhs[i]
        for p in range(i):
            s = s - mul(L[i][p], y[p])
        y[i] = mul(1.0 / L[i][i], s)
    x = [None] * v
    for i in reversed(range(v)):
        s = y[i]
        for p in range(i + 1, v):
            s = s - mul(L[p][i], x[p])
        x[i] = mul(1.0 / L[i][i], s)
    return x


def _make_factor_kernel(v: int, k_st: int):
    W = v * NX
    w2 = 2 * v
    v8 = _pad_to(v, 8)

    def kernel(hy_ref, hu_ref, a_ref, b_ref,
               f_ref, lh_ref, kg_ref, pt_ref):
        zero_w = jnp.zeros((W, TB), jnp.float32)
        zero4 = jnp.zeros((NX - 2, TB), jnp.float32)
        b_vecs = [b_ref[i] for i in range(v)]          # (NX, TB)

        for c in range(W):
            pt_ref[c] = zero_w

        def stage(i, _):
            kk = k_st - 1 - i
            hy_k = hy_ref[kk]                          # (w2, w2, TB)
            # Ptilde = P + C^T Hy C: position column c = NX*i + a gets the
            # stage block's column, interleaved with zeros over the
            # non-position state entries.
            for iv in range(v):
                for a in range(2):
                    col = hy_k[2 * iv + a]             # (w2, TB)
                    addv = jnp.concatenate(
                        [jnp.concatenate([col[2 * j:2 * j + 2], zero4],
                                         axis=0) for j in range(v)],
                        axis=0)                        # (W, TB)
                    c = NX * iv + a
                    pt_ref[c] = pt_ref[c] + addv
            p_rows = [pt_ref[r] for r in range(W)]     # symmetric rows
            # T[v] = B^T Ptilde (6 in-block terms per vehicle)
            T = []
            for iv in range(v):
                b_i = b_vecs[iv]
                acc = b_i[0][None, :] * p_rows[NX * iv]
                for rr in range(1, NX):
                    acc = acc + b_i[rr][None, :] * p_rows[NX * iv + rr]
                T.append(acc)                          # (W, TB)
            hu_k = hu_ref[kk]                          # (v8, TB)
            hm = [[jnp.sum(T[i2][NX * j:NX * (j + 1)] * b_vecs[j], axis=0)
                   for j in range(v)] for i2 in range(v)]
            for i2 in range(v):
                hm[i2][i2] = hm[i2][i2] + hu_k[i2]
            L = _chol_scalar(hm, v)
            # F[v] = T[v] A (block columns)
            F = []
            for iv in range(v):
                blocks = []
                for w in range(v):
                    acc = T[iv][NX * w][None, :] * a_ref[w, 0]
                    for rr in range(1, NX):
                        acc = acc + (T[iv][NX * w + rr][None, :]
                                     * a_ref[w, rr])
                    blocks.append(acc)                 # (NX, TB)
                F.append(jnp.concatenate(blocks, axis=0))
            Kg = _chol_solve_rows(L, F, v)
            # P_k = A^T Ptilde A - F^T Hm^{-1} F, row by row
            for c in range(W):
                w = c // NX
                cc = c - NX * w
                nc = a_ref[w, 0][cc][None, :] * p_rows[NX * w]
                for rr in range(1, NX):
                    nc = nc + (a_ref[w, rr][cc][None, :]
                               * p_rows[NX * w + rr])  # (W, TB)
                blocks = []
                for w2_ in range(v):
                    acc = nc[NX * w2_][None, :] * a_ref[w2_, 0]
                    for jj in range(1, NX):
                        acc = acc + (nc[NX * w2_ + jj][None, :]
                                     * a_ref[w2_, jj])
                    blocks.append(acc)
                pk = jnp.concatenate(blocks, axis=0)
                for iv in range(v):
                    pk = pk - F[iv][c][None, :] * Kg[iv]
                pt_ref[c] = pk
            # store stage factors
            zero_l = jnp.zeros((TB,), jnp.float32)
            for iv in range(v):
                f_ref[kk, iv] = F[iv]
                kg_ref[kk, iv] = Kg[iv]
                lrow = [L[iv][j] if j <= iv else zero_l for j in range(v)]
                lrow += [zero_l] * (v8 - v)
                lh_ref[kk, iv] = jnp.stack(lrow)
            return 0

        jax.lax.fori_loop(0, k_st, stage, 0)

    return kernel


def _make_solve_kernel(v: int, k_st: int, n_rhs: int):
    W = v * NX
    v8 = _pad_to(v, 8)

    def kernel(f_ref, lh_ref, kg_ref, a_ref, b_ref, rhs_ref, du_ref):
        b_vecs = [b_ref[i] for i in range(v)]
        zero_l = jnp.zeros((TB,), jnp.float32)

        def bwd(i, lam):
            kk = k_st - 1 - i
            outs = []
            for ri in range(n_rhs):
                lam_r = lam[ri]                        # (W, TB)
                rhs_k = rhs_ref[ri, kk]                # (v8, TB)
                lh_k = [lh_ref[kk, iv] for iv in range(v)]
                f_k = [f_ref[kk, iv] for iv in range(v)]
                L = [[lh_k[i2][j] for j in range(v)] for i2 in range(v)]
                g = [jnp.sum(b_vecs[iv] * lam_r[NX * iv:NX * (iv + 1)],
                             axis=0) - rhs_k[iv] for iv in range(v)]
                xg = _chol_solve_rows(L, g, v)
                kf = [-x for x in xg]
                du_ref[ri, kk] = jnp.stack(
                    kf + [zero_l] * (v8 - v))
                # lam' = A^T lam + F^T kff
                blocks = []
                for w in range(v):
                    lam_w = lam_r[NX * w:NX * (w + 1)]
                    acc = lam_w[0][None, :] * a_ref[w, 0]
                    for rr in range(1, NX):
                        acc = acc + lam_w[rr][None, :] * a_ref[w, rr]
                    blocks.append(acc)
                new_lam = jnp.concatenate(blocks, axis=0)
                for iv in range(v):
                    new_lam = new_lam + kf[iv][None, :] * f_k[iv]
                outs.append(new_lam)
            return jnp.stack(outs)

        lam0 = jnp.zeros((n_rhs, W, TB), jnp.float32)
        jax.lax.fori_loop(0, k_st, bwd, lam0)

        def fwd(kk, xs):
            outs = []
            for ri in range(n_rhs):
                x_r = xs[ri]                           # (W, TB)
                kg_k = [kg_ref[kk, iv] for iv in range(v)]
                kf_k = du_ref[ri, kk]                  # (v8, TB) staged kff
                u = [kf_k[iv] - jnp.sum(kg_k[iv] * x_r, axis=0)
                     for iv in range(v)]
                du_ref[ri, kk] = jnp.stack(
                    u + [zero_l] * (v8 - v))
                blocks = []
                for w in range(v):
                    x_w = x_r[NX * w:NX * (w + 1)]
                    rows = [jnp.sum(a_ref[w, rr] * x_w, axis=0)
                            for rr in range(NX)]
                    ax_w = jnp.stack(rows)             # (NX, TB)
                    blocks.append(ax_w + u[w][None, :] * b_vecs[w])
                outs.append(jnp.concatenate(blocks, axis=0))
            return jnp.stack(outs)

        x0 = jnp.zeros((n_rhs, W, TB), jnp.float32)
        jax.lax.fori_loop(0, k_st, fwd, x0)

    return kernel


def _pad_batch(arrs, b_pad, fills):
    out = []
    for a, fill in zip(arrs, fills):
        e = b_pad - a.shape[0]
        if e:
            pad_blk = jnp.full((e,) + a.shape[1:], fill, a.dtype)
            a = jnp.concatenate([a, pad_blk], axis=0)
        out.append(a)
    return out


def riccati_factor_lane(a_blk, b_blk, hy, hu_diag):
    """Batched backward Riccati sweep in one launch per lane tile.

    a_blk (B, V, NX, NX), b_blk (B, V, NX), hy (B, K, 2V, 2V),
    hu_diag (B, K, V) -> (f (B, K, V, V, NX), lh (B, K, V, V),
    kg (B, K, V, V, NX)) — the same stage factors (same state basis) as
    ops/riccati.riccati_factor's scan implementation.
    """
    B, v, _, _ = a_blk.shape
    k_st = hy.shape[1]
    W = v * NX
    v8 = _pad_to(v, 8)
    b_pad = _pad_to(B, TB)
    # benign padding instances: Hm = hu = 1 (chol well-defined)
    a_blk, b_blk, hy, hu_diag = _pad_batch(
        [a_blk, b_blk, hy, hu_diag], b_pad, [0.0, 0.0, 0.0, 1.0])
    hu_p = jnp.pad(hu_diag, ((0, 0), (0, 0), (0, v8 - v)))
    at = jnp.transpose(a_blk, (1, 2, 3, 0))            # (V, NX, NX, B)
    bt = jnp.transpose(b_blk, (1, 2, 0))               # (V, NX, B)
    hyt = jnp.transpose(hy, (1, 2, 3, 0))              # (K, 2V, 2V, B)
    hut = jnp.transpose(hu_p, (1, 2, 0))               # (K, v8, B)

    grid = (b_pad // TB,)
    f, lh, kg = pl.pallas_call(
        _make_factor_kernel(v, k_st),
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k_st, 2 * v, 2 * v, TB), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_st, v8, TB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, NX, NX, TB), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, NX, TB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k_st, v, W, TB), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_st, v, v8, TB), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_st, v, W, TB), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k_st, v, W, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((k_st, v, v8, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((k_st, v, W, b_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((W, W, TB), jnp.float32)],
    )(hyt, hut, at, bt)
    f_b = jnp.transpose(f, (3, 0, 1, 2))[:B].reshape(B, k_st, v, v, NX)
    lh_b = jnp.transpose(lh, (3, 0, 1, 2))[:B, :, :, :v]
    kg_b = jnp.transpose(kg, (3, 0, 1, 2))[:B].reshape(B, k_st, v, v, NX)
    return f_b, lh_b, kg_b


def riccati_solve_lane(f, lh, kg, a_blk, b_blk, r):
    """Batched backward+forward solve sweep in one launch per lane tile.

    f/lh/kg from :func:`riccati_factor_lane` (batch-leading), r (B, K, V)
    -> du (B, K, V).
    """
    B, k_st, v = r.shape
    W = v * NX
    v8 = _pad_to(v, 8)
    b_pad = _pad_to(B, TB)
    f, lh, kg, a_blk, b_blk, r = _pad_batch(
        [f.reshape(B, k_st, v, W), lh, kg.reshape(B, k_st, v, W),
         a_blk, b_blk, r],
        b_pad, [0.0, 1.0, 0.0, 0.0, 0.0, 0.0])
    lh_p = jnp.pad(lh, ((0, 0), (0, 0), (0, 0), (0, v8 - v)))
    r_p = jnp.pad(r, ((0, 0), (0, 0), (0, v8 - v)))
    ft = jnp.transpose(f, (1, 2, 3, 0))
    lt = jnp.transpose(lh_p, (1, 2, 3, 0))
    kt = jnp.transpose(kg, (1, 2, 3, 0))
    at = jnp.transpose(a_blk, (1, 2, 3, 0))
    bt = jnp.transpose(b_blk, (1, 2, 0))
    rt = jnp.transpose(r_p, (1, 2, 0))[None]           # (1, K, v8, B)

    grid = (b_pad // TB,)
    du = pl.pallas_call(
        _make_solve_kernel(v, k_st, 1),
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k_st, v, W, TB), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_st, v, v8, TB), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_st, v, W, TB), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, NX, NX, TB), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, NX, TB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_st, v8, TB), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k_st, v8, TB), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, k_st, v8, b_pad), jnp.float32),
    )(ft, lt, kt, at, bt, rt)
    return jnp.transpose(du[0], (2, 0, 1))[:B, :, :v]
