"""Block-banded (Riccati) KKT solve for the condensed SCP Newton system.

The dense condensed IPM factors ``K = P + G^T W G + D_box`` over the stacked
controls — O((V*hu)^3) per factorization (reference structure:
``MPC_Iter.py:129-149`` condensed matrices feeding ``SCP_controller.py:
100-145``'s QP). That cube is simultaneously the fused kernel's compute
bound, the hp>=48 VMEM cliff, and the reason horizon sharding attacks the
wrong term (BENCHMARKS.md "Model-axis crossover"). This module solves the
SAME linear system through its *multiple-shooting* form instead:

    variables   dx_k (V*NX, k=1..K), du_k (V, k=0..K-1)
    dynamics    dx_{k+1} = A dx_k + B du_k,   dx_0 = 0
    stage cost  1/2 dy_k^T Hy_k dy_k + 1/2 du_k^T Hu_k du_k - r_k^T du_k
                with dy_k = C dx_{k+1}  (positions of stage k+1)

Eliminating dx via the dynamics gives exactly ``K du = r``: the avoidance
rows act purely through the predicted positions (each row touches the
positions of one or two vehicles at ONE step, SCP_controller.py:300-326),
so ``G^T W G`` decomposes into per-stage position Hessians ``Hy_k``
(2V x 2V), and the tracking/steering cost decomposes into the same stage
form (MPC_Iter.py:116-127). A backward Riccati sweep factors the resulting
block-tridiagonal KKT in O(K * (V*NX)^3) — LINEAR in the horizon — with a
per-stage working set of (V*NX)^2 instead of the (V*hu)^2 dense factor.

TPU-first notes: all shapes are static; the stage recursion is a
``lax.scan`` of small einsums that batch over scenario instances under
``vmap`` (the per-stage (V*NX)x(V*NX) products become batched MXU matmuls);
the V x V input-Hessian factorizations are statically unrolled Cholesky
sweeps (V is a trace-time constant — XLA's batched small-matrix LU/Cholesky
is unusable on TPU, see BENCHMARKS.md).

Everything here is per-instance (no batch axis); ``vmap`` adds it.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from scp_tpu.config import NX, NY


# ---------------------------------------------------------------------------
# statically-unrolled small-matrix Cholesky (V x V input Hessians)
# ---------------------------------------------------------------------------

def chol_small(M: jax.Array) -> jax.Array:
    """Cholesky of a small SPD matrix with a STATIC unrolled sweep.

    M: (..., V, V) with V a trace-time constant (<= ~16). XLA's batched
    ``jnp.linalg.cholesky`` lowers to an unusable TPU path at these sizes
    (BENCHMARKS.md); the unrolled column sweep is a handful of fused VPU
    ops under vmap.
    """
    v = M.shape[-1]
    L = jnp.zeros_like(M)
    for j in range(v):
        s = M[..., j, j]
        for p in range(j):
            s = s - L[..., j, p] * L[..., j, p]
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        L = L.at[..., j, j].set(d)
        for i in range(j + 1, v):
            s = M[..., i, j]
            for p in range(j):
                s = s - L[..., i, p] * L[..., j, p]
            L = L.at[..., i, j].set(s / d)
    return L


def chol_solve_small(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (L L^T) x = b with static unrolled substitutions.

    L: (..., V, V) lower; b: (..., V) or (..., V, M).
    """
    v = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    y = [None] * v
    for i in range(v):
        s = b[..., i, :]
        for p in range(i):
            s = s - L[..., i, p, None] * y[p]
        y[i] = s / L[..., i, i, None]
    x = [None] * v
    for i in reversed(range(v)):
        s = y[i]
        for p in range(i + 1, v):
            s = s - L[..., p, i, None] * x[p]
        x[i] = s / L[..., i, i, None]
    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vec else out


# ---------------------------------------------------------------------------
# stage-Hessian assembly from the constraint rows' position coefficients
# ---------------------------------------------------------------------------

def build_hy(pairs: tuple, y_pair: jax.Array, y_obst: jax.Array,
             w_pair: jax.Array, w_obst: jax.Array,
             qy_stage: jax.Array) -> jax.Array:
    """Per-stage position Hessians ``Hy_k`` (K, 2V, 2V).

    ``y_pair (P, K, NY)``: raw position coefficient of pair row (p, k) —
    the row acts as ``y·dy_k^i - y·dy_k^j`` for ``pairs[p] = (i, j)``
    (the SCP linearization's ``-2 d_pair``, constraints.linearize_slabs).
    ``y_obst (V, O, K, NY)``: single-vehicle obstacle-row coefficients.
    ``w_pair (P, K)`` / ``w_obst (V, O, K)``: the IPM's barrier weights for
    those rows, ALREADY multiplied by the squared equilibration scale
    (w_r * d_row_r^2 — the equilibrated row is d_row * raw row).
    ``qy_stage (V, K)``: diagonal tracking-cost weight per vehicle/stage
    (2 * q, terminal 2 * q_final, times the solver's cost scale).
    """
    v, o, k, _ = y_obst.shape
    hy = jnp.zeros((k, v, NY, v, NY), y_obst.dtype)
    # pair rows: +y on vehicle i, -y on vehicle j => blocks
    # (i,i) += w yy^T, (j,j) += w yy^T, (i,j) and (j,i) -= w yy^T
    for p, (i, j) in enumerate(pairs):
        wyy = jnp.einsum("k,ka,kb->kab", w_pair[p], y_pair[p], y_pair[p])
        hy = hy.at[:, i, :, i, :].add(wyy)
        hy = hy.at[:, j, :, j, :].add(wyy)
        hy = hy.at[:, i, :, j, :].add(-wyy)
        hy = hy.at[:, j, :, i, :].add(-wyy)
    # obstacle rows: one diagonal block each
    if o:
        wyy_o = jnp.einsum("vok,voka,vokb->vkab", w_obst, y_obst, y_obst)
        for vv in range(v):
            hy = hy.at[:, vv, :, vv, :].add(wyy_o[vv])
    # tracking cost: q * I_2 per vehicle diagonal block
    di = jnp.arange(NY)
    hy = hy.at[:, jnp.arange(v)[:, None], di[None, :],
               jnp.arange(v)[:, None], di[None, :]].add(
        jnp.transpose(qy_stage)[:, :, None])
    return hy.reshape(k, v * NY, v * NY)


# ---------------------------------------------------------------------------
# Riccati factor / solve
# ---------------------------------------------------------------------------

class RiccatiFactor(NamedTuple):
    """Per-stage factorization of the block-banded KKT (leading axis K)."""
    f: jax.Array     # (K, V, V, NX)  F_k = B^T Ptilde_{k+1} A
    lh: jax.Array    # (K, V, V)      chol(Hu_k + B^T Ptilde_{k+1} B)
    kg: jax.Array    # (K, V, V, NX)  gain (Hm)^{-1} F_k


# Kernel dispatch under vmap: None = auto (f32 on the TPU backend uses the
# fused Pallas sweeps, ops/pallas_riccati.py); True/False force. The scan
# implementation below stays the unbatched / f64 / CPU path.
KERNEL: bool | None = None


def _use_kernel(dtype) -> bool:
    if KERNEL is not None:
        return KERNEL
    return dtype == jnp.float32 and jax.default_backend() == "tpu"


def _riccati_factor_scan(a_blk: jax.Array, b_blk: jax.Array, hy: jax.Array,
                         hu_diag: jax.Array) -> RiccatiFactor:
    """Backward Riccati sweep over the stage Hessians (scan form).

    a_blk (V, NX, NX) / b_blk (V, NX): per-vehicle discrete dynamics
    (identical across stages — one linearization per MPC step,
    MPC_Iter.py:94-97). hy (K, 2V, 2V) from :func:`build_hy`;
    hu_diag (K, V): per-stage diagonal input Hessian (2 r * cost_scale +
    box barrier weights + any extra diagonal).
    """
    v = a_blk.shape[0]
    k = hy.shape[0]
    w = v * NX
    dtype = hy.dtype

    def add_hy(P, hy_k):
        # positions are entries 0:NY of each vehicle's NX block
        P5 = P.reshape(v, NX, v, NX)
        return P5.at[:, :NY, :, :NY].add(
            hy_k.reshape(v, NY, v, NY)).reshape(w, w)

    def backward(P, inp):
        hy_k, hu_k = inp
        Pt = add_hy(P, hy_k)                                # (W, W)
        Pt5 = Pt.reshape(v, NX, v, NX)
        # T = B^T Ptilde (per-vehicle row contraction), F = T A
        T = jnp.einsum("vj,vjwk->vwk", b_blk, Pt5)          # (V, V, NX)
        F = jnp.einsum("vwj,wjk->vwk", T, a_blk)            # (V, V, NX)
        Hm = jnp.einsum("vwk,wk->vw", T, b_blk)             # (V, V)
        Hm = Hm + jnp.diag(hu_k)
        Lh = chol_small(Hm)
        Ff = F.reshape(v, w)
        Kg = chol_solve_small(Lh, Ff)                       # (V, W)
        # P_k = A^T Ptilde A - F^T Hm^{-1} F
        PA = jnp.einsum("viwj,wjk->viwk", Pt5, a_blk)       # (V,NX,V,NX)
        AtPA = jnp.einsum("vji,vjwk->viwk",
                          a_blk, PA).reshape(w, w)
        Pk = AtPA - Ff.T @ Kg
        Pk = 0.5 * (Pk + Pk.T)
        return Pk, (Ff.reshape(v, v, NX), Lh, Kg.reshape(v, v, NX))

    P_end = jnp.zeros((w, w), dtype)
    _, (f, lh, kg) = jax.lax.scan(
        backward, P_end, (hy, hu_diag), reverse=True)
    return RiccatiFactor(f=f, lh=lh, kg=kg)


def _riccati_solve_scan(fac: RiccatiFactor, a_blk: jax.Array,
                        b_blk: jax.Array, r: jax.Array) -> jax.Array:
    """Solve the factored banded KKT for the stage linear terms ``r (K, V)``
    (the u-space RHS reshaped stage-major). Returns ``du (K, V)``.

    Backward sweep propagates the value-function linear term
    ``p_k = A^T p_{k+1} + F_k^T kff_k`` with
    ``kff_k = -Hm^{-1} (B^T p_{k+1} - r_k)``; the forward rollout then
    recovers ``du_k = kff_k - Kg_k x_k``.
    """
    v = a_blk.shape[0]

    def backward(p, inp):
        F_k, Lh_k, r_k = inp                                # p: (V, NX)
        g = jnp.einsum("vj,vj->v", b_blk, p) - r_k          # (V,)
        kff = -chol_solve_small(Lh_k, g)                    # (V,)
        p_new = jnp.einsum("vjk,vj->vk", a_blk, p) \
            + jnp.einsum("vwk,v->wk", F_k, kff)
        return p_new, kff

    p_end = jnp.zeros((v, NX), r.dtype)
    _, kff = jax.lax.scan(backward, p_end, (fac.f, fac.lh, r),
                          reverse=True)

    def forward(x, inp):
        Kg_k, kff_k = inp                                   # x: (V, NX)
        u_k = kff_k - jnp.einsum("vwk,wk->v", Kg_k, x)
        x_new = jnp.einsum("vkj,vj->vk", a_blk, x) + b_blk * u_k[:, None]
        return x_new, u_k

    x0 = jnp.zeros((v, NX), r.dtype)
    _, du = jax.lax.scan(forward, x0, (fac.kg, kff))
    return du


# ---------------------------------------------------------------------------
# custom_vmap fronts: unbatched calls run the scans; batched f32 TPU calls
# run the fused Pallas sweeps (one launch per 128-instance lane tile)
# ---------------------------------------------------------------------------

@jax.custom_batching.custom_vmap
def riccati_factor(a_blk: jax.Array, b_blk: jax.Array, hy: jax.Array,
                   hu_diag: jax.Array) -> RiccatiFactor:
    """Backward Riccati sweep (see :func:`_riccati_factor_scan`); under
    vmap on f32/TPU the fused Pallas kernel engages automatically."""
    return _riccati_factor_scan(a_blk, b_blk, hy, hu_diag)


@riccati_factor.def_vmap
def _riccati_factor_vmap(axis_size, in_batched, a_blk, b_blk, hy, hu_diag):
    del axis_size
    def bcast(x, batched):
        return x if batched else jnp.broadcast_to(x, hy.shape[:1] + x.shape)
    a_blk = bcast(a_blk, in_batched[0])
    b_blk = bcast(b_blk, in_batched[1])
    hu_diag = bcast(hu_diag, in_batched[3])
    assert in_batched[2], "hy must carry the batch axis"
    if _use_kernel(hy.dtype):
        from scp_tpu.ops import pallas_riccati as pr
        f, lh, kg = pr.riccati_factor_lane(a_blk, b_blk, hy, hu_diag)
        out = RiccatiFactor(f=f, lh=lh, kg=kg)
    else:
        out = jax.vmap(_riccati_factor_scan)(a_blk, b_blk, hy, hu_diag)
    return out, RiccatiFactor(f=True, lh=True, kg=True)


@jax.custom_batching.custom_vmap
def riccati_solve(fac: RiccatiFactor, a_blk: jax.Array, b_blk: jax.Array,
                  r: jax.Array) -> jax.Array:
    """Banded back-substitution (see :func:`_riccati_solve_scan`); under
    vmap on f32/TPU the fused Pallas kernel engages automatically."""
    return _riccati_solve_scan(fac, a_blk, b_blk, r)


@riccati_solve.def_vmap
def _riccati_solve_vmap(axis_size, in_batched, fac, a_blk, b_blk, r):
    del axis_size
    fac_b, a_b, b_b, r_b = in_batched
    assert all(jax.tree_util.tree_leaves(fac_b)) and r_b, (fac_b, r_b)
    def bcast(x, batched):
        return x if batched else jnp.broadcast_to(x, r.shape[:1] + x.shape)
    a_blk = bcast(a_blk, a_b)
    b_blk = bcast(b_blk, b_b)
    if _use_kernel(r.dtype):
        from scp_tpu.ops import pallas_riccati as pr
        du = pr.riccati_solve_lane(fac.f, fac.lh, fac.kg, a_blk, b_blk, r)
    else:
        du = jax.vmap(_riccati_solve_scan)(fac, a_blk, b_blk, r)
    return du, True
