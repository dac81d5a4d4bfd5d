"""Pallas TPU kernels: batched small-matrix Cholesky factor + solve.

Why: the QP inner loop factors thousands of small (n ~ 81) SPD KKT matrices
per iteration. XLA's native batched Cholesky lowers to a column-sequential
loop that costs ~5-7 ms for (512, 81, 81) f32 on a v5e — ~30x more than the
MXU matmul that *builds* those matrices. These kernels lay the **batch** on
the 128-wide lane axis (classic batched-small-LA layout) so every step of
the factorization is a full-width VPU op in exact f32:

* ``cholesky``: statically-unrolled panelized right-looking factorization,
  trailing updates restricted to the lower block-triangle, all in VMEM.
  NB: above-diagonal entries of the result are garbage (see
  ``_factor_in_place``) — the solve kernels only read the lower triangle.
* ``cho_solve``: forward + backward panel substitution against the factor.

Both are exposed through ``jax.custom_batching.custom_vmap`` so per-instance
solver code (``scp_tpu/solvers/qp.py``) stays unbatched and the kernels
engage automatically under ``vmap``; unbatched calls fall back to the XLA
ops. Matrices are padded to sublane multiples with a unit diagonal, batches
to lane multiples.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scp_tpu.ops import linalg as _lin

TB = 128          # batch tile = lane width. 256 measured 25% SLOWER end-to-
                   # end (32523 -> 24377 solves/s, compile 17 -> 56 s): the
                   # 2-vregs-per-op unrolled factor/solve bodies spill, they
                   # don't fill latency bubbles.
_SUBLANE = 8

# Tests can flip this to run the kernels in Pallas interpret mode on CPU.
INTERPRET = False


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_dim(n: int) -> int:
    """Matrix size the kernels require (sublane multiple — the statically
    unrolled loops handle any multiple of 8, so n=81 pads to 88, not 96:
    ~20% less factor/matmul work). Callers that pre-pad their systems to
    this (identity diagonal on the pad block) skip the pad/slice copies here,
    and the factor->solve transpose pairs become adjacent so XLA cancels
    them (see scp_tpu/solvers/qp.py)."""
    return _pad_to(n, _SUBLANE)


# ---------------------------------------------------------------------------
# kernels (layout: column-major-with-batch — a[c, r, b] = M_b[r, c])
# ---------------------------------------------------------------------------

_CHUNK = 16  # trailing-update column-chunk width (majors per pass)


def _factor_in_place(out_ref, n):
    """Panelized right-looking Cholesky on a resident (n, n, TB) VMEM block
    in kernel layout (out_ref[c, r, b] = K_b[r, c]), fully statically
    unrolled (``n`` is a Python int).

    Only the LOWER triangle of the result is meaningful: above-diagonal
    entries hold stale/garbage values. Every consumer (the substitution
    kernels below) reads strictly lower-triangular entries, and skipping the
    upper triangle lets every slice start/size be static — Mosaic emits
    plain vector ops with no iota/select masks and no dynamic slicing — and
    restricts the trailing update to lower block-triangle slabs (~2x fewer
    MACs than full-width masked sweeps).
    """
    for base in range(0, n, _SUBLANE):
        rows = n - base                                  # rows [base, n)
        # factor the 8 panel columns; updates stay inside the panel slab
        for jj in range(_SUBLANE):  # static unroll
            j = base + jj
            col = out_ref[pl.ds(j, 1), pl.ds(base, rows), :].reshape(rows, TB)
            lcol = col * jax.lax.rsqrt(col[jj])[None, :]
            out_ref[pl.ds(j, 1), pl.ds(base, rows), :] = \
                lcol.reshape(1, rows, TB)
            if jj < _SUBLANE - 1:
                w = _SUBLANE - 1 - jj
                slab = out_ref[pl.ds(j + 1, w), pl.ds(base, rows), :]
                coef = lcol[jj + 1:_SUBLANE]             # (w, TB)
                out_ref[pl.ds(j + 1, w), pl.ds(base, rows), :] = (
                    slab - coef[:, None, :] * lcol[None, :, :])
        first = base + _SUBLANE
        if first >= n:
            break
        # trailing update, lower block-triangle only: for each 16-column
        # chunk [cs, cs+w), touch rows [cs, n) — the skipped rows are the
        # (unused) upper triangle. One fused 8-MAC pass per chunk.
        panel = out_ref[pl.ds(base, _SUBLANE), pl.ds(first, n - first), :]
        for cs in range(first, n, _CHUNK):
            w = min(_CHUNK, n - cs)
            rl = n - cs                                  # rows [cs, n)
            o = cs - first
            block = out_ref[pl.ds(cs, w), pl.ds(cs, rl), :]
            acc = panel[0, o:o + w, :][:, None, :] * panel[0, o:, :][None]
            for jj in range(1, _SUBLANE):
                acc = acc + (panel[jj, o:o + w, :][:, None, :]
                             * panel[jj, o:, :][None])
            out_ref[pl.ds(cs, w), pl.ds(cs, rl), :] = block - acc


def _cholesky_panel_kernel(k_ref, out_ref):
    """Batched Cholesky on one auto-pipelined 128-instance tile: copy the
    input block into the output block and factor in place there. Pallas'
    multiple-buffering prefetches tile i+1's K and writes back tile i-1's
    factor while tile i factors (the 4 revolving (n, n, TB) buffers need
    the raised ``vmem_limit_bytes``; the manual-DMA version this replaces
    serialized the HBM traffic with the compute)."""
    out_ref[...] = k_ref[...]
    _factor_in_place(out_ref, out_ref.shape[0])


def _fwd_bwd_solve(l_ref, b, y_ref, n):
    """Solve (L L^T) x = b against the kernel-layout factor in ``l_ref``
    (l_ref[c, r, b] = L_b[r, c], garbage above the diagonal), fully
    statically unrolled. ``b`` is an (n, TB) value; ``y_ref`` is an (n, TB)
    scratch; returns the (n, TB) solution value.

    Per 8-row panel: a tiny unrolled in-panel substitution whose
    coefficients are STATIC indices into a value slab (the dynamic-index
    (1, 1, TB) ref gathers this replaces were the dominant cost of the old
    kernel), then ONE fused 8-MAC elimination of the panel's contribution
    from exactly the remaining rows — static slices, no masks.
    """
    # ---- forward: L y = b ----
    y_ref[...] = b

    for base in range(0, n, _SUBLANE):  # static unroll
        rows = n - base
        # cols[k, r, :] = L[base+r, base+k] for rows r >= 0 (offset base)
        cols = l_ref[pl.ds(base, _SUBLANE), pl.ds(base, rows), :]
        b_pan = y_ref[pl.ds(base, _SUBLANE), :]          # (8, TB)
        ys = []
        for jj in range(_SUBLANE):
            acc = b_pan[jj]
            for k in range(jj):
                acc = acc - cols[k, jj] * ys[k]
            ys.append(acc / cols[jj, jj])
        y_ref[pl.ds(base, _SUBLANE), :] = jnp.stack(ys)
        if base + _SUBLANE < n:
            # one fused elimination from all remaining rows
            upd = cols[0, _SUBLANE:, :] * ys[0][None, :]
            for jj in range(1, _SUBLANE):
                upd = upd + cols[jj, _SUBLANE:, :] * ys[jj][None, :]
            tail = rows - _SUBLANE
            y_ref[pl.ds(base + _SUBLANE, tail), :] = (
                y_ref[pl.ds(base + _SUBLANE, tail), :] - upd)

    # ---- backward: L^T x = y (in place in y_ref) ----
    for base in range(n - _SUBLANE, -1, -_SUBLANE):  # static unroll
        # dslab[c, r, :] = L[base+r, base+c] — the diagonal 8x8 block
        dslab = l_ref[pl.ds(base, _SUBLANE), pl.ds(base, _SUBLANE), :]
        b_pan = y_ref[pl.ds(base, _SUBLANE), :]
        xs = [None] * _SUBLANE
        for jj in reversed(range(_SUBLANE)):
            acc = b_pan[jj]
            for k in range(jj + 1, _SUBLANE):
                acc = acc - dslab[jj, k] * xs[k]         # L[base+k, base+jj]
            xs[jj] = acc / dslab[jj, jj]
        y_ref[pl.ds(base, _SUBLANE), :] = jnp.stack(xs)
        if base > 0:
            # eliminate the panel from the rows above:
            # y[c] -= sum_jj L[base+jj, c] * x_jj for c < base, where
            # rows8[c, jj, :] = L[base+jj, c] (strictly lower: c < base).
            rows8 = l_ref[pl.ds(0, base), pl.ds(base, _SUBLANE), :]
            upd = rows8[:, 0, :] * xs[0][None, :]
            for jj in range(1, _SUBLANE):
                upd = upd + rows8[:, jj, :] * xs[jj][None, :]
            y_ref[pl.ds(0, base), :] = y_ref[pl.ds(0, base), :] - upd

    return y_ref[...]


def _cho_solve_kernel(l_ref, b_ref, out_ref, y_ref):
    """Solve (L L^T) x = b (see ``_fwd_bwd_solve``)."""
    out_ref[...] = _fwd_bwd_solve(l_ref, b_ref[...], y_ref, l_ref.shape[0])


def _gmv_kernel(g_ref, x_ref, out_ref):
    """out[mb, b] = sum_n g[mb, n, b] * x[n, b] — lane-parallel reduction."""
    out_ref[...] = jnp.sum(g_ref[...] * x_ref[...][None, :, :], axis=1)


def _gtmv_kernel(g_ref, v_ref, out_ref):
    """out[nb, b] = sum_m g[m, nb, b] * v[m, b] — lane-parallel reduction."""
    out_ref[...] = jnp.sum(g_ref[...] * v_ref[...][:, None, :], axis=0)


# ---------------------------------------------------------------------------
# direct lane-layout APIs — for the natively-batched TPU solver
# (scp_tpu/solvers/qp.py::solve_qp_batched), which controls layout itself:
# G/P are transposed to lane layout ONCE per solve, factors and vectors stay
# in kernel layout end-to-end, so no per-iteration transposes exist at all.
# ---------------------------------------------------------------------------

_MV_MB = 32   # row-block for the forward matvec
_MV_NB = 8    # column-block for the transposed matvec


def to_lane3(A: jax.Array, pad_major: int = 1):
    """(B, m, n) -> (m_pad, n_pad, b_pad) lane layout (pads with zeros)."""
    B, m, n = A.shape
    m_pad = _pad_to(m, max(_MV_MB, pad_major))
    n_pad, b_pad = _pad_to(n, _SUBLANE), _pad_to(B, TB)
    At = jnp.transpose(A, (1, 2, 0))
    if (m_pad, n_pad, b_pad) != (m, n, B):
        At = jnp.pad(At, ((0, m_pad - m), (0, n_pad - n), (0, b_pad - B)))
    return At


def cholesky_lane(K: jax.Array) -> jax.Array:
    """K: (B, n, n) SPD with n % 16 == 0, B % TB == 0 -> factor in kernel
    layout (n, n, B), out[c, r, b] = L_b[r, c]. No back-transpose: feed the
    result straight to ``cho_solve_lane``."""
    B, n, _ = K.shape
    assert n % _SUBLANE == 0 and B % TB == 0, (n, B)
    Kt = jnp.transpose(K, (2, 1, 0))
    return pl.pallas_call(
        _cholesky_panel_kernel,
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        grid=(B // TB,),
        in_specs=[pl.BlockSpec((n, n, TB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n, TB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n, B), K.dtype),
    )(Kt)


def cho_solve_lane(Lt: jax.Array, bt: jax.Array) -> jax.Array:
    """Lt: (n, n, B) kernel-layout factor, bt: (n, B) -> x (n, B)."""
    n, _, B = Lt.shape
    return pl.pallas_call(
        _cho_solve_kernel,
        interpret=INTERPRET,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((n, n, TB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, B), bt.dtype),
        scratch_shapes=[pltpu.VMEM((n, TB), bt.dtype)],
    )(Lt, bt)


def gmv_lane(G_lane: jax.Array, x_lane: jax.Array) -> jax.Array:
    """G_lane: (m, n, B) from ``to_lane3``; x_lane: (n, B) -> (m, B) with
    out[:, b] = G_b @ x_b. Lane-parallel VPU reduction: one streaming read
    of G at HBM speed-of-light."""
    m, n, B = G_lane.shape
    return pl.pallas_call(
        _gmv_kernel,
        interpret=INTERPRET,
        grid=(B // TB, m // _MV_MB),
        in_specs=[
            pl.BlockSpec((_MV_MB, n, TB), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, TB), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_MV_MB, TB), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, B), G_lane.dtype),
    )(G_lane, x_lane)


def gtmv_lane(G_lane: jax.Array, v_lane: jax.Array) -> jax.Array:
    """G_lane: (m, n, B); v_lane: (m, B) -> (n, B) with out[:, b] = G_b^T v_b."""
    m, n, B = G_lane.shape
    return pl.pallas_call(
        _gtmv_kernel,
        interpret=INTERPRET,
        grid=(B // TB, n // _MV_NB),
        in_specs=[
            pl.BlockSpec((m, _MV_NB, TB), lambda i, j: (0, j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, TB), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_MV_NB, TB), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, B), v_lane.dtype),
    )(G_lane, v_lane)


# ---------------------------------------------------------------------------
# batched host-side wrappers
# ---------------------------------------------------------------------------

def _batched_cholesky_impl(K: jax.Array) -> jax.Array:
    """K: (B, n, n) SPD -> lower factors (B, n, n)."""
    B, n, _ = K.shape
    n_pad = pad_dim(n)
    b_pad = _pad_to(B, TB)
    if n == n_pad and B == b_pad:
        Kp = K  # pre-aligned caller: no pad copy
    else:
        Kp = jnp.zeros((b_pad, n_pad, n_pad), K.dtype)
        Kp = Kp.at[:, jnp.arange(n_pad), jnp.arange(n_pad)].set(1.0)
        Kp = Kp.at[:B, :n, :n].set(K)
    # layout (col, row, batch)
    Kt = jnp.transpose(Kp, (2, 1, 0))

    out = pl.pallas_call(
        _cholesky_panel_kernel,
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        grid=(b_pad // TB,),
        in_specs=[pl.BlockSpec((n_pad, n_pad, TB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_pad, n_pad, TB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad, b_pad), K.dtype),
    )(Kt)
    # NB: above-diagonal entries are garbage (``_factor_in_place``); the only
    # consumers (the cho_solve kernels) read strictly lower-triangular
    # entries, so no tril cleanup is spent here.
    L = jnp.transpose(out, (2, 1, 0))
    if n == n_pad and B == b_pad:
        return L
    return L[:B, :n, :n]


def _batched_cho_solve_impl(L: jax.Array, b: jax.Array) -> jax.Array:
    """L: (B, n, n) lower factors, b: (B, n) -> x: (B, n)."""
    B, n, _ = L.shape
    n_pad = _pad_to(n, _SUBLANE)
    b_pad = _pad_to(B, TB)
    if n == n_pad and B == b_pad:
        Lp, bp = L, b  # pre-aligned caller: transpose below cancels with the
        # factor's output transpose under XLA's algebraic simplifier
    else:
        Lp = jnp.zeros((b_pad, n_pad, n_pad), L.dtype)
        Lp = Lp.at[:, jnp.arange(n_pad), jnp.arange(n_pad)].set(1.0)
        Lp = Lp.at[:B, :n, :n].set(L)
        bp = jnp.zeros((b_pad, n_pad), b.dtype).at[:B, :n].set(b)
    Lt = jnp.transpose(Lp, (2, 1, 0))
    bt = jnp.transpose(bp, (1, 0))

    out = pl.pallas_call(
        _cho_solve_kernel,
        interpret=INTERPRET,
        grid=(b_pad // TB,),
        in_specs=[
            pl.BlockSpec((n_pad, n_pad, TB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_pad, TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, b_pad), b.dtype),
        scratch_shapes=[pltpu.VMEM((n_pad, TB), b.dtype)],
    )(Lt, bt)
    return jnp.transpose(out, (1, 0))[:B, :n]


# ---------------------------------------------------------------------------
# custom_vmap fronts: per-instance API that turns into the kernels under vmap
# ---------------------------------------------------------------------------

@jax.custom_batching.custom_vmap
def cholesky(K: jax.Array) -> jax.Array:
    """Lower Cholesky factor of one SPD matrix (kernel engages under vmap)."""
    return _lin.blocked_cholesky(K)


@cholesky.def_vmap
def _cholesky_vmap(axis_size, in_batched, K):
    del axis_size
    (k_batched,) = in_batched
    assert k_batched
    lead = K.shape[:-2]
    n = K.shape[-1]
    Kf = K.reshape((-1, n, n))
    L = _batched_cholesky_impl(Kf)
    return L.reshape(lead + (n, n)), True


@jax.custom_batching.custom_vmap
def cho_solve(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (L L^T) x = b for one instance (kernel engages under vmap)."""
    return _lin.blocked_cho_solve(L, b)


@cho_solve.def_vmap
def _cho_solve_vmap(axis_size, in_batched, L, b):
    del axis_size
    l_batched, b_batched = in_batched
    n = L.shape[-1]
    if not l_batched:
        L = jnp.broadcast_to(L, b.shape[:-1] + (n, n))
    if not b_batched:
        b = jnp.broadcast_to(b, L.shape[:-2] + (n,))
    lead = b.shape[:-1]
    Lf = L.reshape((-1, n, n))
    bf = b.reshape((-1, n))
    x = _batched_cho_solve_impl(Lf, bf)
    return x.reshape(lead + (n,)), True


# ---------------------------------------------------------------------------
# fused IPM iteration kernel: one launch per Mehrotra iteration
# ---------------------------------------------------------------------------
#
# The natively-batched QP spends its iteration on ~10 kernel launches and
# their HBM round-trips: factor (writes L), 2 solves (re-read L), 5 matvecs
# (re-read G), plus XLA vector ops. This kernel does the ENTIRE iteration in
# VMEM per 128-instance tile: Cholesky of the (pre-formed) KKT matrix stays
# resident, G is DMA'd once and reused for every matvec, and the predictor/
# corrector algebra (steps, step-length ratios, centering) runs as
# lane-parallel VPU ops. Only the KKT formation (an MXU matmul) and the
# freeze bookkeeping remain outside.
#
# Vector sections are stacked as [G-rows | ub-rows | lb-rows] with
# section-aligned padding: (MG_PAD + 2*N_PAD, TB). Padding lanes are kept
# benign via masks in every reduction.

def make_ipm_iter_kernel(mg: int, n: int, m_true: int, tol: float,
                         reg_rel: float = 3e-6,
                         pb_dims: tuple[int, int] | None = None,
                         n_cor: int = 0, schur_slack: bool = False,
                         g_struct: tuple | None = None,
                         n_iters: int = 1):
    """Build the fused-iteration kernel for static sizes.

    Layout: mg_pad = pad(mg, 32) G rows, n_pad = pad_dim(n) variables;
    vectors over the inequality system are (mg_pad + 2*n_pad, TB) stacked
    [G | ub | lb] with benign padding.

    ``pb_dims = (nb, d)``: P is block-diagonal — ``nb`` dense (d, d) blocks
    followed by a diagonal tail (read from ``pdiag``). The kernel then takes
    the blocks (nb, d, d, B) in place of the ``px`` input, ADDS them to the
    incoming K (which must be the pure ``G^T W_g G`` product, no P), and
    computes ``P @ x`` itself — the XLA side neither materializes the dense
    padded P (a 32 MB/iteration HBM read at B=1024, n=88) nor runs the
    block matvec as a separate fusion.

    ``g_struct = (pairs, obst_veh, hp, hu)``: the SCP constraint rows are
    PAIR-SPARSE — row ``p*hp + k`` touches only the two hu-wide vehicle
    column blocks of pair ``p`` plus the trailing slack column
    (ops/constraints.py::linearize) — so the kernel takes per-pair row
    slabs ``gi/gj (P, hp, hu8, TB)`` (+ obstacle slabs ``(VO, hp, hu8,
    TB)`` touching one block each, + the equilibrated slack column ``gsl
    (mg_pad, TB)``) instead of the dense G, runs every matvec on the
    slabs, and FORMS the Jacobi-scaled KKT matrix itself, block-wise in
    VMEM via VPU outer-product accumulation. This replaces the XLA-side
    dense ``G^T W_g G`` dot + (B, n, n) -> (n, n, B) layout transpose —
    measured as ~45% of the fused-loop iteration (dot/transpose/DMA
    serialize against the kernel; BENCHMARKS.md "Known headroom") — with
    ~4x fewer MACs (the dense contraction multiplies mostly zeros) and
    zero HBM traffic for K. Requires ``schur_slack`` (the slack column
    never enters the factored block) and ``pb_dims``.

    ``n_iters > 1`` (structured mode only): the kernel runs that many
    Mehrotra iterations per tile in ONE launch, via a second grid
    dimension that revisits the same blocks — the slabs, P blocks and the
    state stay VMEM-resident across iterations (state lives in the
    OUTPUT blocks, initialized from the inputs at iteration 0), so the
    per-iteration launch, state round-trip, and slab re-DMA costs are
    paid once per QP solve instead of once per iteration.
    """
    mg_pad = _pad_to(mg, _MV_MB)
    n_pad = pad_dim(n)
    # schur_slack: variable n-1 (index nu) is a slack with zero P row/col
    # (the SCP exact-penalty omega). Its scaled KKT column is eliminated by
    # a rank-1 Schur update so the factorization and substitutions run on
    # nu columns — a sublane multiple — instead of n_pad (80 vs 88 for the
    # SCP QP: ~25% less factor work, and K never carries the slack).
    nu = n - 1
    if schur_slack:
        assert nu % _SUBLANE == 0, "schur_slack needs (n-1) % 8 == 0"
    ks = nu if schur_slack else n_pad       # factored-system size
    nb, d = pb_dims if pb_dims is not None else (0, 0)
    nbd = nb * d
    # blocks ship with the inner (contraction) axis padded to the sublane
    # tile: an HBM->VMEM DMA must match the tiled HBM layout exactly
    # (Mosaic rejects a (nb, d, d, B) copy when d % 8 != 0).
    d8 = _pad_to(d, _SUBLANE) if d else 0
    if g_struct is not None:
        assert schur_slack, "g_struct requires schur_slack"
        assert pb_dims is not None, "g_struct requires block-diagonal P"
        pairs_s, obst_veh, hp_s, hu_s, *rest_gs = g_struct
        # optional 5th element: the slabs are BLOCK-LOWER-TRIANGULAR in
        # (k, u) — row k touches only controls u <= k (the condensed
        # MPC prediction matrix is block-lower-triangular Toeplitz,
        # reference MPC_Iter.py:129-149). The K formation then skips the
        # all-zero 8-sublane blocks: output block (cg, ag) accumulates
        # only k >= 8*max(cg, ag) — ~42% of the dense FMA sweep at
        # hp=hu=20. MUST only be set when the property actually holds.
        lower_tri_s = bool(rest_gs[0]) if rest_gs else False
        # plain Python ints: Mosaic's index lowering rejects numpy scalars
        pairs_s = tuple((int(i), int(j)) for i, j in pairs_s)
        obst_veh = tuple(int(v) for v in obst_veh)
        hp_s, hu_s = int(hp_s), int(hu_s)
        P_s, VO_s = len(pairs_s), len(obst_veh)
        assert (P_s + VO_s) * hp_s == mg, (g_struct, mg)
        hu8 = _pad_to(hu_s, _SUBLANE)
        n_veh_s = nu // hu_s
        # The K-formation loop only writes blocks for ENUMERATED pairs; any
        # (i, j) not in the list — e.g. ghost alignment vehicles appended
        # by qp.solve_qp_batched, which no constraint row touches — must
        # still get its VMEM blocks ZEROED or the factor's trailing
        # updates consume uninitialized memory arithmetically (NaN risk).
        missing_pairs_s = tuple(
            (i, j) for i in range(n_veh_s) for j in range(i + 1, n_veh_s)
            if (i, j) not in set(pairs_s))
        assert n_veh_s * hu_s == nu and pb_dims == (n_veh_s, hu_s), \
            (pb_dims, nu, hu_s)
    assert n_iters == 1 or g_struct is not None, \
        "multi-iteration kernels need in-kernel K formation (g_struct)"
    multi_iter = g_struct is not None and n_iters >= 1

    def kernel(*refs):
        refs = list(refs)
        if g_struct is None:
            k_in, gv_ref = refs.pop(0), refs.pop(0)
            gi_ref = gj_ref = gob_ref = gsl_ref = None
        else:
            gi_ref, gj_ref = refs.pop(0), refs.pop(0)
            gob_ref = refs.pop(0) if VO_s else None
            gsl_ref = refs.pop(0)
            k_in = gv_ref = None
        (p_in, q_ref, pd_ref,
         x_ref, sg_ref, su_ref, sl_ref, zg_ref, zu_ref, zl_ref,
         rpg_ref, rpu_ref, rpl_ref,
         scal_ref,
         xo_ref, sgo_ref, suo_ref, slo_ref, zgo_ref, zuo_ref, zlo_ref,
         rpgo_ref, rpuo_ref, rplo_ref,
         scalo_ref,
         kv_ref, y_ref) = refs
        # K, G and the P blocks arrive as auto-pipelined VMEM input blocks:
        # Pallas prefetches tile i+1 while tile i computes, overlapping the
        # ~9 MB/tile of HBM reads with the factorization (the manual-DMA
        # version this replaces serialized them — ~25% of kernel time).
        # K is read-only as an input, so the Jacobi-scale pass below doubles
        # as the copy into the factor scratch ``kv_ref``.
        mrow = jax.lax.broadcasted_iota(jnp.int32, (mg_pad, TB), 0)
        nrow = jax.lax.broadcasted_iota(jnp.int32, (n_pad, TB), 0)
        mk_g = mrow < mg          # real G rows
        mk_n = nrow < n           # real variables / box rows
        inf = jnp.float32(jnp.inf)

        if multi_iter:
            # Iteration-revisited state: the second grid dimension maps
            # every block to the same indices, so the OUTPUT blocks stay
            # VMEM-resident across iterations and double as the loop
            # state. Iteration 0 seeds them from the inputs.
            @pl.when(pl.program_id(1) == 0)
            def _():
                xo_ref[...] = x_ref[...]
                sgo_ref[...] = sg_ref[...]
                suo_ref[...] = su_ref[...]
                slo_ref[...] = sl_ref[...]
                zgo_ref[...] = zg_ref[...]
                zuo_ref[...] = zu_ref[...]
                zlo_ref[...] = zl_ref[...]
                rpgo_ref[...] = rpg_ref[...]
                rpuo_ref[...] = rpu_ref[...]
                rplo_ref[...] = rpl_ref[...]
                scalo_ref[...] = scal_ref[...]

            x_src, sg_src, su_src, sl_src = xo_ref, sgo_ref, suo_ref, slo_ref
            zg_src, zu_src, zl_src = zgo_ref, zuo_ref, zlo_ref
            rpg_src, rpu_src, rpl_src = rpgo_ref, rpuo_ref, rplo_ref
            scal_src = scalo_ref
        else:
            x_src, sg_src, su_src, sl_src = x_ref, sg_ref, su_ref, sl_ref
            zg_src, zu_src, zl_src = zg_ref, zu_ref, zl_ref
            rpg_src, rpu_src, rpl_src = rpg_ref, rpu_ref, rpl_ref
            scal_src = scal_ref

        x = x_src[...]
        sg, su, sl = sg_src[...], su_src[...], sl_src[...]
        zg, zu, zl = zg_src[...], zu_src[...], zl_src[...]
        q = q_ref[...]
        if pb_dims is not None:
            # P @ x from the resident blocks + diagonal tail (pad rows of x
            # are exactly zero: they never leave the zero init because the
            # Newton rhs is zero there, so no masking is needed).
            pbv = p_in[...]                              # (nb, d, d8, TB)
            xb = x[0:nbd].reshape(nb, d, TB)
            xbp = jnp.pad(xb, ((0, 0), (0, d8 - d), (0, 0)))
            pxb = jnp.sum(pbv * xbp[:, None, :, :], axis=2)
            px = jnp.concatenate(
                [pxb.reshape(nbd, TB),
                 pd_ref[pl.ds(nbd, n_pad - nbd), :] * x[nbd:]], axis=0)
        else:
            px = p_in[...]

        wg = jnp.where(mk_g, zg / sg, 0.0)
        wu = jnp.where(mk_n, zu / su, 0.0)
        wl = jnp.where(mk_n, zl / sl, 0.0)

        _MB = 16  # matvec row-chunk: bounds the (chunk, n_pad, TB) temporary

        if g_struct is not None:
            # Pair-structured matvecs on the row slabs: each constraint row
            # touches only its pair's two hu-wide vehicle blocks (plus the
            # slack column), so both directions run on ~2*hu of the n_pad
            # columns — ~2x fewer VPU element ops than the dense sweeps,
            # and the dense G never has to exist.
            def _pad_blk(vec_hu):            # (hu, TB) -> (hu8, TB)
                if hu8 == hu_s:
                    return vec_hu
                return jnp.pad(vec_hu, ((0, hu8 - hu_s), (0, 0)))

            def _blocks_of(vec_n):           # (>=nu, TB) -> per-vehicle list
                return [_pad_blk(vec_n[v * hu_s:(v + 1) * hu_s])
                        for v in range(n_veh_s)]

            def _slab_mv(slab, vblk):
                """sum_u slab[k, u] * v[u] -> (hp, TB); with lower_tri
                slabs, column group g contributes only rows k >= 8g, so
                the zero blocks are never multiplied (~60% of the sweep
                at hp=hu=20)."""
                if not lower_tri_s:
                    return jnp.sum(slab * vblk[None, :, :], axis=1)
                out = None
                for g in range(hu8 // 8):
                    k0 = 8 * g
                    if k0 >= hp_s:
                        break
                    # NB: single-dim slices and None-insertion as separate
                    # indexing ops — combined forms lower to gathers,
                    # which Mosaic rejects.
                    ssub = slab[k0:]
                    ssub = ssub[:, g * 8:(g + 1) * 8]
                    vsub = vblk[g * 8:(g + 1) * 8]
                    part = jnp.sum(ssub * vsub[None, :, :], axis=1)
                    if out is None:
                        out = part
                    else:
                        out = jnp.concatenate(
                            [out[:k0], out[k0:] + part], axis=0)
                return out

            def _slab_tmv(slab, vm):
                """sum_k slab[k, u] * v[k] -> (hu8, TB); with lower_tri
                slabs, column group g sums only k >= 8g."""
                if not lower_tri_s:
                    return jnp.sum(slab * vm, axis=0)
                parts = []
                for g in range(hu8 // 8):
                    k0 = 8 * g
                    if k0 >= hp_s:
                        parts.append(jnp.zeros((8, TB), jnp.float32))
                        continue
                    ssub = slab[k0:]
                    ssub = ssub[:, g * 8:(g + 1) * 8]
                    parts.append(jnp.sum(ssub * vm[k0:], axis=0))
                return jnp.concatenate(parts, axis=0)

            def gmv(vec_n):
                vb = _blocks_of(vec_n)
                parts = []
                for p, (i, j) in enumerate(pairs_s):
                    parts.append(_slab_mv(gi_ref[p], vb[i])
                                 + _slab_mv(gj_ref[p], vb[j]))
                for o, v in enumerate(obst_veh):
                    parts.append(_slab_mv(gob_ref[o], vb[v]))
                if mg_pad > mg:
                    parts.append(jnp.zeros((mg_pad - mg, TB), jnp.float32))
                out = jnp.concatenate(parts, axis=0)
                return out + gsl_ref[...] * vec_n[nu][None, :]

            def _cat_blocks(contrib, slack_row):
                """Assemble an (n_pad, TB) vector from per-vehicle
                contribution lists + the slack row — pure concatenation
                (vehicle blocks tile [0, nu) contiguously), since Mosaic
                lowers neither scatter-add nor value dynamic_slice."""
                zero_v = jnp.zeros((hu_s, TB), jnp.float32)
                blks = [sum(c[1:], start=c[0]) if c else zero_v
                        for c in contrib]
                parts = blks + [slack_row[None, :]]
                if n_pad > n:
                    parts.append(jnp.zeros((n_pad - n, TB), jnp.float32))
                return jnp.concatenate(parts, axis=0)

            def gtmv(vec_m):
                contrib = [[] for _ in range(n_veh_s)]
                for p, (i, j) in enumerate(pairs_s):
                    vm = vec_m[p * hp_s:(p + 1) * hp_s][:, None, :]
                    contrib[i].append(_slab_tmv(gi_ref[p], vm)[:hu_s])
                    contrib[j].append(_slab_tmv(gj_ref[p], vm)[:hu_s])
                ob = P_s * hp_s
                for o, v in enumerate(obst_veh):
                    vm = vec_m[ob + o * hp_s:
                               ob + (o + 1) * hp_s][:, None, :]
                    contrib[v].append(_slab_tmv(gob_ref[o], vm)[:hu_s])
                return _cat_blocks(
                    contrib, jnp.sum(gsl_ref[...] * vec_m, axis=0))
        else:
            def gmv(vec_n):
                """(n_pad, TB) -> (mg_pad, TB): G @ v per lane, chunked so
                the elementwise product temporary stays small."""
                parts = []
                for j in range(mg_pad // _MB):
                    blk = gv_ref[pl.ds(j * _MB, _MB), :, :]
                    parts.append(jnp.sum(blk * vec_n[None, :, :], axis=1))
                return jnp.concatenate(parts, axis=0)

            def gtmv(vec_m):
                """(mg_pad, TB) -> (n_pad, TB): G^T v per lane, chunked."""
                acc = jnp.zeros((n_pad, TB), jnp.float32)
                for j in range(mg_pad // _MB):
                    blk = gv_ref[pl.ds(j * _MB, _MB), :, :]
                    sub = vec_m[j * _MB:(j + 1) * _MB]
                    acc = acc + jnp.sum(blk * sub[:, None, :], axis=0)
                return acc

        # rp maintained by the exact (1 - alpha) recurrence: recomputing
        # G x + s - h in f32 leaves ~1e-7 noise that active-row barrier
        # weights (z/s up to 1e10) amplify into the Newton rhs — see
        # scp_tpu/solvers/qp.py.
        rp_g = jnp.where(mk_g, rpg_src[...], 0.0)
        rp_u = jnp.where(mk_n, rpu_src[...], 0.0)
        rp_l = jnp.where(mk_n, rpl_src[...], 0.0)
        mu = (jnp.sum(jnp.where(mk_g, sg * zg, 0.0), axis=0)
              + jnp.sum(jnp.where(mk_n, su * zu + sl * zl, 0.0), axis=0)) \
            / m_true                                     # (TB,)

        # K arrives as pure P + G^T W_g G: the box diagonal, the Jacobi
        # scaling to unit diagonal, and the relative regularization are all
        # applied here in one chunked VMEM pass. The scaling is essential
        # in f32: the raw K mixes O(1) rows with O(1/mu) barrier rows and
        # the factorization's trailing updates destroy the small rows
        # (see scp_tpu/solvers/qp.py::factor). diag(K) is computed
        # analytically from G so it is ready before the K DMA lands.
        if g_struct is not None:
            # analytic diag of G^T W G from the slabs; the w-scaled slabs
            # are kept for the in-VMEM K formation below.
            def _sq_tri(ws, s):
                """sum_k ws[k, u] * s[k, u] -> (hu8, TB); column group g of
                lower_tri slabs sums only k >= 8g."""
                if not lower_tri_s:
                    return jnp.sum(ws * s, axis=0)
                parts = []
                for g in range(hu8 // 8):
                    k0 = 8 * g
                    if k0 >= hp_s:
                        parts.append(jnp.zeros((8, TB), jnp.float32))
                        continue
                    wsub = ws[k0:]
                    wsub = wsub[:, g * 8:(g + 1) * 8]
                    ssub = s[k0:]
                    ssub = ssub[:, g * 8:(g + 1) * 8]
                    parts.append(jnp.sum(wsub * ssub, axis=0))
                return jnp.concatenate(parts, axis=0)

            wgi_l, wgj_l, wgo_l = [], [], []
            sq_contrib = [[] for _ in range(n_veh_s)]
            for p, (i, j) in enumerate(pairs_s):
                wp = wg[p * hp_s:(p + 1) * hp_s][:, None, :]
                wgi = gi_ref[p] * wp
                wgj = gj_ref[p] * wp
                wgi_l.append(wgi)
                wgj_l.append(wgj)
                sq_contrib[i].append(_sq_tri(wgi, gi_ref[p])[:hu_s])
                sq_contrib[j].append(_sq_tri(wgj, gj_ref[p])[:hu_s])
            ob0 = P_s * hp_s
            for o, v in enumerate(obst_veh):
                wp = wg[ob0 + o * hp_s:ob0 + (o + 1) * hp_s][:, None, :]
                wgo = gob_ref[o] * wp
                wgo_l.append(wgo)
                sq_contrib[v].append(_sq_tri(wgo, gob_ref[o])[:hu_s])
            gsl_v = gsl_ref[...]
            gsq = _cat_blocks(sq_contrib,
                              jnp.sum(wg * gsl_v * gsl_v, axis=0))
        else:
            gsq = jnp.zeros((n_pad, TB), jnp.float32)
            for j in range(mg_pad // 16):
                blk = gv_ref[pl.ds(j * 16, 16), :, :]
                wsub = wg[j * 16:(j + 1) * 16]
                gsq = gsq + jnp.sum(blk * blk * wsub[:, None, :], axis=0)
        dbox = jnp.where(mk_n, zu / su + zl / sl, 0.0)
        dk = pd_ref[...] + gsq + dbox                    # (n_pad, TB)
        dsc = jax.lax.rsqrt(jnp.maximum(dk, 1e-30))

        if schur_slack:
            # Scaled border column of the eliminated slack: the slack's P
            # row is zero, so its KKT column is pure G^T W g_slack; the
            # analytic diagonal dk[nu] IS its exact diagonal, so after the
            # Jacobi scaling kappa~ = 1 (+ the same regularization as every
            # other diagonal). Eliminate: Ks = K~uu - kb kb^T / kappa~.
            gslack = (gv_ref[:, nu, :] if g_struct is None
                      else gsl_ref[...])                     # (mg_pad, TB)
            kuw = gtmv(wg * gslack)                          # (n_pad, TB)
            kb = (dsc * kuw * dsc[nu][None, :])[:nu]         # (nu, TB)
            inv_kappa = 1.0 / (1.0 + reg_rel)
            kbk = inv_kappa * kb
        # ONE unmasked pass over K: Jacobi scale (and, with schur_slack,
        # the fused border elimination), reading the pipelined input block
        # and writing the factor scratch. The diagonal needs the box terms
        # + regularization, but its post-scale value is ANALYTIC —
        # dk * dsc^2 + reg = 1 + reg (minus the border term) — so instead
        # of iota/select masks in the full-K pass (and a second full-K
        # pass for the Schur update), the diagonal is overwritten in a
        # cheap 8x8-block sweep below.
        if g_struct is not None:
            # In-VMEM pair-block K formation: the scaled KKT matrix is
            # assembled block-wise from the resident slabs via VPU
            # outer-product accumulation — the dense XLA dot (which
            # multiplies mostly zeros), its (B, n, n) -> (n, n, B) layout
            # transpose, and the K HBM round trip all disappear. Only the
            # LOWER triangle is written (the factor reads nothing else);
            # the Jacobi scaling and the Schur border fold into the block
            # math. Off-diagonal block (i < j): kernel layout
            # kv[i-block major, j-block sublane] = K[jblk + a, iblk + c].
            dscb = _blocks_of(dsc)
            kbp = jnp.pad(kb, ((0, n_pad - nu), (0, 0)))
            kbb = _blocks_of(kbp)
            kbkb = _blocks_of(inv_kappa * kbp)

            def outer_sum(a_slab, b_slab):
                # (hp, hu8, TB) x2 -> (hu8, hu8, TB):
                # out[c, a, :] = sum_k a_slab[k, c, :] * b_slab[k, a, :]
                if not lower_tri_s:
                    acc = a_slab[0][:, None, :] * b_slab[0][None, :, :]
                    for k in range(1, hp_s):
                        acc = acc + (a_slab[k][:, None, :]
                                     * b_slab[k][None, :, :])
                    return acc
                # lower-triangular slabs (slab[k, u] = 0 for u > k): the
                # 8-sublane output block (cg, ag) only sees
                # k >= 8*max(cg, ag) — 76 of 180 block-FMA sweeps at
                # hp=hu=20, and the blocks below the k0 cut are exact
                # zeros, not approximations.
                gs = hu8 // 8
                zero8 = jnp.zeros((8, 8, TB), jnp.float32)
                rows = []
                for cg in range(gs):
                    row = []
                    for ag in range(gs):
                        k0 = 8 * max(cg, ag)
                        if k0 >= hp_s:
                            row.append(zero8)
                            continue
                        a_blk = a_slab[:, cg * 8:(cg + 1) * 8, :]
                        b_blk = b_slab[:, ag * 8:(ag + 1) * 8, :]
                        acc = a_blk[k0][:, None, :] * b_blk[k0][None, :, :]
                        for k in range(k0 + 1, hp_s):
                            acc = acc + (a_blk[k][:, None, :]
                                         * b_blk[k][None, :, :])
                        row.append(acc)
                    rows.append(jnp.concatenate(row, axis=1))
                return jnp.concatenate(rows, axis=0)

            diag_acc = [None] * n_veh_s

            def _dadd(v, blk):
                diag_acc[v] = blk if diag_acc[v] is None \
                    else diag_acc[v] + blk

            zero_blk = jnp.zeros((hu_s, hu_s, TB), jnp.float32)
            for p, (i, j) in enumerate(pairs_s):
                A_i = gi_ref[p] * dscb[i][None, :, :]
                A_j = gj_ref[p] * dscb[j][None, :, :]
                wA_i = wgi_l[p] * dscb[i][None, :, :]
                wA_j = wgj_l[p] * dscb[j][None, :, :]
                blk = outer_sum(wA_i, A_j) \
                    - kbkb[i][:, None, :] * kbb[j][None, :, :]
                kv_ref[pl.ds(i * hu_s, hu_s), pl.ds(j * hu_s, hu_s), :] = \
                    blk[:hu_s, :hu_s, :]
                # keep the never-read upper-triangle mirror finite (VMEM
                # scratch is uninitialized; the factor's trailing updates
                # touch it arithmetically)
                kv_ref[pl.ds(j * hu_s, hu_s), pl.ds(i * hu_s, hu_s), :] = \
                    zero_blk
                _dadd(i, outer_sum(wA_i, A_i))
                _dadd(j, outer_sum(wA_j, A_j))
            for i, j in missing_pairs_s:
                # un-constrained vehicle pair (masked topology or ghost
                # alignment vehicle): the G contribution is exactly zero,
                # but the Schur border term still applies and the VMEM
                # scratch must not stay uninitialized.
                blk = -(kbkb[i][:, None, :] * kbb[j][None, :, :])
                kv_ref[pl.ds(i * hu_s, hu_s), pl.ds(j * hu_s, hu_s), :] = \
                    blk[:hu_s, :hu_s, :]
                kv_ref[pl.ds(j * hu_s, hu_s), pl.ds(i * hu_s, hu_s), :] = \
                    zero_blk
            for o, v in enumerate(obst_veh):
                A_v = gob_ref[o] * dscb[v][None, :, :]
                wA_v = wgo_l[o] * dscb[v][None, :, :]
                _dadd(v, outer_sum(wA_v, A_v))
            for v in range(n_veh_s):
                dvs = dscb[v][:hu_s]
                # NB: keep slice and None-insertion as separate indexing
                # ops — a combined [:hu_s, None, :] lowers to a gather,
                # which Mosaic rejects.
                border8 = kbkb[v][:, None, :] * kbb[v][None, :, :]
                acc = zero_blk if diag_acc[v] is None \
                    else diag_acc[v][:hu_s, :hu_s, :]
                acc = acc + pbv[v][:, :d, :] \
                    * (dvs[:, None, :] * dvs[None, :, :])
                acc = acc - border8[:hu_s, :hu_s, :]
                kv_ref[pl.ds(v * hu_s, hu_s), pl.ds(v * hu_s, hu_s), :] = acc
        else:
            dsc_k = dsc[:ks]
            for cs in range(0, ks, _CHUNK):
                cw = min(_CHUNK, ks - cs)
                blk = k_in[pl.ds(cs, cw), :, :]
                scaled = blk * (dsc[cs:cs + cw][:, None, :]
                                * dsc_k[None, :, :])
                if schur_slack:
                    scaled = scaled - (kbk[cs:cs + cw][:, None, :]
                                       * kb[None, :, :])
                kv_ref[pl.ds(cs, cw), :, :] = scaled
            if pb_dims is not None:
                # K arrived as the bare G^T W_g G product: add the
                # (symmetric) P blocks — post-scale, scaled the same way.
                for vb in range(nb):
                    o = vb * d
                    psc = dsc[o:o + d]
                    kv_ref[pl.ds(o, d), pl.ds(o, d), :] = (
                        kv_ref[pl.ds(o, d), pl.ds(o, d), :]
                        + pbv[vb][:, :d, :]
                        * (psc[:, None, :] * psc[None, :, :]))
        dmask = (jax.lax.broadcasted_iota(
            jnp.int32, (_SUBLANE, _SUBLANE, 1), 0)
            == jax.lax.broadcasted_iota(
                jnp.int32, (_SUBLANE, _SUBLANE, 1), 1))
        one_reg = jnp.float32(1.0 + reg_rel)
        for base in range(0, ks, _SUBLANE):
            dval = jnp.full((_SUBLANE, TB), one_reg)
            if schur_slack:
                dval = dval - (kbk[base:base + _SUBLANE]
                               * kb[base:base + _SUBLANE])
            dblk = kv_ref[pl.ds(base, _SUBLANE), pl.ds(base, _SUBLANE), :]
            kv_ref[pl.ds(base, _SUBLANE), pl.ds(base, _SUBLANE), :] = \
                jnp.where(dmask, dval[:, None, :], dblk)
        _factor_in_place(kv_ref, ks)

        def solve_kkt(rhs):
            """dx = K^-1 rhs through the Jacobi scaling (and, with
            schur_slack, the bordered back-substitution for the slack)."""
            rt = dsc * rhs
            if not schur_slack:
                return dsc * _fwd_bwd_solve(kv_ref, rt, y_ref, n_pad)
            rw = rt[nu]                                      # (TB,)
            ru = rt - jnp.pad(kb, ((0, n_pad - nu), (0, 0))) \
                * (inv_kappa * rw)[None, :]
            y = _fwd_bwd_solve(kv_ref, ru, y_ref, nu)
            xw = (rw - jnp.sum(kb * y[:nu], axis=0)) * inv_kappa
            xt = jnp.where(nrow == nu, xw[None, :],
                           jnp.where(nrow < nu, y, 0.0))
            return dsc * xt

        # rd + box parts of Ghat^T, shared by both solves:
        # rhs = -(px + q + G^T(zg + tg) + (zu + tu) - (zl + tl))
        def newton(tg, tu, tl):
            rhs = -(px + q + gtmv(zg + tg) + (zu + tu) - (zl + tl))
            dx = solve_kkt(rhs)
            gdx = gmv(dx)
            return dx, gdx

        def steplen(v, dv, mask):
            ratio = jnp.where(mask & (dv < 0),
                              -v / jnp.where(dv < 0, dv, -1.0), inf)
            return jnp.minimum(1.0, 0.99 * jnp.min(ratio, axis=0))

        # ---- predictor: rc = s*z => rc/s = z => t = w*rp - z ----
        dx_a, gdx_a = newton(wg * rp_g - zg, wu * rp_u - zu, wl * rp_l - zl)
        dzg_a = jnp.where(mk_g, wg * (gdx_a + rp_g) - zg, 0.0)
        dzu_a = jnp.where(mk_n, wu * (dx_a + rp_u) - zu, 0.0)
        dzl_a = jnp.where(mk_n, wl * (-dx_a + rp_l) - zl, 0.0)
        dsg_a = jnp.where(mk_g, -sg - sg * dzg_a / zg, 0.0)
        dsu_a = jnp.where(mk_n, -su - su * dzu_a / zu, 0.0)
        dsl_a = jnp.where(mk_n, -sl - sl * dzl_a / zl, 0.0)
        a_p = jnp.minimum(steplen(sg, dsg_a, mk_g),
                          jnp.minimum(steplen(su, dsu_a, mk_n),
                                      steplen(sl, dsl_a, mk_n)))
        a_d = jnp.minimum(steplen(zg, dzg_a, mk_g),
                          jnp.minimum(steplen(zu, dzu_a, mk_n),
                                      steplen(zl, dzl_a, mk_n)))
        mu_aff = (jnp.sum(jnp.where(
            mk_g, (sg + a_p * dsg_a) * (zg + a_d * dzg_a), 0.0), axis=0)
            + jnp.sum(jnp.where(
                mk_n, (su + a_p * dsu_a) * (zu + a_d * dzu_a)
                + (sl + a_p * dsl_a) * (zl + a_d * dzl_a), 0.0), axis=0)) \
            / m_true
        sigma = (mu_aff / jnp.maximum(mu, 1e-30)) ** 3
        smu = (sigma * mu)[None, :]

        # ---- corrector: rc = s*z + ds_a*dz_a - sigma*mu ----
        rcg = sg * zg + dsg_a * dzg_a - smu
        rcu = su * zu + dsu_a * dzu_a - smu
        rcl = sl * zl + dsl_a * dzl_a - smu
        dx, gdx = newton(wg * rp_g - rcg / sg,
                         wu * rp_u - rcu / su,
                         wl * rp_l - rcl / sl)
        dzg = jnp.where(mk_g, wg * (gdx + rp_g) - rcg / sg, 0.0)
        dzu = jnp.where(mk_n, wu * (dx + rp_u) - rcu / su, 0.0)
        dzl = jnp.where(mk_n, wl * (-dx + rp_l) - rcl / sl, 0.0)
        dsg = jnp.where(mk_g, -(rcg + sg * dzg) / zg, 0.0)
        dsu = jnp.where(mk_n, -(rcu + su * dzu) / zu, 0.0)
        dsl = jnp.where(mk_n, -(rcl + sl * dzl) / zl, 0.0)
        a_p = jnp.minimum(steplen(sg, dsg, mk_g),
                          jnp.minimum(steplen(su, dsu, mk_n),
                                      steplen(sl, dsl, mk_n)))
        a_d = jnp.minimum(steplen(zg, dzg, mk_g),
                          jnp.minimum(steplen(zu, dzu, mk_n),
                                      steplen(zl, dzl, mk_n)))
        alpha = jnp.minimum(a_p, a_d)[None, :]

        # ---- Gondzio multiple centrality correctors (n_cor extra
        # backsolves on the SAME factor): push the complementarity products
        # of an enlarged trial step into [0.1, 10] * (sigma mu), solve the
        # delta system (zero primal/dual residuals), and accept per lane
        # only where the combined step length actually grows. Lets the
        # caller trade factorizations for backsolves (factor ~2x a solve).
        for _ in range(n_cor):
            at = jnp.minimum(alpha + 0.1, 1.0)
            vg = (sg + at * dsg) * (zg + at * dzg)
            vu = (su + at * dsu) * (zu + at * dzu)
            vl = (sl + at * dsl) * (zl + at * dzl)

            def drc(v):  # rc_c = v - clip(v): s dz + z ds = -rc_c
                return v - jnp.clip(v, 0.1 * smu, 10.0 * smu)

            drg_c, dru_c, drl_c = drc(vg), drc(vu), drc(vl)
            tg = jnp.where(mk_g, -drg_c / sg, 0.0)
            tu = jnp.where(mk_n, -dru_c / su, 0.0)
            tl = jnp.where(mk_n, -drl_c / sl, 0.0)
            rhs_c = -(gtmv(tg) + tu - tl)
            dxc = solve_kkt(rhs_c)
            gdxc = gmv(dxc)
            dzg_c = jnp.where(mk_g, wg * gdxc + tg, 0.0)
            dzu_c = jnp.where(mk_n, wu * dxc + tu, 0.0)
            dzl_c = jnp.where(mk_n, -wl * dxc + tl, 0.0)
            dsg_c = jnp.where(mk_g, -(drg_c + sg * dzg_c) / zg, 0.0)
            dsu_c = jnp.where(mk_n, -(dru_c + su * dzu_c) / zu, 0.0)
            dsl_c = jnp.where(mk_n, -(drl_c + sl * dzl_c) / zl, 0.0)
            dx2, gdx2 = dx + dxc, gdx + gdxc
            dzg2, dzu2, dzl2 = dzg + dzg_c, dzu + dzu_c, dzl + dzl_c
            dsg2, dsu2, dsl2 = dsg + dsg_c, dsu + dsu_c, dsl + dsl_c
            a_p2 = jnp.minimum(steplen(sg, dsg2, mk_g),
                               jnp.minimum(steplen(su, dsu2, mk_n),
                                           steplen(sl, dsl2, mk_n)))
            a_d2 = jnp.minimum(steplen(zg, dzg2, mk_g),
                               jnp.minimum(steplen(zl, dzl2, mk_n),
                                           steplen(zu, dzu2, mk_n)))
            alpha2 = jnp.minimum(a_p2, a_d2)[None, :]
            acc = alpha2 >= alpha + 0.01
            dx = jnp.where(acc, dx2, dx)
            gdx = jnp.where(acc, gdx2, gdx)
            dzg = jnp.where(acc, dzg2, dzg)
            dzu = jnp.where(acc, dzu2, dzu)
            dzl = jnp.where(acc, dzl2, dzl)
            dsg = jnp.where(acc, dsg2, dsg)
            dsu = jnp.where(acc, dsu2, dsu)
            dsl = jnp.where(acc, dsl2, dsl)
            alpha = jnp.where(acc, alpha2, alpha)

        x_n = x + alpha * dx
        sg_n, su_n, sl_n = sg + alpha * dsg, su + alpha * dsu, sl + alpha * dsl
        zg_n, zu_n, zl_n = zg + alpha * dzg, zu + alpha * dzu, zl + alpha * dzl

        ok = (jnp.all(jnp.isfinite(x_n), axis=0)
              & jnp.all(jnp.isfinite(sg_n) & jnp.isfinite(zg_n), axis=0)
              & jnp.all(jnp.isfinite(su_n) & jnp.isfinite(zu_n)
                        & jnp.isfinite(sl_n) & jnp.isfinite(zl_n), axis=0))

        # freeze-on-stall (matches solve_qp's fori body)
        mu_prev = scal_src[0, :]
        frozen = scal_src[1, :] > 0.5
        stalled = (mu > 0.7 * mu_prev) & (mu < tol * 1e3)
        converged = mu < tol
        new_frozen = frozen | stalled | converged | ~ok
        keep = ~new_frozen
        kb = keep[None, :]

        shrink = (1.0 - alpha)
        xo_ref[...] = jnp.where(kb, x_n, x)
        sgo_ref[...] = jnp.where(kb, sg_n, sg)
        suo_ref[...] = jnp.where(kb, su_n, su)
        slo_ref[...] = jnp.where(kb, sl_n, sl)
        zgo_ref[...] = jnp.where(kb, zg_n, zg)
        zuo_ref[...] = jnp.where(kb, zu_n, zu)
        zlo_ref[...] = jnp.where(kb, zl_n, zl)
        rpgo_ref[...] = jnp.where(kb, shrink * rp_g, rp_g)
        rpuo_ref[...] = jnp.where(kb, shrink * rp_u, rp_u)
        rplo_ref[...] = jnp.where(kb, shrink * rp_l, rp_l)
        scalo_ref[0, :] = mu
        scalo_ref[1, :] = jnp.where(new_frozen, 1.0, 0.0)
        scalo_ref[2:, :] = jnp.zeros((_SUBLANE - 2, TB), jnp.float32)

    return kernel, mg_pad, n_pad


def ipm_iterate_lane(K_lane, G_lane, px, q, pdiag,
                     x, sg, su, sl, zg, zu, zl, rpg, rpu, rpl, scal,
                     *, mg: int, n: int, m_true: int, tol: float,
                     reg_rel: float = 3e-6, pb=None, n_cor: int = 0,
                     schur_slack: bool = False):
    """One fused Mehrotra iteration over the whole batch.

    K_lane: (n_pad, n_pad, B) pre-formed+regularized KKT (kernel layout,
    unit diagonal on the pad block); G_lane: (mg_pad, n_pad, B); all vectors
    (rows, B) lane layout with benign padding; scal: (8, B) lane scalars
    [mu_prev, frozen, ...]. Returns the updated (x, sg, su, sl, zg, zu, zl,
    scal).

    ``pb``: optional (nb, d, d, B) block-diagonal P statement. When given,
    pass ``px=None`` and ``K_lane`` as the bare ``G^T W_g G`` product: the
    kernel adds the P blocks (+ the diagonal tail from ``pdiag``) in VMEM
    and computes ``P @ x`` itself (see ``make_ipm_iter_kernel``).

    ``schur_slack``: variable n-1 is a slack with zero P row/col; pass
    ``K_lane`` as the (nu, nu, B) non-slack block only — the kernel forms
    the slack border itself and factors nu columns (see
    ``make_ipm_iter_kernel``)."""
    ks, _, B = K_lane.shape
    n_pad = pad_dim(n)
    mg_pad = G_lane.shape[0]
    pb_dims = None if pb is None else pb.shape[:2]
    kernel, _, _ = make_ipm_iter_kernel(mg, n, m_true, tol, reg_rel,
                                        pb_dims=pb_dims, n_cor=n_cor,
                                        schur_slack=schur_slack)
    assert ks == (n - 1 if schur_slack else n_pad), (ks, n, schur_slack)
    vec_m = pl.BlockSpec((mg_pad, TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    vec_n = pl.BlockSpec((n_pad, TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    vec_s = pl.BlockSpec((_SUBLANE, TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    f32 = jnp.float32
    if pb is None:
        p_spec, p_arg = vec_n, px                    # px vector input
    else:
        assert px is None
        nb, d = pb_dims
        d8 = _pad_to(d, _SUBLANE)
        pb = jnp.pad(pb, ((0, 0), (0, 0), (0, d8 - d), (0, 0)))
        p_spec = pl.BlockSpec((nb, d, d8, TB), lambda i: (0, 0, 0, i),
                              memory_space=pltpu.VMEM)
        p_arg = pb
    outs = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((ks, ks, TB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),   # K (pipelined)
            pl.BlockSpec((mg_pad, n_pad, TB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),   # G (pipelined)
            p_spec, vec_n, vec_n,                    # px|pb, q, pdiag
            vec_n, vec_m, vec_n, vec_n,              # x, sg, su, sl
            vec_m, vec_n, vec_n,                     # zg, zu, zl
            vec_m, vec_n, vec_n,                     # rpg, rpu, rpl
            vec_s,                                   # scal
        ],
        out_specs=[vec_n, vec_m, vec_n, vec_n, vec_m, vec_n, vec_n,
                   vec_m, vec_n, vec_n, vec_s],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, B), f32),
            jax.ShapeDtypeStruct((mg_pad, B), f32),
            jax.ShapeDtypeStruct((n_pad, B), f32),
            jax.ShapeDtypeStruct((n_pad, B), f32),
            jax.ShapeDtypeStruct((mg_pad, B), f32),
            jax.ShapeDtypeStruct((n_pad, B), f32),
            jax.ShapeDtypeStruct((n_pad, B), f32),
            jax.ShapeDtypeStruct((mg_pad, B), f32),
            jax.ShapeDtypeStruct((n_pad, B), f32),
            jax.ShapeDtypeStruct((n_pad, B), f32),
            jax.ShapeDtypeStruct((_SUBLANE, B), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ks, ks, TB), f32),           # factor
            pltpu.VMEM((n_pad, TB), f32),            # solve scratch
        ],
    )(K_lane, G_lane, p_arg, q, pdiag,
      x, sg, su, sl, zg, zu, zl, rpg, rpu, rpl, scal)
    return outs


def ipm_iterate_lane_struct(gi, gj, gob, gsl, pb, q, pdiag,
                            x, sg, su, sl, zg, zu, zl, rpg, rpu, rpl, scal,
                            *, g_struct, mg: int, n: int, m_true: int,
                            tol: float, reg_rel: float = 3e-6,
                            n_cor: int = 0, n_iters: int = 1):
    """One fused Mehrotra iteration on the PAIR-STRUCTURED constraint rows.

    Instead of a pre-formed K and a dense lane-layout G, the kernel takes
    per-pair row slabs and forms the Jacobi-scaled KKT matrix itself in
    VMEM (see ``make_ipm_iter_kernel``'s ``g_struct``). Implies
    ``schur_slack`` and the block-diagonal P path.

    gi/gj: (P, hp, hu8, B) — rows ``p*hp + k`` restricted to the pair's
    two vehicle column blocks (sublane-padded hu -> hu8);
    gob: (VO, hp, hu8, B) obstacle slabs or None when there are none;
    gsl: (mg_pad, B) the equilibrated slack column (signed);
    pb: (nb, d, d8, B) block-diagonal P statement (required);
    vectors as in :func:`ipm_iterate_lane`.

    ``n_iters``: Mehrotra iterations per launch — a second (innermost)
    grid dimension revisits the same blocks, so slabs/P/state stay in
    VMEM across iterations (see ``make_ipm_iter_kernel``).
    """
    pairs_s, obst_veh, hp_s, hu_s, *_ = g_struct
    B = q.shape[1]
    n_pad = pad_dim(n)
    mg_pad = _pad_to(mg, _MV_MB)
    nb, dd = pb.shape[0], pb.shape[1]
    kernel, _, _ = make_ipm_iter_kernel(
        mg, n, m_true, tol, reg_rel, pb_dims=(nb, dd), n_cor=n_cor,
        schur_slack=True, g_struct=g_struct, n_iters=n_iters)
    hu8 = _pad_to(hu_s, _SUBLANE)
    d8 = _pad_to(dd, _SUBLANE)
    nu = n - 1
    f32 = jnp.float32
    vec_m = pl.BlockSpec((mg_pad, TB), lambda i, it: (0, i),
                         memory_space=pltpu.VMEM)
    vec_n = pl.BlockSpec((n_pad, TB), lambda i, it: (0, i),
                         memory_space=pltpu.VMEM)
    vec_s = pl.BlockSpec((_SUBLANE, TB), lambda i, it: (0, i),
                         memory_space=pltpu.VMEM)

    def slab_spec(p_count):
        return pl.BlockSpec((p_count, hp_s, hu8, TB),
                            lambda i, it: (0, 0, 0, i),
                            memory_space=pltpu.VMEM)

    pb = jnp.pad(pb, ((0, 0), (0, 0), (0, d8 - dd), (0, 0)))
    p_spec = pl.BlockSpec((nb, dd, d8, TB), lambda i, it: (0, 0, 0, i),
                          memory_space=pltpu.VMEM)
    in_specs = [slab_spec(len(pairs_s)), slab_spec(len(pairs_s))]
    args = [gi, gj]
    if obst_veh:
        in_specs.append(slab_spec(len(obst_veh)))
        args.append(gob)
    in_specs += [vec_m, p_spec, vec_n, vec_n,        # gsl, pb, q, pdiag
                 vec_n, vec_m, vec_n, vec_n,         # x, sg, su, sl
                 vec_m, vec_n, vec_n,                # zg, zu, zl
                 vec_m, vec_n, vec_n,                # rpg, rpu, rpl
                 vec_s]
    args += [gsl, pb, q, pdiag, x, sg, su, sl, zg, zu, zl,
             rpg, rpu, rpl, scal]
    return pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        grid=(B // TB, n_iters),
        in_specs=in_specs,
        out_specs=[vec_n, vec_m, vec_n, vec_n, vec_m, vec_n, vec_n,
                   vec_m, vec_n, vec_n, vec_s],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, B), f32),
            jax.ShapeDtypeStruct((mg_pad, B), f32),
            jax.ShapeDtypeStruct((n_pad, B), f32),
            jax.ShapeDtypeStruct((n_pad, B), f32),
            jax.ShapeDtypeStruct((mg_pad, B), f32),
            jax.ShapeDtypeStruct((n_pad, B), f32),
            jax.ShapeDtypeStruct((n_pad, B), f32),
            jax.ShapeDtypeStruct((mg_pad, B), f32),
            jax.ShapeDtypeStruct((n_pad, B), f32),
            jax.ShapeDtypeStruct((n_pad, B), f32),
            jax.ShapeDtypeStruct((_SUBLANE, B), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nu, nu, TB), f32),           # factor
            pltpu.VMEM((n_pad, TB), f32),            # solve scratch
        ],
    )(*args)
