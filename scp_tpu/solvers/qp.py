"""Batched dense primal-dual interior-point QP solver.

Solves  min_x  0.5 x^T P x + q^T x   s.t.  G x <= h,  lb <= x <= ub

replacing the reference's CVXPY+Gurobi call (SCP_controller.py:135-145) with a
fully jittable Mehrotra predictor-corrector method:

* the conic system is ``Ghat = [G; I; -I]`` (box bounds as rows), but the
  box rows are handled **implicitly**: their contribution to the condensed
  KKT matrix is exactly diagonal and their matvecs are copies, so the dense
  work touches only the ``G`` rows — in the SCP workload the box rows are
  ~60% of the system, so this halves the dominant m*n^2 contraction and the
  per-iteration Ghat matvec HBM traffic at bit-identical math;
* each Newton step solves the condensed normal equations
  ``(P + Ghat^T diag(z/s) Ghat) dx = rhs`` with one Cholesky factorization of
  an (n x n) matrix — n = nVeh*Hp + 1 slack, so batched ``cholesky`` +
  ``triangular_solve`` run on the MXU across thousands of scenario instances
  under ``vmap``;
* fixed iteration count with a convergence mask (no data-dependent shapes);
  under ``vmap`` the surrounding ``while_loop`` runs lockstep until every
  instance in the batch converges or the cap is hit;
* Ruiz-style row equilibration of ``Ghat`` plus cost scaling absorb the
  reference's ill-conditioned exact-penalty scaling (slack weight 1e5,
  curvature ~8e3 — SCP_controller.py:84,123).

All numerics are dtype-generic: float64 on CPU for golden tests, float32 on
TPU for speed.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from scp_tpu.ops import linalg


class BandedData(NamedTuple):
    """Stage-structured problem data for the banded (Riccati) KKT path.

    States the SAME QP the dense inputs describe, in multiple-shooting
    form (ops/riccati.py): per-vehicle discrete dynamics, the raw
    position-space coefficients of every constraint row
    (``constraints.linearize_ycoefs``), and the stage decomposition of the
    cost (``P == 2*blockdiag(B^T Q B + r I)`` => stage weights ``qy = 2q``
    per position, ``ru = 2r`` per input). The pair list is the canonical
    triu order (``constraints._static_pairs``) — the SCP row layout.
    Rows must act PURELY through the stage positions (true for the SCP's
    pair/obstacle rows; NOT for e.g. the side-selection rate rows).
    """
    a_blk: jax.Array   # (V, NX, NX) discrete A per vehicle
    b_blk: jax.Array   # (V, NX)     discrete B per vehicle
    y_pair: jax.Array  # (P, K, NY)  pair-row position coefficients
    y_obst: jax.Array  # (V, O, K, NY)
    qy: jax.Array      # (V, K) stage tracking weights (2q, 2q_final last)
    ru: jax.Array      # (V,)   stage input weights (2r)


class QPSolution(NamedTuple):
    x: jax.Array           # (n,) primal solution
    obj: jax.Array         # 0.5 x^T P x + q^T x (unscaled)
    iters: jax.Array       # iterations used
    converged: jax.Array   # bool
    gap: jax.Array         # final complementarity measure
    z: jax.Array           # (m + 2n,) duals for [G; I; -I] rows (unscaled)


def solve_qp(P, q, G, h, lb, ub, *, max_iter: int = 30, tol: float = 1e-8,
             x0=None, z0=None, fixed_iters: int | None = None,
             cheap_k: bool = False, refine_steps: int = 0,
             use_pallas: bool | None = None,
             correctors: int = 0,
             axis_name: str | None = None,
             mg_total: int | None = None,
             banded: BandedData | None = None) -> QPSolution:
    """Solve one QP instance. All inputs dense; vmap for batching.

    P: (n, n) PSD, q: (n,), G: (m, n), h: (m,), lb/ub: (n,).

    ``axis_name``: row-sharded SPMD mode for use inside ``shard_map`` — the
    TPU-native horizon-block parallelism of SURVEY.md §5. Each shard passes
    its own block of the G rows (its horizon block of the avoidance
    constraints; ``mg_total`` = global row count); the box rows [I; -I] are
    replicated on every shard and counted once. The dominant m*n^2 KKT
    formation then runs on m/n_shards rows per device and one ``psum``
    rebuilds the (replicated) condensed system; row reductions (mu, step
    lengths, residual norms) ride ``psum``/``pmin`` collectives, so every
    shard takes identical Newton steps and the iterate stays replicated.

    ``fixed_iters``: run exactly that many Mehrotra iterations with NO
    per-iteration convergence reductions (a ``fori_loop``). Under a big vmap
    the while-loop convergence checks cost reductions every round and the
    batch runs to the slowest instance anyway, so a calibrated fixed count
    (12-15 in f32) is faster at equal solution quality. The post-hoc
    certificate is still computed.

    ``cheap_k``: form the KKT matrix with the TPU's fast single-pass bf16
    matmul. The Newton direction becomes slightly inexact, but the residuals
    (which drive convergence) stay full-precision — classic inexact Newton.
    Saves the 6x multi-pass cost on the dominant m*n^2 contraction.
    """
    dtype = P.dtype
    n = q.shape[0]
    mg = h.shape[0]
    if axis_name is not None:
        assert mg_total is not None, "axis_name requires mg_total"
        assert not use_pallas, "row-sharded mode is XLA-only"
        use_pallas = False
    m = (mg_total if axis_name is not None else mg) + 2 * n

    def psum_rows(v):
        """Sum a G-row-axis contribution across shards (identity unsharded).
        Box-row contributions must be added OUTSIDE this — they are
        replicated, not sharded."""
        return jax.lax.psum(v, axis_name) if axis_name is not None else v

    def row_dot(a, b):
        """Global dot over [G-rows; box-rows] vectors in local layout."""
        return psum_rows(jnp.dot(a[:mg], b[:mg])) + jnp.dot(a[mg:], b[mg:])

    def row_norm_all(v):
        return jnp.sqrt(row_dot(v, v))

    # --- equilibration (box rows have exactly unit norm: untouched) ---
    row_norm = jnp.linalg.norm(G, axis=1)
    d_row = 1.0 / jnp.maximum(row_norm, 1e-10)
    G_s = G * d_row[:, None]
    hhat_s = jnp.concatenate([h * d_row, ub, -lb])
    cost_scale = 1.0 / jnp.maximum(jnp.max(jnp.abs(P)), 1.0)
    P_s = P * cost_scale
    q_s = q * cost_scale

    def ghat_mv(v):
        """[G_s; I; -I] @ v — box rows are copies, never materialized.

        Written as a rank-2 matmul: under vmap the (B,m,n)x(B,n,1) batched
        matmul lowers ~3x faster than the (B,m,n)x(B,n) dot_general."""
        gv = (G_s @ v[:, None])[:, 0]
        return jnp.concatenate([gv, v, -v])

    def ghat_tmv(v):
        """[G_s; I; -I]^T @ v."""
        return psum_rows((v[None, :mg] @ G_s)[0]) \
            + v[mg:mg + n] - v[mg + n:]

    def row_all(flag):
        """AND a per-shard bool across shards (shards must not diverge)."""
        if axis_name is None:
            return flag
        return jax.lax.psum(jnp.where(flag, 0, 1), axis_name) == 0

    # --- initial point ---
    if x0 is None:
        x = jnp.zeros((n,), dtype)
    else:
        x = jnp.clip(x0, lb, ub)
    # s from the initial residual, z = 1/s: every complementarity product
    # starts at 1, so mu_0 = 1 in equilibrated units no matter how wide the
    # bounds are (the reference passes a 1e25 slack upper bound,
    # SCP_controller.py:85 — a naive z = 1 init would start mu at ~1e23).
    resid = hhat_s - ghat_mv(x)
    s = jnp.maximum(resid, 1.0)
    z = 1.0 / s
    if z0 is not None:
        # dual warm start (e.g. from the previous SCP iteration's solve):
        # re-scale the caller's duals into equilibrated units and clip away
        # from the boundary/infinity so mu_0 stays moderate. Non-positive
        # entries mean "no information" and keep the cold init.
        z_w = z0 * cost_scale / jnp.concatenate(
            [d_row, jnp.ones((2 * n,), dtype)])
        z = jnp.where(z0 > 0, jnp.clip(z_w, 1e-3, 1e3), z)

    # Regularization relative to the KKT diagonal scale: f32 Cholesky on the
    # ill-conditioned late-stage KKT systems needs a proportionally larger
    # floor than f64.
    reg_rel = jnp.asarray(1e-12 if dtype == jnp.float64 else 3e-6, dtype)
    eye_n = jnp.eye(n, dtype=dtype)

    # HIGH = 3-pass bf16 (~2^-21 effective mantissa) is enough for the KKT
    # matrix: the Newton direction tolerates ~1e-6 relative error while the
    # residuals (computed at HIGHEST) drive convergence. Single-pass bf16
    # (cheap_k) was measured to break SCP convergence.
    k_precision = (jax.lax.Precision.DEFAULT if cheap_k
                   else jax.lax.Precision.HIGH)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from scp_tpu.ops import pallas_linalg
        chol_fn = pallas_linalg.cholesky
        solve_fn = pallas_linalg.cho_solve
        # Pre-pad the KKT system to the kernel-aligned size (identity on the
        # pad block): the batched kernels then skip their pad/slice copies
        # and the factor->solve layout transposes cancel under XLA.
        n_pad = pallas_linalg.pad_dim(n)
    else:
        chol_fn = linalg.blocked_cholesky
        solve_fn = linalg.blocked_cho_solve
        n_pad = n
    pad = n_pad - n

    def factor(s, z):
        """Cholesky of the Jacobi-scaled condensed KKT matrix — ONE
        factorization per IPM iteration, shared by the predictor and
        corrector solves.

        The raw K mixes O(1) rows (tracking curvature) with O(1/mu) rows
        (active-constraint barrier weights); an f32 Cholesky's trailing
        updates then destroy the small rows (absolute error ~eps*max|K|),
        leaving the primal stuck ~1e-2 off on flat-objective instances.
        Scaling to unit diagonal (D K D with D = diag(K)^-1/2) removes the
        scale disparity exactly; measured primal error drops to ~1e-8.
        The regularization becomes relative per-row (reg_rel on the unit
        diagonal)."""
        w = z / s
        # dense G rows on the MXU; the [I; -I] box rows contribute exactly
        # a diagonal, added without materializing them. Row-sharded mode:
        # each shard contributes its horizon block; psum rebuilds K.
        K = P_s + psum_rows(jnp.matmul(G_s.T * w[None, :mg], G_s,
                                       precision=k_precision))
        K = K + eye_n * (w[mg:mg + n] + w[mg + n:])[None, :]
        dsc = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(K), 1e-30))
        K = K * (dsc[:, None] * dsc[None, :]) + reg_rel * eye_n
        if pad:
            K = jnp.pad(K, ((0, pad), (0, pad)))
            diag = jnp.arange(n, n_pad)
            K = K.at[diag, diag].set(1.0)
        return chol_fn(K), dsc

    def tri_solve(L, dsc, rhs):
        # Pallas batched kernel on TPU; blocked recursion elsewhere (XLA's
        # TPU triangular_solve >64x64 exhausts scoped VMEM — see
        # scp_tpu/ops/linalg.py and ops/pallas_linalg.py).
        rhs = dsc * rhs
        if pad:
            return dsc * solve_fn(L, jnp.pad(rhs, (0, pad)))[:n]
        return dsc * solve_fn(L, rhs)

    if banded is not None:
        # ---- banded (Riccati) KKT: replace the dense O(n^3) factor with
        # the block-banded stage sweep (ops/riccati.py) — the SAME linear
        # system (K + reg*diag(K)) dx = rhs, solved through its
        # multiple-shooting form in O(K * (V*NX)^3). The slack column ω
        # is a dense border, eliminated by a 1x1 Schur complement (two
        # stage solves per factorization instead of one).
        assert axis_name is None, "banded KKT is not row-sharded"
        from scp_tpu.ops import constraints as con_mod
        from scp_tpu.ops import riccati as ric

        v_b = banded.a_blk.shape[0]
        nu = n - 1
        hu_st = nu // v_b
        assert v_b * hu_st == nu, (v_b, n)
        k_st = banded.y_obst.shape[2]
        assert k_st == hu_st, "banded path requires hp == hu"
        pairs_b = tuple(con_mod._static_pairs(v_b))
        assert banded.y_pair.shape[0] == len(pairs_b)
        pk_rows = len(pairs_b) * k_st
        Gu2 = G_s[:, :nu] ** 2                   # loop-invariant
        g_sl = G_s[:, nu]                        # slack column (scaled)

        def stagef(vec):                         # u-space (nu,) -> (K, V)
            return vec.reshape(v_b, hu_st).T

        def factor(s, z):
            w = z / s
            w_g = w[:mg]
            # equilibrated rows are d_row * raw rows: G^T W G =
            # sum (w d^2) c_raw c_raw^T on the position coefficients
            wd = w_g * d_row * d_row
            w_pair = wd[:pk_rows].reshape(len(pairs_b), k_st)
            w_ob = wd[pk_rows:].reshape(v_b, -1, k_st)
            hy = ric.build_hy(pairs_b, banded.y_pair, banded.y_obst,
                              w_pair, w_ob, banded.qy * cost_scale)
            dbox = w[mg:mg + n] + w[mg + n:]
            # dense-path equivalence: Jacobi scaling + reg on the unit
            # diagonal == solving (K + reg * diag(K)); diag(K) is a
            # u-space diagonal, i.e. a per-stage input-cost term
            diagK_u = jnp.diagonal(P_s)[:nu] + w_g @ Gu2 + dbox[:nu]
            hu_diag = (banded.ru * cost_scale)[None, :] \
                + stagef(dbox[:nu] + reg_rel * diagK_u)
            fac = ric.riccati_factor(banded.a_blk, banded.b_blk, hy,
                                     hu_diag)
            # slack border: K's last column restricted to u, and K_ww
            # (P's border entries are zero in the SCP shape by contract,
            # included here for generality)
            c_uw = (w_g * g_sl) @ G_s[:, :nu] + P_s[:nu, n - 1]
            k_ww = (jnp.dot(w_g * g_sl, g_sl) + dbox[n - 1]
                    + P_s[n - 1, n - 1]) * (1.0 + reg_rel)
            y2 = ric.riccati_solve(fac, banded.a_blk, banded.b_blk,
                                   stagef(c_uw))
            return (fac, c_uw, k_ww, y2.T.reshape(nu)), None

        def tri_solve(facB, _dsc, rhs):          # noqa: F811
            fac, c_uw, k_ww, y2 = facB
            y1 = ric.riccati_solve(fac, banded.a_blk, banded.b_blk,
                                   stagef(rhs[:nu])).T.reshape(nu)
            dw = (rhs[nu] - jnp.dot(c_uw, y1)) \
                / (k_ww - jnp.dot(c_uw, y2))
            return jnp.concatenate([y1 - dw * y2, dw[None]])

    def kkt_solve(L, dsc, s, z, rd, rp, rc):
        w = z / s
        rhs = -(rd + ghat_tmv(w * rp - rc / s))
        dx = tri_solve(L, dsc, rhs)
        if refine_steps > 0:
            # Iterative refinement against the EXACT K action (matvecs, not
            # the formed matrix).
            def k_action(v):
                gv = ghat_mv(v)
                return P_s @ v + ghat_tmv(w * gv)

            for _ in range(refine_steps):
                r2 = rhs - k_action(dx)
                dx = dx + tri_solve(L, dsc, r2)
        dz = w * (ghat_mv(dx) + rp) - rc / s
        ds = -(rc + s * dz) / z
        return dx, ds, dz

    def max_step(v, dv):
        # largest alpha in (0, 1] with v + alpha*dv >= (1 - 0.99)*... standard
        ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
        a = jnp.min(ratio)
        if axis_name is not None:
            # box rows are replicated on every shard, so the global row min
            # is just the pmin of each shard's local min.
            a = jax.lax.pmin(a, axis_name)
        return jnp.minimum(1.0, 0.99 * a)

    def iterate(x, s, z, rp):
        """One Mehrotra predictor-corrector step. Returns updated
        (x, s, z, rp) and the pre-step mu.

        ``rp`` is maintained by the EXACT recurrence rp <- (1 - alpha) * rp
        (the Newton primal row gives G dx + ds = -rp for both directions)
        instead of recomputation: recomputing ``G x + s - h`` in f32 leaves
        ~1e-7 absolute noise that the barrier weights w = z/s (1e10 on
        active rows) amplify into the Newton rhs, stalling the primal at
        ~1e-2 error on flat-objective instances. The recurrence drifts only
        by the per-iteration solve error (~1e-6), which the final
        certificate (recomputed honestly) still checks."""
        rd = P_s @ x + q_s + ghat_tmv(z)
        if dtype == jnp.float64:
            # f64 recomputes rp: its round-off (~1e-16) is harmless and a
            # fresh residual lets the endgame drive rd to ~1e-12, which the
            # golden-oracle tolerances rely on. The recurrence is the f32
            # remedy for w-amplified recomputation noise.
            rp = ghat_mv(x) + s - hhat_s
        mu = row_dot(s, z) / m

        L, dsc = factor(s, z)

        # predictor (affine)
        rc_aff = s * z
        dx_a, ds_a, dz_a = kkt_solve(L, dsc, s, z, rd, rp, rc_aff)
        alpha_p = max_step(s, ds_a)
        alpha_d = max_step(z, dz_a)
        mu_aff = row_dot(s + alpha_p * ds_a, z + alpha_d * dz_a) / m
        sigma = (mu_aff / jnp.maximum(mu, 1e-30)) ** 3

        # corrector
        rc = s * z + ds_a * dz_a - sigma * mu
        dx, ds, dz = kkt_solve(L, dsc, s, z, rd, rp, rc)
        alpha_p = max_step(s, ds)
        alpha_d = max_step(z, dz)
        alpha = jnp.minimum(alpha_p, alpha_d)

        # Gondzio multiple centrality correctors: extra backsolves on the
        # SAME factor that push the complementarity products of an enlarged
        # trial step into [0.1, 10]*(sigma mu); accepted only when the
        # combined step length actually grows (same recipe as the fused
        # kernel, pallas_linalg.make_ipm_iter_kernel).
        smu = sigma * mu
        zero_n = jnp.zeros_like(rd)
        zero_m = jnp.zeros_like(rp)
        for _ in range(correctors):
            at = jnp.minimum(alpha + 0.1, 1.0)
            v_t = (s + at * ds) * (z + at * dz)
            drc = v_t - jnp.clip(v_t, 0.1 * smu, 10.0 * smu)
            dx_c, ds_c, dz_c = kkt_solve(L, dsc, s, z, zero_n, zero_m, drc)
            dx2, ds2, dz2 = dx + dx_c, ds + ds_c, dz + dz_c
            alpha2 = jnp.minimum(max_step(s, ds2), max_step(z, dz2))
            acc = alpha2 >= alpha + 0.01
            dx = jnp.where(acc, dx2, dx)
            ds = jnp.where(acc, ds2, ds)
            dz = jnp.where(acc, dz2, dz)
            alpha = jnp.where(acc, alpha2, alpha)

        x_new = x + alpha * dx
        s_new = s + alpha * ds
        z_new = z + alpha * dz
        rp_new = (1.0 - alpha) * rp
        # NaN guard: a failed Cholesky (loss of positive definiteness in low
        # precision) poisons the step — keep the previous iterate and flag
        # convergence-by-stall instead of propagating NaNs. Row-sharded:
        # the flag must agree on every shard or the replicated iterate forks.
        ok = row_all(jnp.all(jnp.isfinite(x_new))
                     & jnp.all(jnp.isfinite(s_new))
                     & jnp.all(jnp.isfinite(z_new)))
        x = jnp.where(ok, x_new, x)
        s = jnp.where(ok, s_new, s)
        z = jnp.where(ok, z_new, z)
        rp = jnp.where(ok, rp_new, rp)
        return x, s, z, rp, mu, rd, ok

    rp0 = ghat_mv(x) + s - hhat_s

    # Fixed iteration count for lockstep speed, but with per-instance
    # freeze-on-stall: once mu stops improving at the f32 floor, further
    # Mehrotra steps can *corrupt* the iterate (observed: the 11-vehicle
    # parallel scenario drops from feasibility 1.0 to 0.5 without this).
    # The adaptive while-loop gets the same behavior for free from
    # vmap's select-on-stopped-lanes semantics.
    if fixed_iters is not None:
        def fori_body(_, state):
            x, s, z, rp, mu_prev, frozen = state
            x2, s2, z2, rp2, mu, rd, ok = iterate(x, s, z, rp)
            stalled = (mu > 0.7 * mu_prev) & (mu < tol * 1e3)
            converged = mu < tol
            new_frozen = frozen | stalled | converged | ~ok
            keep = ~new_frozen
            x = jnp.where(keep, x2, x)
            s = jnp.where(keep, s2, s)
            z = jnp.where(keep, z2, z)
            rp = jnp.where(keep, rp2, rp)
            return (x, s, z, rp, mu, new_frozen)

        big = jnp.asarray(jnp.finfo(dtype).max, dtype)
        x, s, z, _, _, _ = jax.lax.fori_loop(
            0, fixed_iters, fori_body,
            (x, s, z, rp0, big, jnp.array(False)))
        iters = jnp.array(fixed_iters)
    else:
        def body(state):
            x, s, z, rp, it, _ = state
            x, s, z, rp, mu, rd, ok = iterate(x, s, z, rp)
            mu_new = row_dot(s, z) / m
            converged_now = ((mu_new < tol)
                             & (row_norm_all(rp) / (1.0 + row_norm_all(hhat_s)) < tol * 10)
                             & (jnp.linalg.norm(rd) / (1.0 + jnp.linalg.norm(q_s)) < tol * 10))
            # Stall exit: in f32 the complementarity floor can sit above
            # ``tol``; once mu stops improving meaningfully below a loose
            # ceiling, further iterations only burn lockstep time for the
            # whole vmapped batch.
            stalled = (mu_new > 0.7 * mu) & (mu_new < tol * 1e3)
            stop = converged_now | stalled | ~ok
            return x, s, z, rp, it + 1, stop

        def cond(state):
            _, _, _, _, it, stop = state
            return (it < max_iter) & (~stop)

        x, s, z, _, iters, _ = jax.lax.while_loop(
            cond, body, (x, s, z, rp0, jnp.array(0), jnp.array(False)))

    # Honest post-hoc convergence certificate (stalls don't count).
    mu_f = row_dot(s, z) / m
    rp_f = row_norm_all(ghat_mv(x) + s - hhat_s)
    rd_f = jnp.linalg.norm(P_s @ x + q_s + ghat_tmv(z))
    conv = (mu_f < tol * 10) \
        & (rp_f / (1.0 + row_norm_all(hhat_s)) < tol * 100) \
        & (rd_f / (1.0 + jnp.linalg.norm(q_s)) < tol * 100)

    obj = 0.5 * jnp.dot(x, P @ x) + jnp.dot(q, x)
    gap = mu_f
    z_unscaled = jnp.concatenate([d_row * z[:mg], z[mg:]]) / cost_scale
    return QPSolution(x=x, obj=obj, iters=iters, converged=conv, gap=gap,
                      z=z_unscaled)


# Scoped-VMEM budget for the fused fixed-iteration kernels, calibrated to
# the measured compile boundaries (BENCHMARKS.md "VMEM ceiling"): estimates
# of 104.6M (16-veh circle hp=10) and 106.5M (parallel-11 hp=16 at a single
# tile) compile and run; 129.6M (parallel-11 hp=16, B>128) and 153.7M
# (4-veh circle hp=64) fail. The gate must sit between them.
_FUSED_VMEM_BUDGET = 115e6


def _ghost_alignment_cols(n: int, g_struct: tuple | None,
                          n_pblocks: int) -> int:
    """Ghost-vehicle alignment columns the struct path will insert for this
    shape (the ghost-padding block in :func:`solve_qp_batched`; 0 = none).
    Shared by the VMEM gate and the insertion itself so the gate always
    sees the POST-ghost factor width the kernel will actually compile with
    (ADVICE r4: a pre-ghost estimate can pass the gate yet OOM)."""
    if g_struct is None or not g_struct[0] or (n - 1) % 8 == 0:
        return 0
    hu_g = int(g_struct[3])
    v_g = (n - 1) // hu_g
    if v_g * hu_g != n - 1 or n_pblocks != v_g:
        return 0
    k_g = next((k for k in range(1, 9)
                if ((v_g + k) * hu_g) % 8 == 0), None)
    if k_g is None or k_g * hu_g > max(hu_g, (n - 1) // 4):
        return 0
    return k_g * hu_g


def _fused_vmem_bytes(b: int, mg: int, n: int,
                      g_struct: tuple | None) -> float:
    """Approximate per-tile VMEM footprint of the fused IPM kernel.

    Components: pipelined input blocks (double-buffered when the batch
    spans more than one 128-lane tile; Mosaic skips the second buffer for
    a single grid tile), the w-scaled slab copies the struct K formation
    keeps live, the factor scratch (x2 for the revisited output blocks),
    and ~24 (section, TB) state/scratch vectors. Calibrated against the
    measured compile boundaries, not derived from Mosaic's allocator;
    treat as a classifier with ~10% margin, not an accountant.
    """
    from scp_tpu.ops import pallas_linalg as pll

    tb = pll.TB
    buf = 2.0 if b > tb else 1.0
    mg_pad = pll._pad_to(mg, pll._MV_MB)
    n_pad = pll.pad_dim(n)
    vec = (mg_pad + 2 * n_pad) * tb * 4 * 24
    if g_struct is not None and g_struct[0]:
        pairs, obst, hp_s, hu_s, *_ = g_struct
        hu8 = pll._pad_to(int(hu_s), 8)
        slabs = (2 * len(pairs) + len(obst)) * int(hp_s) * hu8 * tb * 4
        ks = n - 1
        return buf * slabs + slabs + 2 * ks * ks * tb * 4 + vec
    g_b = mg_pad * n_pad * tb * 4
    return buf * g_b + 2 * n_pad * n_pad * tb * 4 + vec


def solve_qp_batched(P, q, G, h, lb, ub, *, max_iter: int = 30,
                     tol: float = 1e-8, x0=None, z0=None,
                     fixed_iters: int | None = None,
                     use_pallas: bool | None = None,
                     p_blocks=None, correctors: int = 0,
                     slack_schur: bool = False,
                     certificate: bool = True,
                     g_struct: tuple | None = None,
                     g_slabs: tuple | None = None,
                     g_slack_mask=None,
                     banded: BandedData | None = None,
                     kkt: str = "dense") -> QPSolution:
    """Natively-batched variant of :func:`solve_qp` (leading batch axis B).

    Same Mehrotra method, but the implementation controls memory layout
    explicitly instead of relying on ``vmap``: G and P are transposed to the
    Pallas lane layout ONCE per solve, the Cholesky factor stays in kernel
    layout end-to-end (``cholesky_lane``/``cho_solve_lane``), every vector
    lives as (dim, B) with the batch on the 128-wide lane axis, and the
    per-iteration matvecs run as lane-parallel VPU reductions
    (``gmv_lane``/``gtmv_lane``). vmapping :func:`solve_qp` instead leaves
    3 full-tensor layout transposes per IPM iteration plus 4-5x-off-SOL
    batched matvecs — measured ~1.5x slower end-to-end.

    ``p_blocks``: optional (B, nb, d, d) block-diagonal statement about P —
    ``P[b] == blockdiag(p_blocks[b, 0], .., p_blocks[b, nb-1], T)`` with the
    trailing (n - nb*d)-sized remainder ``T`` diagonal (read from P itself).
    The SCP cost is block-diagonal per vehicle plus a zero slack row, so the
    per-iteration dual-residual matvec P @ x touches ~6% of the dense bytes
    (the dense P is still used for the KKT formation and the objective).

    ``g_struct = (pairs, obst_veh, hp, hu)``: static statement that G's
    rows are PAIR-SPARSE in the SCP layout — row ``p*hp + k`` touches only
    the two hu-wide vehicle column blocks of ``pairs[p]``, obstacle row
    blocks touch one block each, and the final column is the slack. On the
    fused fixed-iteration path (with ``slack_schur`` active and
    ``p_blocks`` given) the kernel then takes per-pair row slabs and forms
    the Jacobi-scaled KKT matrix itself in VMEM — the dense per-iteration
    ``G^T W_g G`` MXU dot, its layout transpose, and the K HBM round trip
    (measured ~45% of the fused loop) all disappear. Ignored elsewhere.

    ``g_slack_mask`` (host array, (mg,)): per-row slack-coefficient mask
    for the slab path — 1.0 where the row carries the implicit ``-1``
    slack coefficient, 0.0 for HARD rows (e.g. the side-selection
    controller's steering-rate rows). None = all rows soft (the SCP
    shape). Ignored off the slab path (dense G carries its own column).

    ``g_slabs = (gi (B,P,K,U), gj (B,P,K,U), gob (B,V,O,K,U) OR flat
    (B,S,K,U) in ``g_struct`` obst_veh order)``: the same
    rows delivered directly as slabs (``constraints.linearize_slabs``,
    slack column NOT included — it is the implicit trailing ``-1``).
    HARD CONTRACT: every avoidance row's slack coefficient must be exactly
    ``G[:, :, -1] == -1`` (the SCP formulation guarantees it,
    scp.solve_scp_stacked's ``slack_col``). The slab equilibration below
    bakes that implicit -1 into each row norm (the ``+ 1.0``); a caller
    whose dense G carries any other slack column would get silently
    inconsistent scaling between the structured path and the dense
    fallbacks — different solves, not an error.
    When given together with an engaged ``g_struct``, the mostly-zero
    dense ``G`` argument is never read: equilibration, the setup and
    certificate matvecs, and the kernel inputs all come from the slabs,
    so XLA dead-code-eliminates the caller's dense scatter (~40 MB per
    SCP iteration at B=1024). ``G`` must still be passed for the
    fallback paths (which is free when unused).

    Off TPU this falls back to ``vmap(solve_qp)`` (bit-identical math either
    way, modulo float reduction order).
    """
    _lane_ok = (q.dtype == jnp.float32
                and (use_pallas or (use_pallas is None
                                    and jax.default_backend() == "tpu")))
    if use_pallas is not False and fixed_iters is not None:
        # VMEM-aware gate: the fused kernels hold their tile's working set
        # resident; shapes beyond the scoped-VMEM budget fail to COMPILE
        # (measured boundaries in BENCHMARKS.md "VMEM ceiling"). Estimate
        # the footprint and fall back to the XLA path instead of crashing.
        # The estimate runs at the POST-ghost shape the kernel compiles
        # with, and with the slab formula only when the struct path will
        # actually engage (a near-boundary shape needing ghost vehicles
        # otherwise passes on pre-ghost numbers and OOMs — ADVICE r4).
        n_gate = G.shape[2]
        struct_possible = (g_struct is not None and bool(g_struct[0])
                           and slack_schur and p_blocks is not None)
        if struct_possible:
            n_gate += _ghost_alignment_cols(
                G.shape[2], g_struct, p_blocks.shape[1])
        struct_engages = struct_possible and (n_gate - 1) % 8 == 0
        if _fused_vmem_bytes(G.shape[0], G.shape[1], n_gate,
                             g_struct if struct_engages else None
                             ) > _FUSED_VMEM_BUDGET:
            use_pallas = False
    # Banded-lane routing: with a banded statement and an f32 TPU (or
    # interpret-test) target, the lane implementation swaps its dense
    # factor for the fused Riccati sweeps (ops/pallas_riccati.py) while
    # keeping the natively-batched (dim, B) IPM algebra — measured faster
    # than routing through vmap(solve_qp, banded=...) whose per-instance
    # matvec layouts XLA lowers 4-5x off speed-of-light (BENCHMARKS.md).
    use_banded_lane = False
    if banded is not None and kkt == "banded":
        if _lane_ok:
            use_pallas = True
            use_banded_lane = True
        else:
            # CPU / f64: the vmapped per-instance Riccati scans
            use_pallas = False
    elif (banded is not None and kkt == "auto" and _lane_ok
          and use_pallas is False):
        # the VMEM gate just rejected the fused dense kernel: take the
        # banded lane path instead of the vmap fallback
        use_pallas = True
        use_banded_lane = True
    if P is None:
        # P may be omitted when ``p_blocks`` fully states it (blockdiag +
        # ZERO tail diagonal — the SCP/side-selection shape, where the only
        # tail variable is the penalty slack with zero P row): the hot TPU
        # paths then never materialize the dense (B, n, n) P at all. The
        # dense fallbacks reconstruct it below.
        assert p_blocks is not None, "P=None requires p_blocks"
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if P is None and (not use_pallas or fixed_iters is None):
        # dense fallback / adaptive-path reconstruction (those paths read
        # the dense P_s in their KKT formation)
        nb_, d_ = p_blocks.shape[1], p_blocks.shape[2]
        n_ = q.shape[1]
        P = jnp.zeros((q.shape[0], n_, n_), p_blocks.dtype)
        for vb_ in range(nb_):
            P = P.at[:, vb_ * d_:(vb_ + 1) * d_,
                     vb_ * d_:(vb_ + 1) * d_].set(p_blocks[:, vb_])
    if not use_pallas:
        # The banded (Riccati) KKT replaces the dense factor in this
        # fallback whenever its stage statement is available and the
        # caller opted in ("banded" forces it here; "auto" upgrades the
        # fallback the VMEM gate or a non-TPU backend selected — the
        # 30x-cliff remedy above the fused kernel's ceiling).
        band_v = banded if (banded is not None
                            and kkt in ("banded", "auto")) else None
        x0v = jnp.zeros_like(q) if x0 is None else x0

        def _one(args):
            P_, q_, G_, h_, lb_, ub_, x0_, z0_, bnd_ = args
            return solve_qp(P_, q_, G_, h_, lb_, ub_, max_iter=max_iter,
                            tol=tol, x0=x0_, z0=z0_,
                            fixed_iters=fixed_iters, correctors=correctors,
                            use_pallas=False, banded=bnd_)

        return jax.vmap(_one)((P, q, G, h, lb, ub, x0v, z0, band_v))

    from scp_tpu.ops import pallas_linalg as pll

    dtype = q.dtype
    B0, mg, n = G.shape
    m = mg + 2 * n
    n_pad = pll.pad_dim(n)

    # pad the batch to the lane-tile multiple with benign identity problems
    b_pad = -(-B0 // pll.TB) * pll.TB
    if b_pad != B0:
        e = b_pad - B0
        if P is not None:
            P = jnp.concatenate(
                [P, jnp.broadcast_to(jnp.eye(n, dtype=dtype), (e, n, n))])
        q = jnp.concatenate([q, jnp.zeros((e, n), dtype)])
        G = jnp.concatenate([G, jnp.zeros((e, mg, n), dtype)])
        h = jnp.concatenate([h, jnp.ones((e, mg), dtype)])
        lb = jnp.concatenate([lb, jnp.full((e, n), -1.0, dtype)])
        ub = jnp.concatenate([ub, jnp.ones((e, n), dtype)])
        if x0 is not None:
            x0 = jnp.concatenate([x0, jnp.zeros((e, n), dtype)])
        if z0 is not None:
            z0 = jnp.concatenate([z0, jnp.ones((e, m), dtype)])
        if use_banded_lane:
            # benign pad instances for the Riccati sweeps: zero dynamics /
            # coefficients / costs — Hm stays SPD from the box barrier
            banded = BandedData(*(
                jnp.concatenate([a, jnp.zeros((e,) + a.shape[1:], dtype)])
                for a in banded))
        if p_blocks is not None:
            # pad instances have P = eye(n): eye blocks + unit tail diagonal
            nb_, d_ = p_blocks.shape[1], p_blocks.shape[2]
            p_blocks = jnp.concatenate([
                p_blocks,
                jnp.broadcast_to(jnp.eye(d_, dtype=dtype), (e, nb_, d_, d_))])
        if g_slabs is not None:
            g_slabs = tuple(
                jnp.concatenate([s, jnp.zeros((e,) + s.shape[1:], dtype)])
                for s in g_slabs)
    B = b_pad

    # --- ghost-vehicle alignment padding ---
    # The fused structured kernel factors nu = n-1 columns in STATIC 8-row
    # panels, so it needs (n-1) % 8 == 0 — which default hp=10 configs
    # (e.g. frog v=1, parallel v=11) fail. When the block layout allows a
    # cheap fix, append k GHOST VEHICLES (identity P block, zero cost,
    # unit box bounds, touched by no constraint row) so nu' = (v+k)*hu is
    # a sublane multiple. The padded QP is exactly separable — ghost
    # variables decouple and solve to 0, the real block's optimum is
    # unchanged — and the kernel zero-fills the ghost pair blocks
    # (``missing_pairs_s``). Rejected when the padding would grow the
    # factor noticeably (> max(hu, nu/4) extra columns): the O(nu^3)
    # factor growth then outweighs the structured formation savings.
    n_ghost_vars = 0
    nu_real = n - 1
    if (fixed_iters is not None and slack_schur and p_blocks is not None
            and not use_banded_lane):
        ng = _ghost_alignment_cols(n, g_struct, p_blocks.shape[1])
        if ng:
            hu_g = int(g_struct[3])
            v_g = (n - 1) // hu_g
            k_g = ng // hu_g
            n_ghost_vars = ng

            def _ins_cols(vec, fill):
                return jnp.concatenate(
                    [vec[:, :nu_real],
                     jnp.full((B, ng), fill, dtype),
                     vec[:, nu_real:]], axis=1)

            q = _ins_cols(q, 0.0)
            lb = _ins_cols(lb, -1.0)
            ub = _ins_cols(ub, 1.0)
            if x0 is not None:
                x0 = _ins_cols(x0, 0.0)
            if z0 is not None:
                # ghost box duals: non-positive = "no information"
                z0 = jnp.concatenate(
                    [z0[:, :mg],
                     _ins_cols(z0[:, mg:mg + n], 0.0),
                     _ins_cols(z0[:, mg + n:], 0.0)], axis=1)
            G = jnp.concatenate(
                [G[:, :, :nu_real],
                 jnp.zeros((B, mg, ng), dtype),
                 G[:, :, nu_real:]], axis=2)
            n2 = n + ng
            if P is not None:
                P = jnp.zeros((B, n2, n2), dtype) \
                    .at[:, :nu_real, :nu_real].set(
                        P[:, :nu_real, :nu_real]) \
                    .at[:, nu_real:nu_real + ng,
                        nu_real:nu_real + ng].set(
                        jnp.eye(ng, dtype=dtype))
            # (the slack row/col of P are zero in this path by contract)
            p_blocks = jnp.concatenate(
                [p_blocks,
                 jnp.broadcast_to(jnp.eye(hu_g, dtype=dtype),
                                  (B, k_g, hu_g, hu_g))], axis=1)
            n = n2
            m = mg + 2 * n
            n_pad = pll.pad_dim(n)

    # Structured mode: the fused kernel forms K from per-pair row slabs,
    # so the dense lane-layout G copy is never needed — the few setup and
    # certificate matvecs run as XLA einsums instead. With ``g_slabs`` the
    # dense G argument itself is never read (its scatter DCEs away).
    # NOTE on alignment: this gates on (n-1) % 8 == 0 but NOT hu % 8 == 0.
    # The kernel stores vehicle blocks at v*hu sublane offsets (e.g. 20,
    # 40, 60 for the bench's hu=20), relying on Mosaic accepting
    # non-sublane-aligned offsets — intentional, and TPU-validated at
    # hu=20 (bench) and hu=8 (tests). If a future Mosaic regresses on
    # unaligned sublane stores (this project has hit such lowering breaks
    # before, see CLAUDE.md linalg notes), symptoms will be kernel-compile
    # errors or garbage K blocks at hu % 8 != 0 — fall back by forcing
    # use_struct False for unaligned hu here.
    # (struct needs at least one pair slab: the kernel builder stacks the
    # pair slab list, and jnp.stack([]) is an error — single-vehicle
    # problems run the dense fused path, which is faster at those sizes)
    use_struct = (g_struct is not None and bool(g_struct[0])
                  and fixed_iters is not None
                  and slack_schur and (n - 1) % 8 == 0
                  and p_blocks is not None
                  and not use_banded_lane)
    use_slabs = use_struct and g_slabs is not None
    # The slab-driven equilibration + matvecs also serve the banded-lane
    # branch (same SCP row layout; keeps the dense G — ~100 MB in lane
    # layout at hp=64 — out of every per-iteration G pass):
    use_slab_mv = (g_slabs is not None and g_struct is not None
                   and bool(g_struct[0])
                   and (use_struct or use_banded_lane))
    use_mv_struct = use_struct or use_slab_mv

    # --- equilibration (canonical, once per solve) ---
    if use_slab_mv:
        gi_b, gj_b, gob_b = g_slabs
        if gob_b.ndim == 5:
            # (B, V, O, K, U) -> flat (B, S, K, U); v-major order matches
            # the canonical obst_veh enumeration
            gob_b = gob_b.reshape((B, -1) + gob_b.shape[3:])
        assert gob_b.shape[1] == len(g_struct[1]), \
            (gob_b.shape, "slab count must match g_struct obst_veh")
        slack_mask = (jnp.ones((mg,), dtype) if g_slack_mask is None
                      else jnp.asarray(g_slack_mask, dtype))
        # row norms in row order [pairs | single-block slabs]; a row's
        # slack coefficient is -1 where masked (slack_mask^2 == slack_mask)
        row_norm = jnp.sqrt(jnp.concatenate([
            (jnp.sum(gi_b * gi_b, -1)
             + jnp.sum(gj_b * gj_b, -1)).reshape(B, -1),
            jnp.sum(gob_b * gob_b, -1).reshape(B, -1),
        ], axis=1) + slack_mask[None, :])                     # (B, mg)
        d_row = 1.0 / jnp.maximum(row_norm, 1e-10)
        d_slack = d_row * slack_mask[None, :]                 # (B, mg)
        pk = gi_b.shape[1] * gi_b.shape[2]
        d_pairk = d_row[:, :pk].reshape(gi_b.shape[:3])
        gi_c = gi_b * d_pairk[..., None]
        gj_c = gj_b * d_pairk[..., None]
        gob_c = gob_b * d_row[:, pk:].reshape(gob_b.shape[:3])[..., None]
    else:
        row_norm = jnp.linalg.norm(G, axis=2)                 # (B, mg)
        d_row = 1.0 / jnp.maximum(row_norm, 1e-10)
        G_c = G * d_row[:, :, None]                           # canonical
    if p_blocks is not None:
        # P == blockdiag(p_blocks) + diagonal tail: every P-derived scalar
        # comes from the compact statement, so the dense P is never read on
        # the block path (P_s below is dead code XLA eliminates).
        nbd0 = p_blocks.shape[1] * p_blocks.shape[2]
        tail_diag = (jnp.zeros((B, n - nbd0), dtype) if P is None
                     else jnp.diagonal(P, axis1=1, axis2=2)[:, nbd0:])
        absmax = jnp.maximum(
            jnp.max(jnp.abs(p_blocks), axis=(1, 2, 3)),
            jnp.max(jnp.abs(tail_diag), axis=1, initial=0.0))
        cost_scale = 1.0 / jnp.maximum(absmax, 1.0)           # (B,)
    else:
        cost_scale = 1.0 / jnp.maximum(
            jnp.max(jnp.abs(P), axis=(1, 2)), 1.0)            # (B,)
    P_s = None if P is None else P * cost_scale[:, None, None]
    if P is None:
        # scaled P diagonal from the block statement (no dense P exists)
        p_diag_s = jnp.concatenate(
            [jnp.diagonal(p_blocks, axis1=2, axis2=3).reshape(B, nbd0),
             tail_diag], axis=1) * cost_scale[:, None]
    else:
        p_diag_s = jnp.diagonal(P_s, axis1=1, axis2=2)

    # everything below lives as (dim, B) — batch on lanes
    def t(a):                                                 # (B, d) -> (d, B)
        return jnp.transpose(a, (1, 0))

    if use_mv_struct:
        mg_pad = pll._pad_to(mg, pll._MV_MB)
        _HI = jax.lax.Precision.HIGHEST
        if use_slab_mv:
            pairs_s0, obst_veh0, hp_s0, hu_s0, *_ = g_struct
            nu0 = n - 1
            xv_shape0 = nu0 // hu_s0
            pi_idx = jnp.asarray([i for i, _ in pairs_s0], jnp.int32)
            pj_idx = jnp.asarray([j for _, j in pairs_s0], jnp.int32)

            # xv has xv_shape0 = nu/hu vehicle blocks, which may exceed
            # the slabs' REAL vehicle count when ghost alignment vehicles
            # are appended (no constraint row touches them) — single-block
            # slabs address vehicles through the obst_veh map, which never
            # names a ghost.
            ov_idx = jnp.asarray(obst_veh0, jnp.int32)        # (S,)

            def gmv(x):                                       # (n,B)->(mg,B)
                # slab einsums; masked rows add the -d_row slack column
                xv = t(x[:nu0]).reshape(B, -1, hu_s0)         # (B, V, U)
                rows_p = (jnp.einsum("bpku,bpu->bpk", gi_c, xv[:, pi_idx],
                                     precision=_HI)
                          + jnp.einsum("bpku,bpu->bpk", gj_c,
                                       xv[:, pj_idx], precision=_HI))
                rows_o = jnp.einsum("bsku,bsu->bsk", gob_c,
                                    xv[:, ov_idx], precision=_HI)
                rows = jnp.concatenate(
                    [rows_p.reshape(B, -1), rows_o.reshape(B, -1)], axis=1)
                return t(rows) - d_slack.T * x[nu0][None, :]

            def gtmv(v):                                      # (mg,B)->(n,B)
                pk0 = gi_c.shape[1] * gi_c.shape[2]
                vp = t(v[:pk0]).reshape(gi_c.shape[:3])       # (B, P, K)
                vo = t(v[pk0:]).reshape(gob_c.shape[:3])      # (B, S, K)
                ci = jnp.einsum("bpku,bpk->bpu", gi_c, vp, precision=_HI)
                cj = jnp.einsum("bpku,bpk->bpu", gj_c, vp, precision=_HI)
                acc = jnp.zeros((B, xv_shape0, hu_s0), dtype) \
                    .at[:, pi_idx].add(ci).at[:, pj_idx].add(cj)
                acc = acc.at[:, ov_idx].add(
                    jnp.einsum("bsku,bsk->bsu", gob_c, vo, precision=_HI))
                slack = -jnp.sum(d_slack * t(v), axis=1)      # (B,)
                return jnp.concatenate(
                    [t(acc.reshape(B, nu0)), slack[None, :]], axis=0)
        else:
            def gmv(x):                                       # (n,B)->(mg,B)
                return jnp.einsum("bmn,nb->mb", G_c, x, precision=_HI)

            def gtmv(v):                                      # (mg,B)->(n,B)
                return jnp.einsum("bmn,mb->nb", G_c, v, precision=_HI)
    else:
        # lane-layout copies: ONE transpose each per solve, loop-invariant
        G_lane = pll.to_lane3(G_c)                            # (mg', n_pad, B)
        mg_pad = G_lane.shape[0]

    q_s = t(q) * cost_scale[None, :]                          # (n, B)
    hhat_s = jnp.concatenate([t(h * d_row), t(ub), -t(lb)])   # (m, B)
    lb_t, ub_t = t(lb), t(ub)

    def pad_rows(v, rows):
        return jnp.pad(v, ((0, rows - v.shape[0]), (0, 0)))

    if not use_mv_struct:
        def gmv(x):                                           # (n,B)->(mg,B)
            return pll.gmv_lane(G_lane, pad_rows(x, n_pad))[:mg]

        def gtmv(v):                                          # (mg,B)->(n,B)
            return pll.gtmv_lane(G_lane, pad_rows(v, mg_pad))[:n]

    if p_blocks is None:
        P_lane = pll.to_lane3(P_s)                            # (n', n_pad, B)

        def pmv(x):                                           # (n,B)->(n,B)
            return pll.gmv_lane(P_lane, pad_rows(x, n_pad))[:n]
    else:
        nb, d = p_blocks.shape[1], p_blocks.shape[2]
        nbd = nb * d
        pb_lane = jnp.transpose(
            p_blocks * cost_scale[:, None, None, None],
            (1, 2, 3, 0))                                     # (nb, d, d, B)
        ptail = t(p_diag_s[:, nbd:])

        def pmv(x):
            xb = x[:nbd].reshape(nb, d, B)
            px = jnp.einsum("vijb,vjb->vib", pb_lane, xb,
                            precision=jax.lax.Precision.HIGHEST)
            return jnp.concatenate(
                [px.reshape(nbd, B), ptail * x[nbd:n]], axis=0)

    def ghat_mv(x):
        return jnp.concatenate([gmv(x), x, -x])               # (m, B)

    def ghat_tmv(v):
        return gtmv(v[:mg]) + v[mg:mg + n] - v[mg + n:]       # (n, B)

    # --- initial point ---
    x = jnp.zeros((n, B), dtype) if x0 is None else t(jnp.clip(x0, lb, ub))
    resid = hhat_s - ghat_mv(x)
    s = jnp.maximum(resid, 1.0)
    z = 1.0 / s
    if z0 is not None:
        # dual warm start; non-positive entries keep the cold init.
        z_w0 = t(z0) * cost_scale[None, :] / jnp.concatenate(
            [t(d_row), jnp.ones((2 * n, B), dtype)], axis=0)
        z = jnp.where(t(z0) > 0, jnp.clip(z_w0, 1e-3, 1e3), z)

    reg_rel_f = 1e-12 if dtype == jnp.float64 else 3e-6
    reg_rel = jnp.asarray(reg_rel_f, dtype)
    k_precision = jax.lax.Precision.HIGH
    diag_pad = jnp.arange(n, n_pad)

    def factor(s, z):
        # Jacobi-scaled KKT factorization (see solve_qp.factor). The dot
        # contracts the G-row axis of both operands directly so XLA never
        # materializes a transposed copy of G (only the w-scaled one).
        w = z / s                                             # (m, B)
        w_g = t(w[:mg])                                       # (B, mg)
        K = P_s + jax.lax.dot_general(
            G_c, G_c * w_g[:, :, None],
            (((1,), (1,)), ((0,), (0,))), precision=k_precision)
        dbox = t(w[mg:mg + n] + w[mg + n:])                   # (B, n)
        di = jnp.arange(n)
        K = K.at[:, di, di].add(dbox)
        dsc = jax.lax.rsqrt(jnp.maximum(
            jnp.diagonal(K, axis1=1, axis2=2), 1e-30))        # (B, n)
        K = K * (dsc[:, :, None] * dsc[:, None, :])
        K = K.at[:, di, di].add(reg_rel)
        K = jnp.pad(K, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
        K = K.at[:, diag_pad, diag_pad].set(1.0)
        return pll.cholesky_lane(K), t(dsc)                   # dsc (n, B)

    def kkt_solve(L, dsc, s, z, rd, rp, rc):
        w = z / s
        rhs = -(rd + ghat_tmv(w * rp - rc / s))               # (n, B)
        dx = dsc * pll.cho_solve_lane(L, pad_rows(dsc * rhs, n_pad))[:n]
        dz = w * (ghat_mv(dx) + rp) - rc / s
        ds = -(rc + s * dz) / z
        return dx, ds, dz

    if use_banded_lane:
        # ---- banded-lane overrides: the SAME (K + reg*diag(K)) system,
        # factored by the fused Riccati sweeps instead of the dense
        # Cholesky (see solve_qp's banded block for the math; this is its
        # natively-batched (dim, B) twin — stage data built batched, the
        # ω border eliminated by a 1x1 Schur complement).
        from scp_tpu.ops import constraints as _con
        from scp_tpu.ops import pallas_riccati as _pr
        from scp_tpu.ops import riccati as _ric

        v_bl = banded.a_blk.shape[1]
        nu_bl = n - 1
        hu_bl = nu_bl // v_bl
        assert v_bl * hu_bl == nu_bl, (v_bl, n)
        k_bl = banded.y_obst.shape[3]
        assert k_bl == hu_bl, "banded lane requires hp == hu"
        pairs_bl = tuple(_con._static_pairs(v_bl))
        assert banded.y_pair.shape[1] == len(pairs_bl)
        pk_bl = len(pairs_bl) * k_bl
        if use_slab_mv:
            # diag(G^T W G) and the slack column from the equilibrated
            # slabs — the dense G is never read on this path
            gi2_bl, gj2_bl = gi_c * gi_c, gj_c * gj_c
            gob2_bl = gob_c * gob_c
            gsl_bl = t(-d_slack)                         # (mg, B)

            def _diag_gu(w_g):   # (B, mg) -> (nu, B): sum_m w_m g_mu^2
                vp = w_g[:, :pk_bl].reshape(gi_c.shape[:3])
                vo = w_g[:, pk_bl:].reshape(gob_c.shape[:3])
                acc = jnp.zeros((B, v_bl, hu_bl), dtype) \
                    .at[:, pi_idx].add(jnp.einsum("bpku,bpk->bpu",
                                                  gi2_bl, vp)) \
                    .at[:, pj_idx].add(jnp.einsum("bpku,bpk->bpu",
                                                  gj2_bl, vp)) \
                    .at[:, ov_idx].add(jnp.einsum("bsku,bsk->bsu",
                                                  gob2_bl, vo))
                return t(acc.reshape(B, nu_bl))
        else:
            Gu2_bl = G_c[:, :, :nu_bl] ** 2              # loop-invariant
            gsl_bl = t(G_c[:, :, nu_bl])                 # (mg, B) slack col

            def _diag_gu(w_g):
                return t(jnp.einsum("bmn,bm->bn", Gu2_bl, w_g))
        d_row2 = d_row * d_row                           # (B, mg)
        qy_s = banded.qy * cost_scale[:, None, None]     # (B, V, K)
        ru_s = banded.ru * cost_scale[:, None]           # (B, V)
        pdiag_t = t(p_diag_s)                            # (n, B)

        def stagef_bl(vec_n):       # (nu, B) -> (B, K, V) stage-major
            return jnp.transpose(
                vec_n.reshape(v_bl, hu_bl, B), (2, 1, 0))

        def unstage_bl(du):         # (B, K, V) -> (nu, B)
            return jnp.transpose(du, (2, 1, 0)).reshape(nu_bl, B)

        def factor(s, z):           # noqa: F811 — banded-lane override
            w = z / s                                    # (m, B)
            w_g = t(w[:mg])                              # (B, mg)
            wd = w_g * d_row2
            w_pair = wd[:, :pk_bl].reshape(B, len(pairs_bl), k_bl)
            w_ob = wd[:, pk_bl:].reshape(B, v_bl, -1, k_bl)
            hy = jax.vmap(lambda yp, yo, wp, wo, q_:
                          _ric.build_hy(pairs_bl, yp, yo, wp, wo, q_))(
                banded.y_pair, banded.y_obst, w_pair, w_ob, qy_s)
            dbox = w[mg:mg + n] + w[mg + n:]             # (n, B)
            diagk_u = pdiag_t[:nu_bl] + _diag_gu(w_g) \
                + dbox[:nu_bl]                           # (nu, B)
            hu_diag = ru_s[:, None, :] + stagef_bl(
                dbox[:nu_bl] + reg_rel * diagk_u)
            fac_t = _pr.riccati_factor_lane(
                banded.a_blk, banded.b_blk, hy, hu_diag)
            # slack border column / corner, with the dense path's reg
            # (P's border entries are zero by the p_blocks contract)
            c_uw = gtmv(w[:mg] * gsl_bl)[:nu_bl]         # (nu, B)
            k_ww = (jnp.sum(w[:mg] * gsl_bl * gsl_bl, axis=0)
                    + dbox[n - 1] + pdiag_t[n - 1]) * (1.0 + reg_rel)
            y2 = _pr.riccati_solve_lane(
                *fac_t, banded.a_blk, banded.b_blk, stagef_bl(c_uw))
            return (fac_t, c_uw, k_ww, unstage_bl(y2)), None

        def kkt_solve(facB, _dsc, s, z, rd, rp, rc):    # noqa: F811
            fac_t, c_uw, k_ww, y2v = facB
            w = z / s
            rhs = -(rd + ghat_tmv(w * rp - rc / s))      # (n, B)
            y1 = unstage_bl(_pr.riccati_solve_lane(
                *fac_t, banded.a_blk, banded.b_blk,
                stagef_bl(rhs[:nu_bl])))
            dw = (rhs[nu_bl] - jnp.sum(c_uw * y1, axis=0)) \
                / (k_ww - jnp.sum(c_uw * y2v, axis=0))   # (B,)
            dx = jnp.concatenate([y1 - dw[None, :] * y2v, dw[None, :]])
            dz = w * (ghat_mv(dx) + rp) - rc / s
            ds = -(rc + s * dz) / z
            return dx, ds, dz

    def max_step(v, dv):
        ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
        return jnp.minimum(1.0, 0.99 * jnp.min(ratio, axis=0))  # (B,)

    def iterate(x, s, z, rp):
        # rp maintained by the exact (1 - alpha) recurrence — see solve_qp.
        rd = pmv(x) + q_s + ghat_tmv(z)
        if dtype == jnp.float64:
            rp = ghat_mv(x) + s - hhat_s   # see solve_qp.iterate
        mu = jnp.sum(s * z, axis=0) / m                       # (B,)

        L, dsc = factor(s, z)

        rc_aff = s * z
        dx_a, ds_a, dz_a = kkt_solve(L, dsc, s, z, rd, rp, rc_aff)
        alpha_p = max_step(s, ds_a)
        alpha_d = max_step(z, dz_a)
        mu_aff = jnp.sum((s + alpha_p * ds_a) * (z + alpha_d * dz_a),
                         axis=0) / m
        sigma = (mu_aff / jnp.maximum(mu, 1e-30)) ** 3

        rc = s * z + ds_a * dz_a - sigma[None, :] * mu[None, :]
        dx, ds, dz = kkt_solve(L, dsc, s, z, rd, rp, rc)
        alpha = jnp.minimum(max_step(s, ds), max_step(z, dz))[None, :]

        x_new = x + alpha * dx
        s_new = s + alpha * ds
        z_new = z + alpha * dz
        ok = (jnp.all(jnp.isfinite(x_new), axis=0)
              & jnp.all(jnp.isfinite(s_new), axis=0)
              & jnp.all(jnp.isfinite(z_new), axis=0))          # (B,)
        okb = ok[None, :]
        x = jnp.where(okb, x_new, x)
        s = jnp.where(okb, s_new, s)
        z = jnp.where(okb, z_new, z)
        rp = jnp.where(okb, (1.0 - alpha) * rp, rp)
        return x, s, z, rp, mu, rd, ok

    if fixed_iters is not None and use_banded_lane:
        # Banded-lane fixed-iteration loop: the iterate() algebra in
        # (dim, B) layout with the Riccati factor/solve overrides above,
        # plus the same per-lane freeze-on-stall as solve_qp's fori body.
        rp0b = ghat_mv(x) + s - hhat_s
        bigv = jnp.full((B,), jnp.finfo(dtype).max, dtype)

        def fori_body_bl(_, st):
            x_, s_, z_, rp_, mu_prev, frozen = st
            x2, s2, z2, rp2, mu, rd, ok = iterate(x_, s_, z_, rp_)
            stalled = (mu > 0.7 * mu_prev) & (mu < tol * 1e3)
            converged = mu < tol
            nf = frozen | stalled | converged | ~ok
            keep = (~nf)[None, :]
            return (jnp.where(keep, x2, x_), jnp.where(keep, s2, s_),
                    jnp.where(keep, z2, z_), jnp.where(keep, rp2, rp_),
                    mu, nf)

        x, s, z, _, _, _ = jax.lax.fori_loop(
            0, fixed_iters, fori_body_bl,
            (x, s, z, rp0b, bigv, jnp.zeros((B,), bool)))
        iters = jnp.full((B0,), fixed_iters)
    elif fixed_iters is not None:
        # Fused path: the whole Mehrotra iteration (factor + predictor +
        # corrector + step algebra) runs as ONE Pallas launch per iteration
        # with the factor and G resident in VMEM; only the KKT formation
        # (MXU matmul) and its layout transpose stay in XLA. See
        # pallas_linalg.ipm_iterate_lane.
        mrow = jnp.arange(mg_pad)[:, None] < mg
        nrow = jnp.arange(n_pad)[:, None] < n
        one = jnp.ones((), dtype)

        def lane_pad(v, rows, fill):
            out = jnp.full((rows, B), fill, dtype)
            return out.at[:v.shape[0]].set(v)

        if use_struct:
            def gmv_pad(xl):
                return lane_pad(gmv(xl[:n]), mg_pad, 0.0)
        else:
            def gmv_pad(xl):
                return pll.gmv_lane(G_lane, xl)

        hg = lane_pad(t(h * d_row), mg_pad, one)
        hu_ = lane_pad(ub_t, n_pad, one)
        hl = lane_pad(-lb_t, n_pad, one)
        q_lane = lane_pad(q_s, n_pad, 0.0)
        xl = lane_pad(x, n_pad, 0.0)
        sg = jnp.maximum(hg - gmv_pad(xl), 1.0)
        su = jnp.maximum(hu_ - xl, 1.0)
        sl = jnp.maximum(hl + xl, 1.0)
        zg = jnp.where(mrow, 1.0 / sg, 0.0)
        zu = jnp.where(nrow, 1.0 / su, 0.0)
        zl = jnp.where(nrow, 1.0 / sl, 0.0)
        if z0 is not None:
            # dual warm start; non-positive entries keep the cold init
            z_w = z0 * cost_scale[:, None] / jnp.concatenate(
                [d_row, jnp.ones((B, 2 * n), dtype)], axis=1)
            z_w = jnp.clip(z_w, 1e-3, 1e3)
            zg0 = lane_pad(t(z0[:, :mg]), mg_pad, 0.0)
            zu0 = lane_pad(t(z0[:, mg:mg + n]), n_pad, 0.0)
            zl0 = lane_pad(t(z0[:, mg + n:]), n_pad, 0.0)
            zg = jnp.where(mrow & (zg0 > 0),
                           lane_pad(t(z_w[:, :mg]), mg_pad, 0.0), zg)
            zu = jnp.where(nrow & (zu0 > 0),
                           lane_pad(t(z_w[:, mg:mg + n]), n_pad, 0.0), zu)
            zl = jnp.where(nrow & (zl0 > 0),
                           lane_pad(t(z_w[:, mg + n:]), n_pad, 0.0), zl)
        scal = jnp.zeros((8, B), dtype).at[0].set(jnp.finfo(dtype).max)
        # rp carried by exact recurrence (see iterate); benign on pads
        rpg = jnp.where(mrow, gmv_pad(xl) + sg - hg, 0.0)
        rpu = jnp.where(nrow, xl + su - hu_, 0.0)
        rpl = jnp.where(nrow, -xl + sl - hl, 0.0)

        # slack_schur: variable n-1 is a slack with zero P row/col (the
        # SCP omega) — form K on the non-slack block only and let the
        # kernel eliminate the slack border (pallas_linalg.make_ipm_iter_
        # kernel): the factorization runs on n-1 (a sublane multiple)
        # columns instead of n_pad.
        use_schur = slack_schur and (n - 1) % 8 == 0
        pdiag = lane_pad(t(p_diag_s), n_pad, one)
        if use_struct:
            # Per-pair row slabs (once per solve, loop-invariant): the
            # fused kernel forms K from these in VMEM — no dense dot, no
            # layout transpose, no K in HBM (see ipm_iterate_lane_struct).
            pairs_s, obst_veh, hp_s, hu_s, *_ = g_struct
            hu8 = pll._pad_to(hu_s, 8)
            ob0 = len(pairs_s) * hp_s

            def _pad_u(s):       # (C, hp, hu, B) -> (C, hp, hu8, B)
                return jnp.pad(
                    s, ((0, 0), (0, 0), (0, hu8 - hu_s), (0, 0)))

            if use_slabs:
                # equilibrated slabs straight from the caller's
                # linearization — the dense G was never read. gob_c is
                # already flat (B, S, K, U) in obst_veh order; hard rows
                # (slack_mask 0) get a zero slack coefficient.
                gi_sl = _pad_u(jnp.transpose(gi_c, (1, 2, 3, 0)))
                gj_sl = _pad_u(jnp.transpose(gj_c, (1, 2, 3, 0)))
                gob_sl = _pad_u(jnp.transpose(
                    gob_c, (1, 2, 3, 0))) if obst_veh else None
                gsl_sl = lane_pad(t(-d_slack), mg_pad, 0.0)
            else:

                def _slab(parts):   # list of (B, hp, hu) -> (C, hp, hu8, B)
                    return _pad_u(
                        jnp.transpose(jnp.stack(parts), (0, 2, 3, 1)))

                gi_sl = _slab([
                    G_c[:, p * hp_s:(p + 1) * hp_s,
                        i * hu_s:(i + 1) * hu_s]
                    for p, (i, j) in enumerate(pairs_s)])
                gj_sl = _slab([
                    G_c[:, p * hp_s:(p + 1) * hp_s,
                        j * hu_s:(j + 1) * hu_s]
                    for p, (i, j) in enumerate(pairs_s)])
                gob_sl = _slab([
                    G_c[:, ob0 + o * hp_s:ob0 + (o + 1) * hp_s,
                        v * hu_s:(v + 1) * hu_s]
                    for o, v in enumerate(obst_veh)]) if obst_veh else None
                gsl_sl = lane_pad(t(G_c[:, :, n - 1]), mg_pad, 0.0)

            def run_iters(state):
                # ALL fixed iterations in ONE launch: the kernel's second
                # grid dimension revisits each tile's blocks, keeping
                # slabs/P/state VMEM-resident across iterations.
                return pll.ipm_iterate_lane_struct(
                    gi_sl, gj_sl, gob_sl, gsl_sl, pb_lane, q_lane, pdiag,
                    *state,
                    g_struct=g_struct, mg=mg, n=n, m_true=m, tol=tol,
                    reg_rel=reg_rel_f, n_cor=correctors,
                    n_iters=fixed_iters)
        else:
            if use_schur:
                G_k = G_c[:, :, :n - 1]              # loop-invariant slice
                if p_blocks is None:
                    P_pad = P_s[:, :n - 1, :n - 1]
            else:
                G_k = jnp.pad(G_c, ((0, 0), (0, 0), (0, n_pad - n)))
                if p_blocks is None:
                    P_pad = jnp.pad(P_s,
                                    ((0, 0), (0, n_pad - n),
                                     (0, n_pad - n)))
                    P_pad = P_pad.at[:, diag_pad, diag_pad].set(1.0)

            def fori_body(_, state):
                xl, sg, su, sl, zg, zu, zl, rpg, rpu, rpl, scal = state
                wg_c = t2(zg[:mg] / sg[:mg])                # (B, mg)
                # G^T W_g G on the MXU; box diagonal + regularization are
                # added inside the fused kernel (in VMEM). The dot
                # contracts the G-row axis of both operands directly — no
                # transposed copy. On the block path the kernel also adds
                # the P blocks and computes P @ x itself (the dense padded
                # P never touches HBM).
                Kprod = jax.lax.dot_general(
                    G_k, G_k * wg_c[:, :, None],
                    (((1,), (1,)), ((0,), (0,))), precision=k_precision)
                if p_blocks is None:
                    K_lane = jnp.transpose(P_pad + Kprod, (2, 1, 0))
                    px, pb_arg = pad_rows(pmv(xl[:n]), n_pad), None
                else:
                    K_lane = jnp.transpose(Kprod, (2, 1, 0))
                    px, pb_arg = None, pb_lane
                return pll.ipm_iterate_lane(
                    K_lane, G_lane, px, q_lane, pdiag,
                    xl, sg, su, sl, zg, zu, zl, rpg, rpu, rpl, scal,
                    mg=mg, n=n, m_true=m, tol=tol, reg_rel=reg_rel_f,
                    pb=pb_arg, n_cor=correctors, schur_slack=use_schur)

        t2 = lambda a: jnp.transpose(a, (1, 0))  # noqa: E731
        state0 = (xl, sg, su, sl, zg, zu, zl, rpg, rpu, rpl, scal)
        if use_struct:
            out_state = run_iters(state0)
        else:
            out_state = jax.lax.fori_loop(0, fixed_iters, fori_body, state0)
        xl, sg, su, sl, zg, zu, zl, rpg, rpu, rpl, scal = out_state
        x = xl[:n]
        s = jnp.concatenate([sg[:mg], su[:n], sl[:n]])
        z = jnp.concatenate([zg[:mg], zu[:n], zl[:n]])
        iters = jnp.full((B0,), fixed_iters)
    else:
        hnorm = 1.0 + jnp.linalg.norm(hhat_s, axis=0)
        qnorm = 1.0 + jnp.linalg.norm(q_s, axis=0)

        rp0 = ghat_mv(x) + s - hhat_s

        def body(state):
            x, s, z, rp, it, stop = state
            x2, s2, z2, rp2, mu, rd, ok = iterate(x, s, z, rp)
            active = ~stop
            keep = active[None, :]
            x = jnp.where(keep, x2, x)
            s = jnp.where(keep, s2, s)
            z = jnp.where(keep, z2, z)
            rp = jnp.where(keep, rp2, rp)
            mu_new = jnp.sum(s * z, axis=0) / m
            converged_now = ((mu_new < tol)
                             & (jnp.linalg.norm(rp, axis=0) / hnorm < tol * 10)
                             & (jnp.linalg.norm(rd, axis=0) / qnorm < tol * 10))
            stalled = (mu_new > 0.7 * mu) & (mu_new < tol * 1e3)
            stop = stop | converged_now | stalled | ~ok
            it = it + active
            return x, s, z, rp, it, stop

        def cond(state):
            _, _, _, _, it, stop = state
            return jnp.any((it < max_iter) & (~stop))

        x, s, z, _, iters_all, _ = jax.lax.while_loop(
            cond, body, (x, s, z, rp0, jnp.zeros((B,), jnp.int32),
                         jnp.zeros((B,), bool)))
        iters = iters_all[:B0]

    mu_f = jnp.sum(s * z, axis=0) / m
    if fixed_iters is not None and not certificate and not use_banded_lane:
        # Cheap certificate for the fused hot path: the primal residual is
        # carried through the kernel by the exact (1 - alpha) recurrence, so
        # its norm costs three small lane reductions instead of the honest
        # ghat_mv/pmv/ghat_tmv recomputation (two full G reads per solve).
        # ``converged`` only feeds the qp_fails failure counter here; callers
        # that gate on optimality (tests, MIQP) keep certificate=True.
        rp_f = jnp.sqrt(jnp.sum(rpg * rpg, axis=0)
                        + jnp.sum(rpu * rpu, axis=0)
                        + jnp.sum(rpl * rpl, axis=0))
        conv = (mu_f < tol * 10) \
            & (rp_f / (1.0 + jnp.linalg.norm(hhat_s, axis=0)) < tol * 100) \
            & jnp.all(jnp.isfinite(x), axis=0)
    else:
        rp_f = jnp.linalg.norm(ghat_mv(x) + s - hhat_s, axis=0)
        rd_f = jnp.linalg.norm(pmv(x) + q_s + ghat_tmv(z), axis=0)
        conv = (mu_f < tol * 10) \
            & (rp_f / (1.0 + jnp.linalg.norm(hhat_s, axis=0)) < tol * 100) \
            & (rd_f / (1.0 + jnp.linalg.norm(q_s, axis=0)) < tol * 100)

    xb = t(x)[:B0]                                            # (B0, n)
    q0 = q[:B0]
    if P is not None:
        obj = 0.5 * jnp.einsum("bi,bij,bj->b", xb, P[:B0], xb) \
            + jnp.sum(q0 * xb, axis=1)
    elif p_blocks is not None:
        # objective from the block statement — the dense P (whose scatter
        # the caller builds only as a fallback operand) is never read for
        # full rows, so XLA dead-code-eliminates it on this path. Ghost
        # alignment variables solve to ~0 and their identity blocks
        # contribute O(ipm_tol^2).
        nbq = p_blocks.shape[1] * p_blocks.shape[2]
        xq = xb[:, :nbq].reshape(B0, p_blocks.shape[1], p_blocks.shape[2])
        quad = jnp.einsum("bvi,bvij,bvj->b", xq, p_blocks[:B0], xq) \
            + jnp.sum(tail_diag[:B0] * xb[:, nbq:n] ** 2, axis=1)
        obj = 0.5 * quad + jnp.sum(q0 * xb, axis=1)
    zb = t(z)[:B0]
    z_unscaled = jnp.concatenate(
        [d_row[:B0] * zb[:, :mg], zb[:, mg:]], axis=1) \
        / cost_scale[:B0, None]
    if n_ghost_vars:
        # drop the ghost alignment variables (solved to ~0; their residual
        # obj contribution is O(ipm_tol^2), far below f32 round-off)
        xb = jnp.concatenate([xb[:, :nu_real], xb[:, -1:]], axis=1)
        z_unscaled = jnp.concatenate([
            z_unscaled[:, :mg],
            z_unscaled[:, mg:mg + nu_real],                   # ub real
            z_unscaled[:, mg + n - 1:mg + n],                 # ub slack
            z_unscaled[:, mg + n:mg + n + nu_real],           # lb real
            z_unscaled[:, -1:],                               # lb slack
        ], axis=1)
    return QPSolution(x=xb, obj=obj, iters=iters,
                      converged=conv[:B0], gap=mu_f[:B0], z=z_unscaled)
