"""Banded (Riccati) KKT formulation: exact equivalence with the dense
condensed Newton system (VERDICT r4 next #1).

The banded solve must be the SAME linear system as the dense
``K = P + G^T W G + D`` factorization — formulation change, not a solver
change — so these tests pin banded vs dense to f64 round-off on randomized
SCP-structured systems (pair/obstacle rows acting through per-stage
positions of a condensed prediction, reference MPC_Iter.py:129-149 +
SCP_controller.py:300-326).
"""
import numpy as np
import jax
import jax.numpy as jnp

from scp_tpu.config import NX, NY
from scp_tpu.ops import condensed, riccati


def _random_system(seed=0, v=3, k=5, o=2):
    rng = np.random.default_rng(seed)
    # per-vehicle discrete dynamics (mildly contractive + coupling-free)
    a_blk = np.stack([np.eye(NX) + 0.1 * rng.normal(size=(NX, NX))
                      for _ in range(v)])
    a_blk *= 0.95
    b_blk = rng.normal(size=(v, NX))
    # condensed prediction blocks b3[v, k, :, j] = C A^(k-j) B, j <= k
    b3 = np.zeros((v, k, NY, k))
    for vv in range(v):
        ma, mb, mc = condensed.prediction_matrices(
            jnp.asarray(a_blk[vv]), jnp.asarray(b_blk[vv][:, None]),
            jnp.zeros((NX,)), k, k)
        b3[vv] = np.asarray(mb).reshape(k, NY, k)
    pairs = [(i, j) for i in range(v) for j in range(i + 1, v)]
    p = len(pairs)
    y_pair = rng.normal(size=(p, k, NY))
    y_obst = rng.normal(size=(v, o, k, NY))
    w_pair = rng.uniform(0.1, 100.0, size=(p, k))
    w_obst = rng.uniform(0.1, 100.0, size=(v, o, k))
    qy = rng.uniform(0.5, 3.0, size=(v, k))
    hu_extra = rng.uniform(0.5, 50.0, size=(k, v))
    r_rhs = rng.normal(size=(k, v))
    return (a_blk, b_blk, b3, pairs, y_pair, y_obst, w_pair, w_obst, qy,
            hu_extra, r_rhs)


def _dense_k(b3, pairs, y_pair, y_obst, w_pair, w_obst, qy, hu_extra):
    """The condensed dense Newton matrix the banded solve must equal."""
    v, k = b3.shape[0], b3.shape[1]
    n = v * k
    K = np.zeros((n, n))
    # tracking cost: sum_k qy[v,k] * B_k^T B_k per vehicle block
    for vv in range(v):
        blk = np.zeros((k, k))
        for kk in range(k):
            blk += qy[vv, kk] * b3[vv, kk].T @ b3[vv, kk]
        K[vv * k:(vv + 1) * k, vv * k:(vv + 1) * k] += blk
    # input diagonal
    K[np.arange(n), np.arange(n)] += hu_extra.T.reshape(n)
    # constraint rows: y·dy_i - y·dy_j (pairs), y·dy_v (obstacles)
    for p, (i, j) in enumerate(pairs):
        for kk in range(k):
            g = np.zeros(n)
            g[i * k:(i + 1) * k] = y_pair[p, kk] @ b3[i, kk]
            g[j * k:(j + 1) * k] = -(y_pair[p, kk] @ b3[j, kk])
            K += w_pair[p, kk] * np.outer(g, g)
    for vv in range(v):
        for oo in range(y_obst.shape[1]):
            for kk in range(k):
                g = np.zeros(n)
                g[vv * k:(vv + 1) * k] = y_obst[vv, oo, kk] @ b3[vv, kk]
                K += w_obst[vv, oo, kk] * np.outer(g, g)
    return K


def test_riccati_matches_dense_solve():
    (a_blk, b_blk, b3, pairs, y_pair, y_obst, w_pair, w_obst, qy,
     hu_extra, r_rhs) = _random_system()
    v, k = b3.shape[0], b3.shape[1]
    K = _dense_k(b3, pairs, y_pair, y_obst, w_pair, w_obst, qy, hu_extra)
    # dense reference: u-space (vehicle-major) solve
    du_dense = np.linalg.solve(K, r_rhs.T.reshape(v * k))

    hy = riccati.build_hy(tuple(pairs), jnp.asarray(y_pair),
                          jnp.asarray(y_obst), jnp.asarray(w_pair),
                          jnp.asarray(w_obst), jnp.asarray(qy))
    fac = riccati.riccati_factor(jnp.asarray(a_blk), jnp.asarray(b_blk),
                                 hy, jnp.asarray(hu_extra))
    du = riccati.riccati_solve(fac, jnp.asarray(a_blk),
                               jnp.asarray(b_blk), jnp.asarray(r_rhs))
    du_flat = np.asarray(du).T.reshape(v * k)      # (K, V) -> vehicle-major
    np.testing.assert_allclose(du_flat, du_dense, rtol=1e-9, atol=1e-11)


def test_riccati_matches_dense_solve_single_vehicle():
    (a_blk, b_blk, b3, pairs, y_pair, y_obst, w_pair, w_obst, qy,
     hu_extra, r_rhs) = _random_system(seed=3, v=1, k=7, o=4)
    K = _dense_k(b3, pairs, y_pair, y_obst, w_pair, w_obst, qy, hu_extra)
    du_dense = np.linalg.solve(K, r_rhs.T.reshape(-1))
    hy = riccati.build_hy(tuple(pairs), jnp.asarray(y_pair),
                          jnp.asarray(y_obst), jnp.asarray(w_pair),
                          jnp.asarray(w_obst), jnp.asarray(qy))
    fac = riccati.riccati_factor(jnp.asarray(a_blk), jnp.asarray(b_blk),
                                 hy, jnp.asarray(hu_extra))
    du = riccati.riccati_solve(fac, jnp.asarray(a_blk),
                               jnp.asarray(b_blk), jnp.asarray(r_rhs))
    np.testing.assert_allclose(np.asarray(du).T.reshape(-1), du_dense,
                               rtol=1e-9, atol=1e-11)


def test_riccati_vmaps():
    """The whole factor+solve batches under vmap (the production shape)."""
    batches = [_random_system(seed=s) for s in range(4)]
    a_blk = jnp.asarray(np.stack([b[0] for b in batches]))
    b_blk = jnp.asarray(np.stack([b[1] for b in batches]))
    pairs = tuple(batches[0][3])
    hy = jax.vmap(lambda yp, yo, wp, wo, q: riccati.build_hy(
        pairs, yp, yo, wp, wo, q))(
        jnp.asarray(np.stack([b[4] for b in batches])),
        jnp.asarray(np.stack([b[5] for b in batches])),
        jnp.asarray(np.stack([b[6] for b in batches])),
        jnp.asarray(np.stack([b[7] for b in batches])),
        jnp.asarray(np.stack([b[8] for b in batches])))
    hu = jnp.asarray(np.stack([b[9] for b in batches]))
    rr = jnp.asarray(np.stack([b[10] for b in batches]))

    def solve_one(a, bb, h, hd, r):
        fac = riccati.riccati_factor(a, bb, h, hd)
        return riccati.riccati_solve(fac, a, bb, r)

    du = jax.jit(jax.vmap(solve_one))(a_blk, b_blk, hy, hu, rr)
    for bi, b in enumerate(batches):
        K = _dense_k(b[2], b[3], b[4], b[5], b[6], b[7], b[8], b[9])
        ref = np.linalg.solve(K, b[10].T.reshape(-1))
        got = np.asarray(du[bi]).T.reshape(-1)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-11)


def _scp_qp_instance(n_veh=4, hp=6, seed=0, scenario="circle"):
    """A real SCP-iteration QP (dense inputs + banded statement)."""
    from scp_tpu.ops import constraints as con, discretize
    from scp_tpu.scenarios import builders
    from scp_tpu.sim import engine
    from scp_tpu.solvers import qp

    if scenario == "circle":
        cfg, data = builders.circle(n_veh, dtype=jnp.float64)
    else:
        cfg, data = builders.frog(dtype=jnp.float64)
    cfg = cfg.replace(hp=hp, hu=hp)
    carry = engine.init_carry(cfg, data)
    problem, aux = engine.controller_pre(cfg, data, carry)
    sys_ = problem.sys
    x0 = aux[3]
    v, n = cfg.n_veh, cfg.n_veh * hp
    dtype = jnp.float64
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.uniform(-0.01, 0.01, size=n))

    G_c, rhs = con.linearize(sys_, u)
    G = jnp.concatenate([G_c, jnp.full((G_c.shape[0], 1), -1.0, dtype)], 1)
    P_qp = jnp.zeros((n + 1, n + 1), dtype)
    for i in range(v):
        P_qp = P_qp.at[i * hp:(i + 1) * hp, i * hp:(i + 1) * hp].set(
            2.0 * problem.phi0[i])
    q_qp = jnp.concatenate([problem.psi0.reshape(n),
                            jnp.array([cfg.slack_weight], dtype)])
    lb = jnp.concatenate([jnp.full((n,), -cfg.u_lim, dtype),
                          jnp.zeros((1,), dtype)])
    ub = jnp.concatenate([jnp.full((n,), cfg.u_lim, dtype),
                          jnp.full((1,), cfg.slack_ub, dtype)])
    x0_qp = jnp.concatenate([u, jnp.zeros((1,), dtype)])

    A, B, E = discretize.linearize_and_discretize_batch(
        x0, carry.u_prev1, data.params.lf, data.params.lr, cfg.dt)
    yp, yo = con.linearize_ycoefs(sys_, u)
    qy = 2.0 * jnp.broadcast_to(data.params.q[:, None], (v, hp))
    qy = qy.at[:, -1].set(2.0 * data.params.q_final)
    banded = qp.BandedData(a_blk=A, b_blk=B[:, :, 0], y_pair=yp,
                           y_obst=yo, qy=qy, ru=2.0 * data.params.r)
    return (P_qp, q_qp, G, rhs, lb, ub, x0_qp), banded


def test_solve_qp_banded_matches_dense_scp_instance():
    """The banded path solves the SAME Newton systems as the dense factor
    on a real SCP QP (f64 round-off class agreement end-to-end)."""
    from scp_tpu.solvers import qp

    args, banded = _scp_qp_instance()
    sol_d = qp.solve_qp(*args[:6], x0=args[6], max_iter=40, tol=1e-10,
                        use_pallas=False)
    sol_b = qp.solve_qp(*args[:6], x0=args[6], max_iter=40, tol=1e-10,
                        use_pallas=False, banded=banded)
    assert bool(sol_d.converged) and bool(sol_b.converged)
    np.testing.assert_allclose(np.asarray(sol_b.x), np.asarray(sol_d.x),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(float(sol_b.obj), float(sol_d.obj),
                               rtol=1e-8)


def test_solve_qp_banded_matches_dense_fixed_iters():
    """Identical-iteration comparison: with a FIXED iteration count both
    paths take the same Mehrotra steps, so agreement is per-solve
    round-off, not just endpoint closeness."""
    from scp_tpu.solvers import qp

    args, banded = _scp_qp_instance(seed=1)
    for iters in (3, 8):
        sol_d = qp.solve_qp(*args[:6], x0=args[6], fixed_iters=iters,
                            tol=1e-10, use_pallas=False)
        sol_b = qp.solve_qp(*args[:6], x0=args[6], fixed_iters=iters,
                            tol=1e-10, use_pallas=False, banded=banded)
        np.testing.assert_allclose(np.asarray(sol_b.x),
                                   np.asarray(sol_d.x),
                                   rtol=1e-6, atol=1e-8)


def test_solve_qp_banded_single_vehicle_frog():
    """V=1, obstacle-only rows (frog shape: the O(K) row regime)."""
    from scp_tpu.solvers import qp

    args, banded = _scp_qp_instance(scenario="frog", hp=5)
    sol_d = qp.solve_qp(*args[:6], x0=args[6], max_iter=40, tol=1e-10,
                        use_pallas=False)
    sol_b = qp.solve_qp(*args[:6], x0=args[6], max_iter=40, tol=1e-10,
                        use_pallas=False, banded=banded)
    np.testing.assert_allclose(np.asarray(sol_b.x), np.asarray(sol_d.x),
                               rtol=1e-6, atol=1e-9)


def test_solve_scp_banded_matches_dense():
    """Full SCP loop: the banded formulation reproduces the dense path's
    iterates (same iteration counts, round-off-class endpoint agreement)
    on a real conflict scenario."""
    from scp_tpu.scenarios import builders
    from scp_tpu.sim import engine
    from scp_tpu.solvers import scp

    cfg, data = builders.circle(4, dtype=jnp.float64)
    carry = engine.init_carry(cfg, data)
    prob_d, _ = engine.controller_pre(cfg, data, carry)
    prob_b, _ = engine.controller_pre(cfg.replace(qp_kkt="banded"),
                                      data, carry)
    assert prob_b.banded_pre is not None
    kw = dict(u_lim=cfg.u_lim, qp_tol=1e-10, qp_max_iter=60)
    res_d = scp.solve_scp(prob_d, carry.u_warm, **kw)
    res_b = scp.solve_scp(prob_b, carry.u_warm, qp_kkt="banded", **kw)
    assert int(res_b.iters) == int(res_d.iters)
    assert bool(res_b.feasible) == bool(res_d.feasible)
    np.testing.assert_allclose(np.asarray(res_b.u), np.asarray(res_d.u),
                               rtol=1e-6, atol=1e-9)


def test_solve_scp_stacked_banded_matches_dense():
    """Stacked (batched) SCP with qp_kkt="banded" == dense stacked."""
    from scp_tpu.scenarios import batch as batch_lib
    from scp_tpu.sim import engine
    from scp_tpu.solvers import scp

    cfg, data = batch_lib.make_batch("circle", 3,
                                     key=jax.random.PRNGKey(2),
                                     dtype=jnp.float64, n_veh=3)
    cfg = cfg.replace(hp=6, hu=6, max_scp_iter=6, qp_max_iter=30)
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    carry = jax.vmap(lambda d, k: engine.init_carry(cfg, d, k))(data, keys)
    prob_b, _ = jax.vmap(lambda d, c: engine.controller_pre(
        cfg.replace(qp_kkt="banded"), d, c))(data, carry)
    kw = dict(u_lim=cfg.u_lim, max_scp_iter=6, qp_tol=1e-9,
              qp_max_iter=30)
    res_d = scp.solve_scp_stacked(prob_b, carry.u_warm, **kw)
    res_b = scp.solve_scp_stacked(prob_b, carry.u_warm, qp_kkt="banded",
                                  **kw)
    np.testing.assert_array_equal(np.asarray(res_b.iters),
                                  np.asarray(res_d.iters))
    np.testing.assert_allclose(np.asarray(res_b.u), np.asarray(res_d.u),
                               rtol=1e-6, atol=1e-9)


def test_closed_loop_banded_matches_dense():
    """Engine-level: a multi-step closed loop under qp_kkt="banded"
    tracks the dense loop (formulation equivalence through the full
    controller/plant recursion)."""
    import functools

    from scp_tpu.scenarios import builders
    from scp_tpu.sim import engine

    cfg, data = builders.circle(3, dtype=jnp.float64)
    cfg = cfg.replace(hp=5, hu=5, max_scp_iter=4, qp_max_iter=25)
    sim_d = jax.jit(functools.partial(engine.simulate, cfg, data,
                                      n_steps=4))
    sim_b = jax.jit(functools.partial(
        engine.simulate, cfg.replace(qp_kkt="banded"), data, n_steps=4))
    _, out_d = sim_d()
    _, out_b = sim_b()
    np.testing.assert_allclose(np.asarray(out_b.u_applied),
                               np.asarray(out_d.u_applied),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out_b.states),
                               np.asarray(out_d.states),
                               rtol=1e-5, atol=1e-8)
    assert np.asarray(out_b.feasible).all() == np.asarray(
        out_d.feasible).all()


def test_riccati_lane_kernels_match_scan_interpret():
    """The fused Pallas Riccati sweeps (ops/pallas_riccati.py) reproduce
    the scan implementation — validated on CPU via interpret mode, the
    same pattern as the fused IPM kernel tests."""
    from scp_tpu.ops import pallas_riccati as pr

    batches = [_random_system(seed=s, v=3, k=5, o=2) for s in range(3)]
    pairs = tuple(batches[0][3])
    to32 = lambda x: jnp.asarray(np.stack(x), jnp.float32)  # noqa: E731
    a_blk = to32([b[0] for b in batches])
    b_blk = to32([b[1] for b in batches])
    hy = jax.vmap(lambda yp, yo, wp, wo, q: riccati.build_hy(
        pairs, yp, yo, wp, wo, q))(
        to32([b[4] for b in batches]), to32([b[5] for b in batches]),
        to32([b[6] for b in batches]), to32([b[7] for b in batches]),
        to32([b[8] for b in batches]))
    hu = to32([b[9] for b in batches])
    rr = to32([b[10] for b in batches])

    fac_s = jax.vmap(riccati._riccati_factor_scan)(a_blk, b_blk, hy, hu)
    du_s = jax.vmap(riccati._riccati_solve_scan)(fac_s, a_blk, b_blk, rr)

    pr.INTERPRET = True
    riccati.KERNEL = True
    try:
        fac_k = jax.vmap(riccati.riccati_factor)(a_blk, b_blk, hy, hu)
        du_k = jax.vmap(riccati.riccati_solve)(fac_k, a_blk, b_blk, rr)
    finally:
        pr.INTERPRET = False
        riccati.KERNEL = None
    np.testing.assert_allclose(np.asarray(fac_k.f), np.asarray(fac_s.f),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fac_k.lh), np.asarray(fac_s.lh),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fac_k.kg), np.asarray(fac_s.kg),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(du_k), np.asarray(du_s),
                               rtol=5e-4, atol=1e-5)


def test_riccati_lane_kernels_single_vehicle_interpret():
    """V=1 kernel shapes (frog: 2V=2 position block, 1x1 input chol)."""
    from scp_tpu.ops import pallas_riccati as pr

    batches = [_random_system(seed=s + 10, v=1, k=6, o=3)
               for s in range(2)]
    to32 = lambda x: jnp.asarray(np.stack(x), jnp.float32)  # noqa: E731
    a_blk = to32([b[0] for b in batches])
    b_blk = to32([b[1] for b in batches])
    hy = jax.vmap(lambda yp, yo, wp, wo, q: riccati.build_hy(
        (), yp, yo, wp, wo, q))(
        to32([b[4] for b in batches]), to32([b[5] for b in batches]),
        to32([b[6] for b in batches]), to32([b[7] for b in batches]),
        to32([b[8] for b in batches]))
    hu = to32([b[9] for b in batches])
    rr = to32([b[10] for b in batches])
    fac_s = jax.vmap(riccati._riccati_factor_scan)(a_blk, b_blk, hy, hu)
    du_s = jax.vmap(riccati._riccati_solve_scan)(fac_s, a_blk, b_blk, rr)
    pr.INTERPRET = True
    riccati.KERNEL = True
    try:
        fac_k = jax.vmap(riccati.riccati_factor)(a_blk, b_blk, hy, hu)
        du_k = jax.vmap(riccati.riccati_solve)(fac_k, a_blk, b_blk, rr)
    finally:
        pr.INTERPRET = False
        riccati.KERNEL = None
    np.testing.assert_allclose(np.asarray(du_k), np.asarray(du_s),
                               rtol=5e-4, atol=1e-5)


def test_stacked_auto_resolves_to_banded_off_tpu():
    """qp_kkt="auto" routes the non-fused path through the banded solve
    (the VMEM-cliff remedy): on a backend without the fused kernel it must
    produce exactly the forced-banded result."""
    from scp_tpu.scenarios import batch as batch_lib
    from scp_tpu.sim import engine
    from scp_tpu.solvers import scp

    cfg, data = batch_lib.make_batch("circle", 2,
                                     key=jax.random.PRNGKey(6),
                                     dtype=jnp.float64, n_veh=3)
    cfg = cfg.replace(hp=5, hu=5, max_scp_iter=4, qp_max_iter=20,
                      qp_kkt="auto")
    keys = jax.random.split(jax.random.PRNGKey(7), 2)
    carry = jax.vmap(lambda d, k: engine.init_carry(cfg, d, k))(data, keys)
    prob, _ = jax.vmap(lambda d, c: engine.controller_pre(cfg, d, c))(
        data, carry)
    kw = dict(u_lim=cfg.u_lim, max_scp_iter=4, qp_tol=1e-9, qp_max_iter=20)
    res_auto = scp.solve_scp_stacked(prob, carry.u_warm, qp_kkt="auto",
                                     **kw)
    res_band = scp.solve_scp_stacked(prob, carry.u_warm, qp_kkt="banded",
                                     **kw)
    np.testing.assert_array_equal(np.asarray(res_auto.u),
                                  np.asarray(res_band.u))


def test_solve_qp_banded_kernel_integration_interpret():
    """The fused Riccati kernels inside the full IPM (f32, interpret
    mode): solve_qp with the banded KKT and KERNEL forced must land at
    the scan-path solution — validates the custom_vmap boundary under
    the solver, not just the primitives."""
    from scp_tpu.ops import pallas_riccati as pr
    from scp_tpu.solvers import qp

    args64, banded64 = _scp_qp_instance(n_veh=3, hp=5, seed=2)
    to32 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jnp.asarray(x, jnp.float32), t)
    args = to32(args64)
    banded = to32(banded64)

    def solve():
        return qp.solve_qp_batched(
            None if False else jnp.stack([args[0]]),
            jnp.stack([args[1]]), jnp.stack([args[2]]),
            jnp.stack([args[3]]), jnp.stack([args[4]]),
            jnp.stack([args[5]]), x0=jnp.stack([args[6]]),
            fixed_iters=6, tol=1e-6, use_pallas=False,
            banded=jax.tree_util.tree_map(lambda x: x[None], banded),
            kkt="banded")

    ref = solve()                      # scan path (KERNEL auto-off on CPU)
    pr.INTERPRET = True
    riccati.KERNEL = True
    try:
        got = solve()
    finally:
        pr.INTERPRET = False
        riccati.KERNEL = None
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=2e-3, atol=2e-5)


def test_banded_lane_branch_matches_vmap_interpret():
    """solve_qp_batched's banded-LANE branch (natively-batched IPM algebra
    + fused Riccati sweeps, the TPU production path above the VMEM gate)
    matches the vmapped per-instance banded solver — interpret mode."""
    from scp_tpu.ops import pallas_linalg as pll
    from scp_tpu.ops import pallas_riccati as pr
    from scp_tpu.solvers import qp

    args64, banded64 = _scp_qp_instance(n_veh=3, hp=5, seed=4)
    to32 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jnp.asarray(x, jnp.float32), t)
    a = to32(args64)
    bnd = jax.tree_util.tree_map(lambda x: x[None], to32(banded64))
    bat = lambda x: jnp.stack([x])            # noqa: E731

    common = dict(fixed_iters=6, tol=1e-6, kkt="banded", banded=bnd)
    ref = qp.solve_qp_batched(
        bat(a[0]), bat(a[1]), bat(a[2]), bat(a[3]), bat(a[4]), bat(a[5]),
        x0=bat(a[6]), use_pallas=False, **common)
    pll.INTERPRET = True
    pr.INTERPRET = True
    try:
        got = qp.solve_qp_batched(
            bat(a[0]), bat(a[1]), bat(a[2]), bat(a[3]), bat(a[4]),
            bat(a[5]), x0=bat(a[6]), use_pallas=True, **common)
    finally:
        pll.INTERPRET = False
        pr.INTERPRET = False
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=2e-3, atol=2e-5)


def test_banded_lane_slab_matvecs_match_vmap_interpret():
    """The banded-lane branch with SLAB matvecs (the production route via
    solve_scp_stacked's g_slabs) matches the vmapped banded solver —
    interpret mode, f32, fixed-iteration fori path."""
    from scp_tpu.ops import pallas_linalg as pll
    from scp_tpu.ops import pallas_riccati as pr
    from scp_tpu.scenarios import batch as batch_lib
    from scp_tpu.sim import engine
    from scp_tpu.solvers import scp

    cfg, data = batch_lib.make_batch("circle", 2,
                                     key=jax.random.PRNGKey(11),
                                     dtype=jnp.float32, n_veh=3)
    cfg = cfg.replace(hp=5, hu=5, max_scp_iter=3, qp_fixed_iters=5,
                      qp_tol=1e-6, qp_kkt="banded")
    keys = jax.random.split(jax.random.PRNGKey(12), 2)
    carry = jax.vmap(lambda d, k: engine.init_carry(cfg, d, k))(data, keys)
    prob, _ = jax.vmap(lambda d, c: engine.controller_pre(cfg, d, c))(
        data, carry)
    kw = dict(u_lim=cfg.u_lim, max_scp_iter=3, qp_tol=1e-6,
              qp_fixed_iters=5, qp_kkt="banded")
    ref = scp.solve_scp_stacked(prob, carry.u_warm, qp_use_pallas=False,
                                **kw)
    pll.INTERPRET = True
    pr.INTERPRET = True
    riccati.KERNEL = False   # vmap reference must stay on the scans
    try:
        got = scp.solve_scp_stacked(prob, carry.u_warm,
                                    qp_use_pallas=True, **kw)
    finally:
        pll.INTERPRET = False
        pr.INTERPRET = False
        riccati.KERNEL = None
    np.testing.assert_array_equal(np.asarray(got.iters),
                                  np.asarray(ref.iters))
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u),
                               rtol=5e-3, atol=5e-6)


def test_banded_lane_adaptive_path_interpret():
    """The banded-lane overrides also serve the ADAPTIVE (while-loop)
    solver — interpret-mode pin against the vmapped banded path."""
    from scp_tpu.ops import pallas_linalg as pll
    from scp_tpu.ops import pallas_riccati as pr
    from scp_tpu.solvers import qp

    args64, banded64 = _scp_qp_instance(n_veh=3, hp=5, seed=7)
    to32 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jnp.asarray(x, jnp.float32), t)
    a = to32(args64)
    bnd = jax.tree_util.tree_map(lambda x: x[None], to32(banded64))
    bat = lambda x: jnp.stack([x])            # noqa: E731
    common = dict(max_iter=5, tol=1e-6, kkt="banded", banded=bnd)
    ref = qp.solve_qp_batched(
        bat(a[0]), bat(a[1]), bat(a[2]), bat(a[3]), bat(a[4]), bat(a[5]),
        x0=bat(a[6]), use_pallas=False, **common)
    pll.INTERPRET = True
    pr.INTERPRET = True
    try:
        got = qp.solve_qp_batched(
            bat(a[0]), bat(a[1]), bat(a[2]), bat(a[3]), bat(a[4]),
            bat(a[5]), x0=bat(a[6]), use_pallas=True, **common)
    finally:
        pll.INTERPRET = False
        pr.INTERPRET = False
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=5e-3, atol=5e-5)
