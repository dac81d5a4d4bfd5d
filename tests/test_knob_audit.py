"""Config-knob audit: every SCPConfig solver field takes effect or errors.

VERDICT r3 weak #3: ``qp_correctors`` silently no-opped on the per-instance
path (``solve_scp`` accepted it but never forwarded it to ``solve_qp``).
These tests pin the plumbing for BOTH solver paths so a knob can never
silently disconnect again:

* recorder-wrapped ``qp.solve_qp`` / ``qp.solve_qp_batched`` assert the
  exact kwargs each SCP path passes for every ``qp_*`` config field;
* a static check asserts every ``qp_*`` field of ``SCPConfig`` is named in
  ``engine._scp_kwargs`` (future fields must be wired or the test fails);
* ``qp_cheap_k`` on the stacked path raises (unsupported there) instead of
  silently running full precision;
* Gondzio correctors on the per-instance path actually change the inner
  Newton steps on a constraint-active QP (not just plumbing).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scp_tpu.config import SCPConfig
from scp_tpu.scenarios import batch as batch_lib, builders
from scp_tpu.sim import engine
from scp_tpu.solvers import qp as qp_lib, scp as scp_lib


DISTINCT = dict(qp_max_iter=17, qp_tol=3e-7, qp_fixed_iters=5,
                qp_correctors=2, qp_warm_dual=True)


def test_scp_kwargs_cover_all_qp_fields():
    """Every qp_* SCPConfig field must be named in engine._scp_kwargs —
    adding a solver knob without wiring it is a test failure, not a silent
    no-op."""
    cfg = SCPConfig()
    kw = engine._scp_kwargs(cfg)
    qp_fields = {f for f in SCPConfig.__dataclass_fields__
                 if f.startswith("qp_")}
    missing = {f for f in qp_fields if f not in kw}
    assert not missing, f"unwired qp_* config fields: {missing}"


def test_per_instance_path_forwards_all_knobs(monkeypatch):
    calls = []
    real = qp_lib.solve_qp

    def rec(*a, **kw):
        calls.append(kw)
        return real(*a, **kw)

    monkeypatch.setattr(qp_lib, "solve_qp", rec)
    cfg, data = builders.circle(3, dtype=jnp.float64)
    cfg = cfg.replace(hp=4, hu=4, max_scp_iter=2, **DISTINCT)
    carry = engine.init_carry(cfg, data)
    engine.mpc_step(cfg, data, carry)   # unjitted: the recorder runs
    assert calls, "solve_qp never called"
    kw = calls[-1]
    assert kw["max_iter"] == 17
    assert kw["tol"] == 3e-7
    assert kw["fixed_iters"] == 5
    assert kw["correctors"] == 2
    assert kw["z0"] is not None, "qp_warm_dual must pass duals"


def test_stacked_path_forwards_all_knobs(monkeypatch):
    calls = []
    real = qp_lib.solve_qp_batched

    def rec(*a, **kw):
        calls.append(kw)
        return real(*a, **kw)

    monkeypatch.setattr(qp_lib, "solve_qp_batched", rec)
    cfg, data = batch_lib.make_batch("circle", 2, key=jax.random.PRNGKey(0),
                                     dtype=jnp.float64, n_veh=3)
    cfg = cfg.replace(hp=4, hu=4, max_scp_iter=2, **DISTINCT)
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    carry = jax.vmap(lambda d, k: engine.init_carry(cfg, d, k))(data, keys)
    problem, _ = jax.vmap(
        lambda d, c: engine.controller_pre(cfg, d, c))(data, carry)
    scp_lib.solve_scp_stacked(problem, carry.u_warm, u_lim=cfg.u_lim,
                              max_scp_iter=2, **{
                                  k: v for k, v in
                                  engine._scp_kwargs(cfg).items()
                                  if k != "u_lim"})
    assert calls, "solve_qp_batched never called"
    kw = calls[-1]
    assert kw["max_iter"] == 17
    assert kw["tol"] == 3e-7
    assert kw["fixed_iters"] == 5
    assert kw["correctors"] == 2
    assert kw["z0"] is not None, "qp_warm_dual must pass duals"


def test_stacked_path_rejects_cheap_k():
    cfg, data = batch_lib.make_batch("circle", 2, key=jax.random.PRNGKey(0),
                                     dtype=jnp.float64, n_veh=3)
    cfg = cfg.replace(hp=4, hu=4, max_scp_iter=2, qp_cheap_k=True)
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    carry = jax.vmap(lambda d, k: engine.init_carry(cfg, d, k))(data, keys)
    problem, _ = jax.vmap(
        lambda d, c: engine.controller_pre(cfg, d, c))(data, carry)
    with pytest.raises(NotImplementedError, match="cheap_k"):
        scp_lib.solve_scp_stacked(
            problem, carry.u_warm, u_lim=cfg.u_lim, max_scp_iter=2,
            **{k: v for k, v in engine._scp_kwargs(cfg).items()
               if k != "u_lim"})


def _active_qp(n=12, m=16, seed=0):
    """A box+general constrained QP with several active rows and skewed
    scaling — steps stay damped long enough for correctors to matter."""
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    P = A @ A.T + 0.1 * np.eye(n)
    q = rng.normal(size=n) * 10.0
    G = rng.normal(size=(m, n))
    h = -np.abs(rng.normal(size=m)) * 0.1        # push rows active
    lb = -np.ones(n)
    ub = np.ones(n)
    return (jnp.asarray(P), jnp.asarray(q), jnp.asarray(G), jnp.asarray(h),
            jnp.asarray(lb), jnp.asarray(ub))


def test_solve_qp_gondzio_correctors_take_effect():
    P, q, G, h, lb, ub = _active_qp()
    ref = qp_lib.solve_qp(P, q, G, h, lb, ub, max_iter=60, tol=1e-10,
                          use_pallas=False)
    assert float(ref.gap) < 1e-9
    few = 4
    plain = qp_lib.solve_qp(P, q, G, h, lb, ub, fixed_iters=few,
                            tol=1e-12, use_pallas=False)
    gond = qp_lib.solve_qp(P, q, G, h, lb, ub, fixed_iters=few,
                           tol=1e-12, correctors=2, use_pallas=False)
    d_plain = float(jnp.linalg.norm(plain.x - ref.x))
    d_gond = float(jnp.linalg.norm(gond.x - ref.x))
    # the corrector path takes different (longer) steps...
    assert d_gond != d_plain
    # ...and after the same few iterations is at least as close to the
    # converged optimum (acceptance requires the step length to grow)
    assert d_gond <= d_plain * 1.05, (d_gond, d_plain)


def test_side_selection_knobs_reach_solver(monkeypatch):
    """The side-selection stacked path's knobs must reach the batched QP:
    candidate solves get side_selection_cand_iters, reselection rounds get
    qp_fixed_iters, correctors/slack-mask plumb through (the same
    no-silent-no-op guarantee the SCP paths have)."""
    from scp_tpu.solvers import miqp

    calls = []
    real = qp_lib.solve_qp_batched

    def rec(*a, **kw):
        calls.append(kw)
        return real(*a, **kw)

    monkeypatch.setattr(qp_lib, "solve_qp_batched", rec)
    cfg, data = batch_lib.make_batch("frog", 2, key=jax.random.PRNGKey(1),
                                     dtype=jnp.float64)
    cfg = cfg.replace(hp=4, hu=4, controller="side_selection",
                      qp_fixed_iters=9, side_selection_cand_iters=5,
                      qp_correctors=1)
    keys = jax.random.split(jax.random.PRNGKey(2), 2)
    carry = jax.vmap(lambda d, k: engine.init_carry(cfg, d, k))(data, keys)
    engine.mpc_step_batch(cfg, data, carry)   # unjitted: recorder runs
    # candidate phase first, then one reselection round
    assert len(calls) == 2
    assert calls[0]["fixed_iters"] == 5, "candidate iters not forwarded"
    assert calls[1]["fixed_iters"] == 9, "final iters not forwarded"
    for kw in calls:
        assert kw["correctors"] == 1
        assert kw["g_slack_mask"] is not None, "slab slack mask missing"
        # hard rate rows are unmasked (0), separation rows masked (1)
        mask = np.asarray(kw["g_slack_mask"])
        n = cfg.n_veh * cfg.hu
        assert mask[-2 * n:].sum() == 0 and mask[:-2 * n].min() == 1


def test_side_selection_knobs_reach_solver_per_instance(monkeypatch):
    """``cli run --controller side_selection`` (mc=1) provably runs the
    TUNED_F32_SIDE_SELECTION calibration: the per-instance path is the
    B=1 view of the stacked solver, so the same knobs reach
    solve_qp_batched (VERDICT r4 next #2 — this path used to drop them
    silently)."""
    from scp_tpu.scenarios import builders

    calls = []
    real = qp_lib.solve_qp_batched

    def rec(*a, **kw):
        calls.append(kw)
        return real(*a, **kw)

    monkeypatch.setattr(qp_lib, "solve_qp_batched", rec)
    cfg, data = builders.frog(dtype=jnp.float64)
    cfg = cfg.replace(hp=4, hu=4, controller="side_selection",
                      qp_fixed_iters=9, side_selection_cand_iters=5,
                      qp_correctors=1)
    carry = engine.init_carry(cfg, data)
    engine.mpc_step(cfg, data, carry)   # unjitted: the recorder runs
    # candidate phase first, then one reselection round — same schedule as
    # the stacked path (it IS the stacked path at B=1)
    assert len(calls) == 2
    assert calls[0]["fixed_iters"] == 5, "candidate iters not forwarded"
    assert calls[1]["fixed_iters"] == 9, "final iters not forwarded"
    for kw in calls:
        assert kw["correctors"] == 1


def test_mpc_step_batch_rejects_phases_for_side_selection():
    """A straggler phase schedule has no meaning for the fixed-round
    side-selection controller — passing one is an error, not a silent
    drop (ADVICE r4)."""
    cfg, data = batch_lib.make_batch("frog", 2, key=jax.random.PRNGKey(3),
                                     dtype=jnp.float64)
    cfg = cfg.replace(hp=4, hu=4, controller="side_selection")
    keys = jax.random.split(jax.random.PRNGKey(4), 2)
    carry = jax.vmap(lambda d, k: engine.init_carry(cfg, d, k))(data, keys)
    with pytest.raises(ValueError, match="side_selection"):
        engine.mpc_step_batch(cfg, data, carry, phases=((2, 1),))


def test_cmd_sweep_rect_obstacles_reaches_geometry(monkeypatch, capsys):
    """``cli sweep --controller side_selection --rect-obstacles`` plumbs
    obstAsQCQP=0 through to rectangle_obstacle_geometry (VERDICT r4
    missing #2: the sweep entry point could not reach that mode)."""
    from scp_tpu import cli
    from scp_tpu.solvers import miqp

    calls = []
    real = miqp.rectangle_obstacle_geometry

    def rec(*a, **kw):
        calls.append(True)
        return real(*a, **kw)

    monkeypatch.setattr(miqp, "rectangle_obstacle_geometry", rec)
    cli.main(["sweep", "--scenario", "frog", "--controller",
              "side_selection", "--rect-obstacles", "--batch", "8",
              "--steps", "1", "--hp", "4", "--f64", "--cpu"])
    assert calls, "rectangle_obstacle_geometry never reached from cmd_sweep"
    out = capsys.readouterr().out
    assert '"feasible_frac"' in out
