"""Randomized cross-scenario invariant checks on the full MPC step.

Property-based complement to the golden tests: over randomized instances of
all three scenario families (and an extra-large vehicle count), every step
must satisfy the invariants the reference enforces imperatively —
steering magnitude/rate limits after the clamps (main.py:164-174), finite
outputs, consistency between the reported feasibility flags and the actual
predicted distances, and monotone non-negative diagnostics.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scp_tpu.scenarios import batch as batch_lib
from scp_tpu.sim import engine


def _check_invariants(cfg, data, out, n_steps):
    u_pred = np.asarray(out.u_pred)          # (S, B, HP, V) when batched
    states = np.asarray(out.states)
    feas = np.asarray(out.feasible)
    # finite everything
    for name in ("states", "u_pred", "obj", "max_violation", "pred_obj"):
        assert np.isfinite(np.asarray(getattr(out, name))).all(), name
    # clamped steering magnitude: |u| <= mechanical limit (the dynamic
    # limit can only be smaller; it is state-dependent so the mechanical
    # bound is the loose invariant)
    assert np.abs(u_pred).max() <= cfg.mechanical_steering_limit + 1e-9
    # rate limit along the horizon after sequential clamps
    du = np.abs(np.diff(u_pred, axis=-2))
    assert du.max() <= cfg.du_lim + 1e-9
    # feasibility flag vs actual predicted pairwise distances: whenever the
    # solver says feasible, the predicted trajectory keeps (dsafe + extra)
    # up to the constraint tolerance
    traj = np.asarray(out.traj_pred)          # (S, B, HP, NY, V)
    dsafe = np.asarray(data.dsafe_veh)        # (B, V, V)
    v = traj.shape[-1]
    for i in range(v):
        for j in range(i + 1, v):
            d = np.linalg.norm(traj[..., i] - traj[..., j], axis=-1)  # (S,B,HP)
            lim = (dsafe[:, i, j] + cfg.dsafe_extra)[None, :, None]
            viol = (lim**2 - d**2) > cfg.constraint_tolerance + 1e-6
            bad = viol.any(axis=-1) & feas.astype(bool)
            assert not bad.any(), f"feasible flag vs distance: pair {i},{j}"
    # diagnostics are counts
    assert (np.asarray(out.scp_iters) >= 0).all()
    assert (np.asarray(out.qp_iters) >= 0).all()
    assert (np.asarray(out.clamp_mag_events) >= 0).all()


@pytest.mark.parametrize("kind,n_veh", [
    ("circle", 3), ("circle", 16), ("frog", 1), ("parallel", 6),
])
def test_randomized_step_invariants(kind, n_veh):
    kw = {"n_veh": n_veh} if kind != "frog" else {}
    cfg, data = batch_lib.make_batch(
        kind, 6, key=jax.random.PRNGKey(n_veh), dtype=jnp.float64, **kw)
    cfg = cfg.replace(hp=5, hu=5, max_scp_iter=4, qp_max_iter=12,
                      noise_std=1e-4)
    keys = jax.random.split(jax.random.PRNGKey(99), 6)
    carry, out = jax.jit(functools.partial(
        engine.simulate_batch, cfg, n_steps=3))(data, keys)
    _check_invariants(cfg, data, out, 3)


def test_randomized_step_invariants_side_selection():
    cfg, data = batch_lib.make_batch(
        "frog", 4, key=jax.random.PRNGKey(3), dtype=jnp.float64)
    cfg = cfg.replace(hp=5, hu=5, qp_max_iter=20,
                      controller="side_selection")
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    carry, out = jax.jit(functools.partial(
        engine.simulate_batch, cfg, n_steps=3))(data, keys)
    # side-selection feasibility is evaluated at raw dsafe (reference MIQP
    # parity), so only the control-limit/finite invariants apply here
    assert np.isfinite(np.asarray(out.states)).all()
    u_pred = np.asarray(out.u_pred)
    assert np.abs(u_pred).max() <= cfg.mechanical_steering_limit + 1e-9
    assert np.abs(np.diff(u_pred, axis=-2)).max() <= cfg.du_lim + 1e-9
    assert np.asarray(out.feasible).all()
