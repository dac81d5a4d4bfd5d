"""Scenario-batch generation: thousands of randomized instances as one pytree.

New TPU-native capability (BASELINE.json configs 3-5): the reference runs one
scenario per process; here a batch of S instances is a single ``ScenarioData``
with a leading axis, consumed by ``vmap``-ed solvers and sharded across
meshes. Randomization perturbs initial conditions within a scenario family so
one compiled solver serves the whole batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from scp_tpu.config import SCPConfig, ScenarioData
from scp_tpu.scenarios import builders


def stack_scenarios(datas: list[ScenarioData]) -> ScenarioData:
    """Stack same-shape ScenarioData instances along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *datas)


def tile_scenario(data: ScenarioData, n: int) -> ScenarioData:
    """Repeat one instance n times (cheap: broadcast + copy once)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n,) + x.shape), data)


def randomize_circle(key: jax.Array, cfg: SCPConfig, data: ScenarioData,
                     n: int, *, pos_jitter: float = 0.5,
                     heading_jitter: float = 0.05,
                     speed_jitter: float = 0.2) -> ScenarioData:
    """Batch of n perturbed copies of a circle scenario.

    Initial positions/headings/speeds are jittered; reference lines and
    safety distances are kept (dsafe uses nominal speeds — consistent with
    the reference, which computes them once from ``x0`` at setup,
    Scenarios.py:229-252).
    """
    batch = tile_scenario(data, n)
    k1, k2, k3 = jax.random.split(key, 3)
    v = cfg.n_veh
    dtype = data.x0.dtype
    dpos = pos_jitter * jax.random.normal(k1, (n, v, 2), dtype)
    dhead = heading_jitter * jax.random.normal(k2, (n, v), dtype)
    dspeed = speed_jitter * jax.random.normal(k3, (n, v), dtype)
    x0 = batch.x0
    x0 = x0.at[:, :, 0:2].add(dpos)
    x0 = x0.at[:, :, 2].add(dhead)
    x0 = x0.at[:, :, 3].add(dspeed)
    return ScenarioData(
        x0=x0, u0=batch.u0, params=batch.params,
        ref_points=batch.ref_points, ref_valid=batch.ref_valid,
        obstacles=batch.obstacles, dsafe_veh=batch.dsafe_veh,
        dsafe_obst=batch.dsafe_obst)


def randomize_frog(key: jax.Array, cfg: SCPConfig, data: ScenarioData,
                   n: int, *, phase_jitter: float = 2.0,
                   start_jitter: float = 0.5,
                   speed_jitter: float = 0.2) -> ScenarioData:
    """Batch of n perturbed frog-crossing instances.

    The frog scenario's difficulty is set by the *phase* of the moving
    obstacle columns relative to the vehicle (Scenarios.py:127-146): each
    obstacle's initial y is jittered (a pure phase shift along its motion
    direction), plus vehicle start-x and speed jitter. Safety distances stay
    nominal, consistent with the reference computing them once at setup.
    """
    batch = tile_scenario(data, n)
    k1, k2, k3 = jax.random.split(key, 3)
    dtype = data.x0.dtype
    n_obst = data.obstacles.shape[0]
    dphase = _tnorm(k1, (n, n_obst), dtype, phase_jitter)
    dx = _tnorm(k2, (n, cfg.n_veh), dtype, start_jitter)
    dspeed = _tnorm(k3, (n, cfg.n_veh), dtype, speed_jitter)
    obstacles = batch.obstacles.at[:, :, builders.OBST_Y].add(dphase)
    x0 = batch.x0.at[:, :, 0].add(dx)
    x0 = x0.at[:, :, 3].add(dspeed)
    return ScenarioData(
        x0=x0, u0=batch.u0, params=batch.params,
        ref_points=batch.ref_points, ref_valid=batch.ref_valid,
        obstacles=obstacles, dsafe_veh=batch.dsafe_veh,
        dsafe_obst=batch.dsafe_obst)


def _tnorm(key, shape, dtype, scale):
    """Truncated (±2σ) normal jitter — unbounded tails would let rare
    instances consume a scenario's entire initial-feasibility margin."""
    return scale * jnp.clip(jax.random.normal(key, shape, dtype), -2.0, 2.0)


def randomize_parallel(key: jax.Array, cfg: SCPConfig, data: ScenarioData,
                       n: int, *, start_jitter: float = 0.6,
                       lane_shift_jitter: float = 0.2,
                       obst_jitter: float = 0.2,
                       speed_jitter: float = 0.04) -> ScenarioData:
    """Batch of n perturbed parallel-lane instances.

    Vehicle start-x jitter staggers lane entries, a COMMON y shift moves the
    whole lane set relative to the (independently jittered) static obstacles,
    and small speed jitter changes conflict timing. Lane y-spacing itself is
    untouched: the 3.0 m spacing sits just outside dsafe+extra (~2.97 m), so
    independent per-lane y jitter would create infeasible-at-start batches
    (Scenarios.py:148-201). Jitter scales are sized so the worst ±2σ draw
    stays inside the ~2.1 m step-0 margin between the y=5 lane's horizon
    reach and the first obstacle (tests/test_batch.py pins this).
    """
    batch = tile_scenario(data, n)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dtype = data.x0.dtype
    v, n_obst = cfg.n_veh, data.obstacles.shape[0]
    dx = _tnorm(k1, (n, v), dtype, start_jitter)
    dlane = _tnorm(k2, (n,), dtype, lane_shift_jitter)
    dobst = _tnorm(k3, (n, n_obst, 2), dtype, obst_jitter)
    dspeed = _tnorm(k4, (n, v), dtype, speed_jitter)
    x0 = batch.x0.at[:, :, 0].add(dx)
    x0 = x0.at[:, :, 1].add(dlane[:, None])
    x0 = x0.at[:, :, 3].add(dspeed)
    ref_points = batch.ref_points.at[:, :, :, 1].add(dlane[:, None, None])
    obstacles = batch.obstacles.at[:, :, :2].add(dobst)
    return ScenarioData(
        x0=x0, u0=batch.u0, params=batch.params,
        ref_points=ref_points, ref_valid=batch.ref_valid,
        obstacles=obstacles, dsafe_veh=batch.dsafe_veh,
        dsafe_obst=batch.dsafe_obst)


def monte_carlo_keys(key: jax.Array, n: int) -> jax.Array:
    """Noise keys for a Monte-Carlo batch over one scenario (config 3)."""
    return jax.random.split(key, n)


RANDOMIZERS = {
    "circle": randomize_circle,
    "frog": randomize_frog,
    "parallel": randomize_parallel,
}


def make_batch(kind: str, n: int, key=None, dtype=jnp.float32,
               **kw) -> tuple[SCPConfig, ScenarioData]:
    """Convenience: build a randomized batch of a named scenario family."""
    if key is None:
        key = jax.random.PRNGKey(0)
    cfg, data = builders.BUILDERS[kind](dtype=dtype, **kw)
    batch = RANDOMIZERS[kind](key, cfg, data, n)
    return cfg, batch
