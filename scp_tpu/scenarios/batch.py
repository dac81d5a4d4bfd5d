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


def monte_carlo_keys(key: jax.Array, n: int) -> jax.Array:
    """Noise keys for a Monte-Carlo batch over one scenario (config 3)."""
    return jax.random.split(key, n)


def make_batch(kind: str, n: int, key=None, dtype=jnp.float32,
               **kw) -> tuple[SCPConfig, ScenarioData]:
    """Convenience: build a randomized batch of a named scenario family."""
    if key is None:
        key = jax.random.PRNGKey(0)
    cfg, data = builders.BUILDERS[kind](dtype=dtype, **kw)
    if kind == "circle":
        batch = randomize_circle(key, cfg, data, n)
    else:
        batch = tile_scenario(data, n)
    return cfg, batch
