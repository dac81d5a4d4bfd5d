"""Multi-host initialization and sharded sweep driver.

The reference is single-process (SURVEY.md §2/§5); this is the TPU-native
scale-out path for BASELINE.json config 5 (64k concurrent solves across a
multi-host v5e slice): ``jax.distributed`` process bootstrap, a
(hosts x local-chips) mesh with the scenario axis across DCN and ICI
collectives inside, and a checkpointing sweep loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scp_tpu.parallel import mesh as mesh_lib


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bootstrap jax.distributed (no-op for single-process runs).

    On Cloud TPU the arguments are auto-detected from the metadata server;
    pass them explicitly elsewhere.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)


def global_mesh(n_model: int = 1) -> Mesh:
    """(data, model) mesh over ALL devices in the job (all hosts).

    The 'data' (scenario) axis spans hosts — neighboring shards on the same
    host communicate over ICI, cross-host reductions ride DCN. Construct
    identical meshes on every process.
    """
    return mesh_lib.make_mesh(n_model=n_model, devices=jax.devices())


def sweep(cfg, data_batch, mesh: Mesh, *, n_steps: int, keys=None,
          checkpoint_path: str | None = None, checkpoint_every: int = 0):
    """Run a sharded closed-loop sweep over a scenario batch.

    ``data_batch`` leading axis is sharded over the mesh's 'data' axis; the
    returned per-step summary metrics are psum-reduced across all shards
    (the SCP convergence-voting collective). Optionally checkpoints the scan
    carry every ``checkpoint_every`` steps via scp_tpu.utils.checkpoint.
    """
    from jax.experimental.shard_map import shard_map

    from scp_tpu.sim import engine
    from scp_tpu.utils import checkpoint

    n = jax.tree_util.tree_leaves(data_batch)[0].shape[0]
    if keys is None:
        keys = jax.random.split(jax.random.PRNGKey(0), n)

    def per_instance(d, key):
        carry = engine.init_carry(cfg, d, key)

        def step(c, _):
            c2, out = engine.mpc_step(cfg, d, c)
            return c2, (out.obj, out.feasible.astype(jnp.float32),
                        out.scp_iters)

        return jax.lax.scan(step, carry, None, length=n_steps)

    def per_shard(batch, ks):
        carries, metrics = jax.vmap(per_instance)(batch, ks)
        objs, feas, iters = metrics
        summary = (
            jax.lax.psum(jnp.sum(objs, axis=0), ("data", "model")),
            jax.lax.psum(jnp.sum(feas, axis=0), ("data", "model")),
            jax.lax.psum(jnp.sum(iters, axis=0), ("data", "model")),
        )
        return carries, summary

    run = jax.jit(shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=(P("data"), (P(), P(), P())),
        check_rep=False))

    batch = mesh_lib.shard_batch(data_batch, mesh)
    keys_sharded = jax.device_put(keys, NamedSharding(mesh, P("data")))
    carries, summary = run(batch, keys_sharded)
    if checkpoint_path and checkpoint_every:
        checkpoint.save(checkpoint_path, carries, n_steps)
    return carries, summary
