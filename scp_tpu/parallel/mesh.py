"""Device-mesh helpers and sharded batch execution.

The reference is strictly single-process (SURVEY.md §2: no MPI/NCCL/threads);
scale-out is new TPU-native capability: scenario batches shard across a
``jax.sharding.Mesh`` ('data' axis; DCN across hosts), while reductions for
whole-batch diagnostics ride ICI collectives inside ``shard_map``
(``jax.lax.psum`` — the TPU-native analogue of the convergence voting a
distributed SCP would need).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data < 1:
        raise ValueError(
            f"n_model={n_model} needs at least that many devices; "
            f"have {len(devices)}")
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def shard_batch(tree, mesh: Mesh):
    """Place a batched pytree with the leading axis sharded over 'data'.

    Works in multi-process jobs too: when the mesh spans processes, every
    process passes the same full (host-replicated) array and
    ``make_array_from_callback`` places only the locally-addressable shards
    — the standard SPMD ingestion pattern for `jax.distributed` jobs.
    """
    sharding = NamedSharding(mesh, P("data"))
    multiprocess = jax.process_count() > 1
    n_data = int(mesh.shape["data"])
    n = jax.tree_util.tree_leaves(tree)[0].shape[0]
    if n % n_data != 0:
        raise ValueError(
            f"batch size {n} is not divisible by the mesh's data axis "
            f"({n_data} shards); pad the batch or resize the mesh "
            f"(e.g. make_mesh(n_data=...))")

    def put(x):
        if not multiprocess:
            return jax.device_put(x, sharding)
        x_np = np.asarray(x)
        return jax.make_array_from_callback(
            x_np.shape, sharding, lambda idx: x_np[idx])

    return jax.tree_util.tree_map(put, tree)


def sharded_batch_run(fn: Callable, mesh: Mesh, *, reduce_metrics=True):
    """Wrap a per-instance ``fn(tree) -> (outputs, metrics)`` into a
    data-sharded batch runner.

    ``fn`` is vmapped inside each shard (pure data parallelism over the
    scenario axis) and, when ``reduce_metrics``, scalar metrics are globally
    ``psum``-reduced across shards — one collective per metric tensor.
    """
    from jax.experimental.shard_map import shard_map

    def per_shard(batch):
        out, metrics = jax.vmap(fn)(batch)
        if reduce_metrics:
            metrics = jax.tree_util.tree_map(
                lambda m: jax.lax.psum(jnp.sum(m, axis=0), "data"), metrics)
        return out, metrics

    in_specs = (P("data"),)
    out_specs = (P("data"), P() if reduce_metrics else P("data"))
    return jax.jit(shard_map(per_shard, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=False))
