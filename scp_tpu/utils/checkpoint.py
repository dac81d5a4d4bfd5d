"""Checkpoint / resume for long closed-loop sweeps.

The reference has no mid-run checkpointing (SURVEY.md §5) — only the final
JSON dump and the warm-started ``u`` carried between steps. For batched
multi-hour sweeps we checkpoint the scan carry (plant states, command
history, warm starts, PRNG keys) with orbax when available, falling back to
a plain ``.npz`` of the flattened pytree.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _atomic_savez(path: str, **payload) -> None:
    """Write an .npz atomically: temp file in the same directory, then
    ``os.replace``. A kill mid-write must never leave a corrupt checkpoint
    behind — that would defeat the kill/resume feature this file exists for
    (``np.load`` would crash on the truncated file at resume)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if not path.endswith(".npz"):
        path = path + ".npz"  # np.savez force-appends; normalize for replace
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **payload)
    os.replace(tmp, path)


def save(path: str, carry: Any, step: int) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    _atomic_savez(
        path,
        step=np.asarray(step),
        n_leaves=np.asarray(len(leaves)),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load(path: str, carry_like: Any) -> tuple[Any, int]:
    """Restore a carry pytree using ``carry_like`` for structure/dtypes."""
    import jax.numpy as jnp

    leaves_like, treedef = jax.tree_util.tree_flatten(carry_like)
    with np.load(path) as f:
        step = int(f["step"])
        n = int(f["n_leaves"])
        assert n == len(leaves_like), "checkpoint structure mismatch"
        leaves = [jnp.asarray(f[f"leaf_{i}"], leaves_like[i].dtype)
                  for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves), step


def resume_or_init(path: str, init_fn, *args, **kw):
    """Standard resume-or-start pattern for sweep drivers."""
    carry = init_fn(*args, **kw)
    if os.path.exists(path):
        return load(path, carry)
    return carry, 0


# ---- multi-process (jax.distributed) shard checkpoints ----
#
# In a multi-process job no process can materialize a globally-sharded
# array (np.asarray raises on non-addressable shards), so each process
# writes its OWN contiguous block of every leaf — with the block's global
# offset — and resume rebuilds the global arrays with
# ``jax.make_array_from_callback``, which asks each process only for its
# locally-addressable index ranges. The reference has no analogue (its
# only persistence is the end-of-run JSON dump, main.py:226-231).


def proc_path(path: str, process_index: int | None = None) -> str:
    """Per-process checkpoint filename (``<base>.proc<k>.npz`` — np.savez
    force-appends .npz to names without it, so keep it last)."""
    if process_index is None:
        process_index = jax.process_index()
    base = path[:-4] if path.endswith(".npz") else path
    return f"{base}.proc{process_index}.npz"


def _local_block(x) -> tuple[np.ndarray, int]:
    """(concatenated addressable block, global axis-0 offset) of a jax
    Array sharded over its leading axis. Requires the process's shards to
    be contiguous along axis 0 (true for meshes built from jax.devices()
    order, whose device list is process-major)."""
    shards = sorted(x.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    start = shards[0].index[0].start or 0
    stop = shards[-1].index[0].stop
    stop = x.shape[0] if stop is None else stop
    block = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    assert block.shape[0] == stop - start, (
        "non-contiguous local shards; per-process checkpointing assumes "
        "a process-major 'data' axis layout")
    return block, start


def save_sharded(path: str, carry: Any, step: int) -> None:
    """Write THIS process's shard blocks of a data-sharded carry pytree."""
    leaves, _ = jax.tree_util.tree_flatten(carry)
    payload = {"step": np.asarray(step),
               "n_leaves": np.asarray(len(leaves)),
               "process_index": np.asarray(jax.process_index()),
               "process_count": np.asarray(jax.process_count())}
    for i, leaf in enumerate(leaves):
        block, start = _local_block(leaf)
        payload[f"leaf_{i}"] = block
        payload[f"start_{i}"] = np.asarray(start)
        payload[f"gshape_{i}"] = np.asarray(leaf.shape)
    _atomic_savez(proc_path(path), **payload)


def load_sharded(path: str, carry_like: Any, sharding) -> tuple[Any, int]:
    """Rebuild a globally-sharded carry from THIS process's shard file.

    ``carry_like`` supplies structure/dtypes; ``sharding`` is the
    NamedSharding the restored arrays should carry (the sweep's
    ``P("data")`` placement). Every process must call this with the same
    mesh it used when saving.
    """
    import jax.numpy as jnp

    leaves_like, treedef = jax.tree_util.tree_flatten(carry_like)
    with np.load(proc_path(path)) as f:
        step = int(f["step"])
        n = int(f["n_leaves"])
        assert n == len(leaves_like), "checkpoint structure mismatch"
        assert int(f["process_count"]) == jax.process_count(), (
            "checkpoint written with a different process count")
        leaves = []
        for i, like in enumerate(leaves_like):
            block = np.asarray(f[f"leaf_{i}"], like.dtype)
            start = int(f[f"start_{i}"])
            gshape = tuple(int(s) for s in f[f"gshape_{i}"])

            def cb(idx, block=block, start=start):
                lo = idx[0].start or 0
                hi = idx[0].stop
                return block[(slice(lo - start,
                                    None if hi is None else hi - start),)
                             + tuple(idx[1:])]

            leaves.append(jax.make_array_from_callback(gshape, sharding, cb))
    return jax.tree_util.tree_unflatten(treedef, leaves), step
