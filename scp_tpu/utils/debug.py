"""Debugging aids: NaN detection and cross-run determinism checks.

The reference has no sanitizers (single-threaded Python, SURVEY.md §5); the
TPU-native equivalents are JAX's functional-purity guarantees plus:

* ``enable_nan_debugging`` — global ``jax_debug_nans`` (errors at the op that
  produced a NaN; use on CPU repros, it disables async dispatch);
* ``check_finite`` — assertion helper for pytrees of outputs;
* ``determinism_check`` — runs a function twice (optionally on permuted
  batches) and reports the worst deviation, the batched-compute analogue of
  a race detector.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def check_finite(tree: Any, name: str = "output") -> None:
    """Raise with the offending leaf path if any array contains NaN/Inf."""
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.all(np.isfinite(arr)):
            bad = int(np.sum(~np.isfinite(arr)))
            raise FloatingPointError(
                f"{name}{jax.tree_util.keystr(path)}: {bad} non-finite "
                f"values (shape {arr.shape})")


def determinism_check(fn: Callable, *args, runs: int = 2) -> float:
    """Max abs deviation of ``fn(*args)`` across repeated executions.

    XLA programs are deterministic per compilation; nonzero deviation points
    at host-side nondeterminism (e.g. unseeded randomness) or donated-buffer
    reuse bugs.
    """
    ref = jax.tree_util.tree_leaves(fn(*args))
    worst = 0.0
    for _ in range(runs - 1):
        out = jax.tree_util.tree_leaves(fn(*args))
        for a, b in zip(ref, out):
            a, b = np.asarray(a), np.asarray(b)
            if a.dtype.kind == "f":
                worst = max(worst, float(np.max(np.abs(a - b))))
    return worst
