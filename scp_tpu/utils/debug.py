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


def scp_iteration_trace(cfg, data, carry=None) -> dict:
    """Per-SCP-iteration optimization trace for ONE scenario instance.

    The opt-in debug analog of the reference's per-iteration merit
    printout and ``optimization_log`` (SCP_controller.py:88-189,162):
    runs the controller preprocessing for the given (unbatched) scenario
    state and solves the SCP with ``trace=True``, returning host numpy
    arrays truncated to the iterations that actually ran:

    ``{"obj", "max_violation", "merit", "delta", "qp_converged",
    "iters", "u", "feasible"}``.

    ``carry``: a :class:`scp_tpu.sim.engine.SimCarry` mid-run state (e.g.
    sliced out of a batched sweep at the misbehaving step); defaults to
    the initial state.
    """
    from scp_tpu.sim import engine
    from scp_tpu.solvers import scp as scp_lib

    assert cfg.controller == "scp", "the trace records the SCP loop"
    if carry is None:
        carry = engine.init_carry(cfg, data)
    problem, _ = engine.controller_pre(cfg, data, carry)
    res, tr = scp_lib.solve_scp(problem, carry.u_warm,
                                max_scp_iter=cfg.max_scp_iter,
                                trace=True, **engine._scp_kwargs(cfg))
    n_it = int(np.sum(np.asarray(tr.active)))
    out = {k: np.asarray(v)[:n_it] for k, v in tr._asdict().items()
           if k != "active"}
    out.update(iters=n_it, u=np.asarray(res.u),
               feasible=bool(res.feasible))
    return out
