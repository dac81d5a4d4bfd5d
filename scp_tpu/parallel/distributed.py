"""Multi-host initialization and sharded sweep driver.

The reference is single-process (SURVEY.md §2/§5); this is the TPU-native
scale-out path for BASELINE.json config 5 (64k concurrent solves across a
multi-host v5e slice): ``jax.distributed`` process bootstrap, a
(hosts x local-chips) mesh with the scenario axis across DCN and ICI
collectives inside, and a checkpointing sweep loop.
"""
from __future__ import annotations

import functools
import os
from typing import Any

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
          checkpoint_path: str | None = None, checkpoint_every: int = 0,
          resume: bool = True, phases=None):
    """Run a sharded closed-loop sweep over a scenario batch.

    ``data_batch`` leading axis is sharded over the mesh's 'data' axis; the
    returned per-step summary metrics are psum-reduced across all shards
    (the SCP convergence-voting collective).

    ``phases`` (e.g. ``config.TUNED_F32_PHASES``): run each step through
    the straggler-repacked batched SCP (``engine.mpc_step_batch``) per
    shard instead of per-instance ``mpc_step`` — the bench-calibrated
    production path (fused TPU QP + repacking; see BENCHMARKS.md).
    Equivalent up to the straggler-capacity note in ``solve_scp_batch``;
    incompatible with a model axis (the horizon-sharded step is
    per-instance).

    Checkpointing: with ``checkpoint_every = k > 0`` the scan runs in
    k-step chunks and the carry pytree is saved after every chunk (plus a
    final partial chunk). With ``resume`` (default) an existing checkpoint
    at ``checkpoint_path`` restarts the sweep from its saved step;
    continuation is exact — the carry holds the plant states, command
    history, warm starts and PRNG keys, so a resumed run's final state is
    bitwise equal to an uninterrupted one (tests/test_parallel.py).

    Returns ``(carries, summary)`` where each summary metric has a leading
    (n_steps,) axis; on resume, steps before the checkpoint are zero-filled
    (they were reported by the interrupted run).
    """
    from jax.experimental.shard_map import shard_map

    from scp_tpu.sim import engine
    from scp_tpu.utils import checkpoint

    multiprocess = jax.process_count() > 1
    n = jax.tree_util.tree_leaves(data_batch)[0].shape[0]
    if keys is None:
        keys = jax.random.split(jax.random.PRNGKey(0), n)

    batch = mesh_lib.shard_batch(data_batch, mesh)
    keys_sharded = mesh_lib.shard_batch(keys, mesh)

    init = jax.jit(shard_map(
        jax.vmap(lambda d, k: engine.init_carry(cfg, d, k)),
        mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=P("data"), check_rep=False))
    carries = init(batch, keys_sharded)

    # Multi-process jobs checkpoint per-process shard blocks
    # (<path>.proc<k>, utils.checkpoint.save_sharded): no process can
    # materialize the global carry, and resume rebuilds it with
    # make_array_from_callback against the same mesh.
    data_sharding = NamedSharding(mesh, P("data"))
    if multiprocess:
        ckpt_save = checkpoint.save_sharded
        ckpt_exists = (lambda p: os.path.exists(checkpoint.proc_path(p)))
        ckpt_load = (lambda p, like: checkpoint.load_sharded(
            p, like, data_sharding))
    else:
        ckpt_save = checkpoint.save
        ckpt_exists = os.path.exists
        ckpt_load = checkpoint.load

    start = 0
    if checkpoint_path and resume and multiprocess:
        # Processes must AGREE on the resume step: a kill landing between
        # the per-process savez calls (or a missing file on one host) would
        # otherwise resume processes from different steps — divergent
        # collectives that hang or silently corrupt results. All-gather
        # each process's locally-visible step (-1 = missing) and resume
        # only when every process reports the same non-negative step;
        # anything else restarts from 0 (correct: continuation is exact,
        # the interrupted chunk is simply recomputed).
        import numpy as np
        local_step = -1
        if ckpt_exists(checkpoint_path):
            with np.load(checkpoint.proc_path(checkpoint_path)) as f:
                local_step = int(f["step"])
        from jax.experimental import multihost_utils
        all_steps = np.asarray(multihost_utils.process_allgather(
            jnp.asarray([local_step], jnp.int32))).ravel()
        if all_steps.min() == all_steps.max() and all_steps[0] >= 0:
            carries, start = ckpt_load(checkpoint_path, carries)
    elif checkpoint_path and resume and ckpt_exists(checkpoint_path):
        loaded, start = ckpt_load(checkpoint_path, carries)
        carries = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, data_sharding), loaded)

    n_model = int(mesh.shape.get("model", 1))
    if n_model > 1 and cfg.controller != "scp":
        raise ValueError(
            f"n_model={n_model} requires the SCP controller (horizon "
            f"sharding); got controller={cfg.controller!r}")
    if phases is not None and n_model > 1:
        raise ValueError("phases (batched stepping) is incompatible with "
                         "a model axis; use n_model=1 or phases=None")

    def make_run(length: int):
        def per_instance(d, carry):
            def step(c, _):
                # With a model axis the SCP solve is horizon-sharded
                # (engine.mpc_step_horizon): each model shard holds only its
                # hp/n_model block of constraint rows, psum-glued per IPM
                # factorization; outputs are replicated over 'model'. The
                # plain step replicated over 'model' would double-count
                # every psum-reduced metric below (VERDICT r2 weak #1).
                if n_model > 1:
                    c2, out = engine.mpc_step_horizon(
                        cfg, d, c, axis_name="model", n_shards=n_model)
                else:
                    c2, out = engine.mpc_step(cfg, d, c)
                return c2, (out.obj, out.feasible.astype(jnp.float32),
                            out.scp_iters)

            return jax.lax.scan(step, carry, None, length=length)

        def per_shard_batched(b, cs):
            def step(c, _):
                c2, out = engine.mpc_step_batch(cfg, b, c, phases=phases)
                return c2, (jnp.sum(out.obj),
                            jnp.sum(out.feasible.astype(jnp.float32)),
                            jnp.sum(out.scp_iters))

            carries, metrics = jax.lax.scan(step, cs, None, length=length)
            summary = tuple(jax.lax.psum(m, "data") for m in metrics)
            return carries, summary

        def per_shard(b, cs):
            if phases is not None:
                return per_shard_batched(b, cs)
            carries, metrics = jax.vmap(per_instance)(b, cs)
            objs, feas, iters = metrics
            # Reduce over 'data' ONLY: results are replicated over 'model'
            # (either trivially at n_model=1 or by the horizon-sharded
            # solver's own collectives), so a ('data','model') psum would
            # multiply every total by n_model.
            summary = (
                jax.lax.psum(jnp.sum(objs, axis=0), "data"),
                jax.lax.psum(jnp.sum(feas, axis=0), "data"),
                jax.lax.psum(jnp.sum(iters, axis=0), "data"),
            )
            return carries, summary

        return jax.jit(shard_map(
            per_shard, mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=(P("data"), (P(), P(), P())),
            check_rep=False))

    chunk = checkpoint_every if checkpoint_every > 0 else n_steps - start
    chunks: list[tuple[Any, Any, Any]] = []
    step = start
    run_full = None
    while step < n_steps:
        k = min(chunk, n_steps - step)
        if k == chunk:
            if run_full is None:
                run_full = make_run(chunk)
            run = run_full
        else:
            run = make_run(k)           # final partial chunk (one recompile)
        carries, summ = run(batch, carries)
        step += k
        if checkpoint_path and checkpoint_every:
            ckpt_save(checkpoint_path, carries, step)
        chunks.append(summ)

    if not chunks:
        z = jnp.zeros((0,), jnp.float32)
        summary = (z, z, jnp.zeros((0,), jnp.int32))
    else:
        summary = tuple(jnp.concatenate(parts, axis=0)
                        for parts in zip(*chunks))
    if start > 0:
        # pad the resumed summary so the step axis stays (n_steps,)
        summary = tuple(
            jnp.concatenate([jnp.zeros((start,) + s.shape[1:], s.dtype), s])
            for s in summary)
    return carries, summary
