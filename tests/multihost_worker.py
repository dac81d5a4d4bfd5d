"""Worker process for the 2-process jax.distributed CPU test.

Run as: python multihost_worker.py <coordinator_port> <process_id>

Each process exposes 4 virtual CPU devices; ``jax.distributed.initialize``
joins them into one 8-device job. The worker drives
``scp_tpu.parallel.distributed.sweep`` over the global (data,) mesh and
prints the psum-reduced summary — the parent test asserts both processes
print the identical value that a single-process 8-device run produces.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    port, pid = int(sys.argv[1]), int(sys.argv[2])
    mode = sys.argv[3] if len(sys.argv) > 3 else "sweep"
    from scp_tpu.parallel import distributed

    distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    import numpy as np

    import jax.numpy as jnp
    from scp_tpu.scenarios import batch as batch_lib

    cfg, data = batch_lib.make_batch("circle", 16, key=jax.random.PRNGKey(5),
                                     dtype=jnp.float64, n_veh=3)
    cfg = cfg.replace(hp=5, hu=5, max_scp_iter=2, qp_max_iter=8)
    mesh = distributed.global_mesh()

    if mode == "ckpt":
        # Per-process shard checkpoint kill/resume equivalence (VERDICT r2
        # item 5): run 6 uninterrupted steps; then a 3-step checkpointed
        # run (the "killed" job) and a resumed 6-step run; the resumed
        # final carry must equal the uninterrupted one bitwise.
        path = sys.argv[4]
        carries_ref, _ = distributed.sweep(cfg, data, mesh, n_steps=6)
        distributed.sweep(cfg, data, mesh, n_steps=3, checkpoint_path=path,
                          checkpoint_every=3)
        from scp_tpu.utils import checkpoint as ckpt_lib
        with np.load(ckpt_lib.proc_path(path)) as f:
            assert int(f["step"]) == 3, int(f["step"])
        carries, _ = distributed.sweep(cfg, data, mesh, n_steps=6,
                                       checkpoint_path=path,
                                       checkpoint_every=3)
        for a, b in zip(jax.tree_util.tree_leaves(carries),
                        jax.tree_util.tree_leaves(carries_ref)):
            # compare the locally-addressable blocks (the global arrays
            # are not materializable on one process)
            la = np.concatenate([np.asarray(s.data)
                                 for s in a.addressable_shards])
            lb = np.concatenate([np.asarray(s.data)
                                 for s in b.addressable_shards])
            np.testing.assert_array_equal(la, lb)
        with np.load(ckpt_lib.proc_path(path)) as f:
            assert int(f["step"]) == 6, int(f["step"])
        print("CKPT_OK", flush=True)
        return

    carries, summary = distributed.sweep(cfg, data, mesh, n_steps=2)
    total_obj, total_feas, total_iters = summary
    # fully-replicated outputs are addressable on every process
    print("SUMMARY",
          " ".join(f"{v:.17g}" for v in list(map(float, total_obj))
                   + list(map(float, total_feas))
                   + list(map(float, total_iters))),
          flush=True)


if __name__ == "__main__":
    main()
