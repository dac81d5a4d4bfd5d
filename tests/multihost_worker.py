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
    from scp_tpu.parallel import distributed

    distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    import jax.numpy as jnp
    from scp_tpu.scenarios import batch as batch_lib

    cfg, data = batch_lib.make_batch("circle", 16, key=jax.random.PRNGKey(5),
                                     dtype=jnp.float64, n_veh=3)
    cfg = cfg.replace(hp=5, hu=5, max_scp_iter=2, qp_max_iter=8)
    mesh = distributed.global_mesh()
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
