"""Weak-scaling measurement on a virtual device mesh.

No multi-chip hardware is available in this environment, so this measures
the sharded sweep path (scp_tpu.parallel.distributed.sweep: shard_map over
the 'data' axis, psum-reduced convergence metrics) on N virtual CPU
devices. Virtual devices share the host's cores, so the numbers UNDERSTATE
real-TPU efficiency — the only true cross-device cost is the per-sweep
psum of three scalars.

    python scripts/scaling_virtual.py [n_devices=8] [per_device=64]
"""
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8
PER_DEV = int(sys.argv[2]) if len(sys.argv) > 2 else 64
jax.config.update("jax_num_cpu_devices", N_DEV)

import jax.numpy as jnp  # noqa: E402

from scp_tpu.parallel import distributed, mesh as mesh_lib  # noqa: E402
from scp_tpu.scenarios import batch as batch_lib  # noqa: E402


def run_scaling(n_dev, per_dev, n_steps=3):
    devs = jax.devices()[:n_dev]
    mesh = mesh_lib.make_mesh(n_data=n_dev, n_model=1, devices=devs)
    cfg, data = batch_lib.make_batch(
        "circle", per_dev * n_dev, key=jax.random.PRNGKey(3),
        dtype=jnp.float32, n_veh=3)
    cfg = cfg.replace(hp=8, hu=8, max_scp_iter=6, qp_fixed_iters=8,
                      delta_tol_rel=1e-4, u_step_tol=1e-5)
    carries, _ = distributed.sweep(cfg, data, mesh, n_steps=n_steps)
    jax.block_until_ready(carries)  # compile
    t0 = time.time()
    carries, summary = distributed.sweep(cfg, data, mesh, n_steps=n_steps)
    jax.block_until_ready(carries)
    dt = time.time() - t0
    return per_dev * n_dev * n_steps / dt, float(summary[1][-1])


def main():
    base = None
    n = 1
    while n <= N_DEV:
        rate, feas = run_scaling(n, PER_DEV)
        if base is None:
            base = rate
        eff = rate / (base * n) * 100
        print(f"devices={n}: {rate:8.1f} sim-steps/s  "
              f"weak-scaling eff {eff:5.1f}%  feasible {feas:.0f}")
        n *= 2


if __name__ == "__main__":
    main()
