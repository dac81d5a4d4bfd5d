"""BASELINE.json config-5-shaped demonstration: a 64k-instance sweep.

Runs ``distributed.sweep`` — the production batched/sharded/checkpointed
closed-loop driver — over 65,536 randomized circle instances on the
8-device virtual CPU mesh (f32, short horizon), with periodic
checkpointing, and reports wall clock, peak RSS, and the feasibility
fraction. Proves the batching, sharding, and checkpoint machinery at the
north-star batch scale without multi-chip hardware; results recorded in
BENCHMARKS.md.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/sweep_64k.py [batch] [steps]
"""
import json
import os
import resource
import sys
import tempfile
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from scp_tpu import config as config_lib  # noqa: E402
from scp_tpu.parallel import distributed  # noqa: E402
from scp_tpu.scenarios import batch as batch_lib  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    t0 = time.time()
    cfg, data = batch_lib.make_batch(
        "circle", batch, key=jax.random.PRNGKey(0), dtype=jnp.float32,
        n_veh=2)
    cfg = config_lib.tuned_f32(cfg.replace(hp=4, hu=4, max_scp_iter=4))
    gen_s = time.time() - t0

    mesh = distributed.global_mesh()
    ckpt = os.path.join(tempfile.mkdtemp(), "sweep64k.npz")
    t0 = time.time()
    carries, (objs, feas, iters) = distributed.sweep(
        cfg, data, mesh, n_steps=steps,
        checkpoint_path=ckpt, checkpoint_every=max(steps // 2, 1))
    wall = time.time() - t0

    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    result = {
        "batch": batch,
        "steps": steps,
        "mesh": dict(mesh.shape),
        "gen_s": round(gen_s, 1),
        "sweep_wall_s": round(wall, 1),
        "instance_steps_per_s": round(batch * steps / wall, 1),
        "feasible_frac": float(np.asarray(feas).sum() / (batch * steps)),
        "mean_scp_iters": float(np.asarray(iters).sum() / (batch * steps)),
        "peak_rss_gb": round(peak_rss_gb, 2),
        "checkpoint_mb": round(os.path.getsize(ckpt) / 1e6, 1),
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
