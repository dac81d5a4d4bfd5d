"""Does the model (horizon) mesh axis beat replication? (VERDICT r1 item 1)

Compares, on a virtual 8-CPU-device mesh at f32:
  A. (data=4, model=2) with REAL horizon sharding (mpc_step_horizon)
  B. (data=4, model=2) with the model axis REPLICATING work (plain mpc_step)
  C. (data=8, model=1) pure data parallelism (same devices, no model axis)

A < B demonstrates the model axis does real work; C bounds what pure dp
gets from the same 8 devices. Virtual CPU devices share host cores, so
absolute numbers understate real-TPU ratios; relative ordering is the
signal.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python scripts/scaling_model_axis.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

jax.config.update("jax_platforms", "cpu")

from scp_tpu.parallel import mesh as mesh_lib
from scp_tpu.scenarios import batch as batch_lib
from scp_tpu.sim import engine

BATCH = 32
HP = 16      # a long horizon is where horizon sharding pays
N_VEH = 8    # parallel 8-veh: 28 pairs + 32 veh-obst pairs -> 960 G rows

cfg, data = batch_lib.make_batch("parallel", BATCH, key=jax.random.PRNGKey(0),
                                 dtype=jnp.float32, n_veh=N_VEH)
cfg = cfg.replace(hp=HP, hu=HP, max_scp_iter=6, qp_max_iter=12,
                  delta_tol_rel=1e-4, u_step_tol=1e-5)
carry = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)


def build(mesh, n_model, sharded):
    def per_instance(d, c):
        if sharded and n_model > 1:
            return engine.mpc_step_horizon(cfg, d, c, n_shards=n_model)
        return engine.mpc_step(cfg, d, c)

    def per_shard(b, cs):
        c2, out = jax.vmap(per_instance)(b, cs)
        return c2.state, jax.lax.psum(jnp.sum(out.obj), "data")

    run = jax.jit(shard_map(per_shard, mesh=mesh,
                            in_specs=(P("data"), P("data")),
                            out_specs=(P("data"), P()), check_rep=False))
    b = mesh_lib.shard_batch(data, mesh)
    cs = mesh_lib.shard_batch(carry, mesh)
    return run, b, cs


def timeit(run, b, cs, reps=5):
    states, obj = run(b, cs)            # compile + warm
    float(obj)
    t0 = time.time()
    for _ in range(reps):
        states, obj = run(b, cs)
        float(obj)
    return (time.time() - t0) / reps


for name, n_data, n_model, sharded in [
        ("A data=4 model=2 SHARDED   ", 4, 2, True),
        ("B data=4 model=2 replicated", 4, 2, False),
        ("C data=8 model=1 pure dp   ", 8, 1, False)]:
    mesh = mesh_lib.make_mesh(n_data, n_model)
    run, b, cs = build(mesh, n_model, sharded)
    dt = timeit(run, b, cs)
    print(f"{name}: {dt * 1e3:8.1f} ms/step  ({BATCH / dt:7.1f} solves/s)")
