"""Phase-schedule sweep at the current per-iteration cost (post gather-hoist).

Measures steady-state step time AND quality (feasible fraction, mean obj)
over a few warm steps for candidate straggler-repacking schedules.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_default_matmul_precision", "highest")

from scp_tpu.scenarios import batch as batch_lib
from scp_tpu.sim import engine

BATCH, N_VEH, HP = 1024, 4, 20
cfg, data = batch_lib.make_batch(
    "circle", BATCH, key=jax.random.PRNGKey(42), dtype=jnp.float32,
    n_veh=N_VEH)
cfg = cfg.replace(hp=HP, hu=HP, delta_tol_rel=1e-4, u_step_tol=1e-5,
                  merit_patience=2, qp_tol=1e-6, qp_fixed_iters=7)
carry0 = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)

# measured tunnel round trip
_rtts = []
for i in range(7):
    y = jnp.zeros(()) + i
    t0 = time.time()
    float(y)
    _rtts.append(time.time() - t0)
RTT = sorted(_rtts)[3]

SCHEDULES = [
    ((3, 1), (2, 2), (15, 8)),          # current headline
    ((3, 1), (2, 2), (15, 16)),
    ((3, 1), (2, 2), (2, 4), (13, 16)),
    ((3, 1), (2, 2), (2, 4), (13, 8)),
    ((3, 1), (2, 4), (15, 16)),
    ((2, 1), (3, 2), (15, 8)),
    ((3, 1), (3, 4), (14, 16)),
    ((4, 1), (1, 4), (15, 16)),
]


def measure(phases):
    step = jax.jit(lambda d, c: engine.mpc_step_batch(
        cfg, d, c, phases=phases))
    carry, out = step(data, carry0)
    # steady state: advance a few steps, readback once to sync
    for _ in range(2):
        carry, out = step(data, carry)
    float(carry.state.sum())
    N = 30
    t0 = time.time()
    c = carry
    for _ in range(N):
        c, out = step(data, c)
    s = float(c.state.sum())                  # forced device->host sync
    dt = (time.time() - t0 - RTT) / N
    feas = float(out.feasible.mean())
    obj = float(out.obj.mean())
    return dt, feas, obj


for ph in SCHEDULES:
    dt, feas, obj = measure(ph)
    eff = sum(e[0] / e[1] for e in ph)
    print(f"{str(ph):42s} eff={eff:5.2f}  step={dt*1e3:6.2f} ms  "
          f"feas={feas:.4f}  obj={obj:9.2f}")
