"""Calibrate (qp_fixed_iters, qp_correctors): speed + 50-step quality."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_default_matmul_precision", "highest")

from scp_tpu.scenarios import batch as batch_lib
from scp_tpu.sim import engine

BATCH, N_VEH, HP = 1024, 4, 20
PHASES = ((3, 1), (2, 4), (15, 16))
base_cfg, data = batch_lib.make_batch(
    "circle", BATCH, key=jax.random.PRNGKey(42), dtype=jnp.float32,
    n_veh=N_VEH)


def run(qpit, ncor, steps=50):
    cfg = base_cfg.replace(hp=HP, hu=HP, delta_tol_rel=1e-4, u_step_tol=1e-5,
                           merit_patience=2, qp_tol=1e-6, qp_fixed_iters=qpit,
                           qp_correctors=ncor)
    carry = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)
    step = jax.jit(lambda d, c: engine.mpc_step_batch(
        cfg, d, c, phases=PHASES))
    carry, out = step(data, carry)
    for _ in range(2):
        carry, out = step(data, carry)
    float(carry.state.sum())
    N = 25
    t0 = time.time()
    c = carry
    for _ in range(N):
        c, _ = step(data, c)
    float(c.state.sum())
    dt = (time.time() - t0 - 0.029) / N
    # quality: fresh 50-step closed loop
    carry = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)
    feas, obj = [], []
    for _ in range(steps):
        carry, out = step(data, carry)
        feas.append(out.feasible)
        obj.append(out.obj)
    f = float(jnp.stack(feas).mean())
    o = float(jnp.stack(obj).mean())
    return dt, f, o


for qpit, ncor in ((7, 0), (6, 0), (6, 1), (5, 1), (5, 2)):
    dt, f, o = run(qpit, ncor)
    print(f"iters={qpit} cor={ncor}: step={dt*1e3:6.2f} ms  feas={f:.5f}  "
          f"obj={o:9.2f}")
