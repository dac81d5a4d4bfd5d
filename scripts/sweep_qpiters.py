"""Effect of qp_fixed_iters on speed + quality at the current schedule."""
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
PHASES = ((3, 1), (2, 2), (15, 8))
base_cfg, data = batch_lib.make_batch(
    "circle", BATCH, key=jax.random.PRNGKey(42), dtype=jnp.float32,
    n_veh=N_VEH)


def measure(qpit):
    cfg = base_cfg.replace(hp=HP, hu=HP, delta_tol_rel=1e-4, u_step_tol=1e-5,
                           merit_patience=2, qp_tol=1e-6, qp_fixed_iters=qpit)
    carry = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)
    step = jax.jit(lambda d, c: engine.mpc_step_batch(
        cfg, d, c, phases=PHASES))
    carry, out = step(data, carry)
    for _ in range(2):
        carry, out = step(data, carry)
    float(carry.state.sum())
    N = 10
    t0 = time.time()
    c = carry
    feas = []
    for _ in range(N):
        c, out = step(data, c)
        feas.append(out.feasible)
    float(c.state.sum())
    dt = (time.time() - t0 - 0.029) / N
    f = float(jnp.stack(feas).mean())
    it = float(out.scp_iters.mean())
    return dt, f, it


for qpit in (9, 8, 7):
    dt, f, it = measure(qpit)
    print(f"qp_fixed_iters={qpit}: step={dt*1e3:6.2f} ms  feas={f:.4f}  "
          f"mean_scp_iters={it:.2f}")
