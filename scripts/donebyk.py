"""Done-by-k histogram at the steady state (flat 20-iteration solve)."""
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
cfg, data = batch_lib.make_batch(
    "circle", BATCH, key=jax.random.PRNGKey(42), dtype=jnp.float32,
    n_veh=N_VEH)
cfg = cfg.replace(hp=HP, hu=HP, delta_tol_rel=1e-4, u_step_tol=1e-5,
                  merit_patience=2, qp_tol=1e-6, qp_fixed_iters=9)
carry = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)
step = jax.jit(lambda d, c: engine.mpc_step_batch(
    cfg, d, c, phases=((20, 1),)))
for i in range(4):
    carry, out = step(data, carry)
iters = np.asarray(out.scp_iters)
conv = np.asarray(out.converged) if hasattr(out, "converged") else None
print("fields:", out._fields)
cum = [(k, float((iters <= k).mean())) for k in range(1, 21)]
print("done-by-k:", " ".join(f"{k}:{f:.3f}" for k, f in cum))
