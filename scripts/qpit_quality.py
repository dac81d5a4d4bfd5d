"""50-step closed-loop quality at qp_fixed_iters=7 vs 9 (bench workload)."""
import os

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

BATCH, N_VEH, HP = 256, 4, 20
PHASES = ((3, 1), (2, 2), (15, 8))
base_cfg, data = batch_lib.make_batch(
    "circle", BATCH, key=jax.random.PRNGKey(42), dtype=jnp.float32,
    n_veh=N_VEH)


def run(qpit, steps=50, phases=None):
    cfg = base_cfg.replace(hp=HP, hu=HP, delta_tol_rel=1e-4, u_step_tol=1e-5,
                           merit_patience=2, qp_tol=1e-6, qp_fixed_iters=qpit)
    carry = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)
    step = jax.jit(lambda d, c: engine.mpc_step_batch(
        cfg, d, c, phases=phases or PHASES))
    feas, viol, obj = [], [], []
    for _ in range(steps):
        carry, out = step(data, carry)
        feas.append(out.feasible)
        viol.append(out.max_violation)
        obj.append(out.obj)
    return (np.asarray(jnp.stack(feas)), np.asarray(jnp.stack(viol)),
            np.asarray(jnp.stack(obj)))


for label, qpit, ph in (
        ("flat7", 7, None),
        ("ph(6,6,9)", 7, ((3, 1, 6), (2, 2, 6), (15, 8, 9))),
        ("ph(6,7,9)", 7, ((3, 1, 6), (2, 2, 7), (15, 8, 9))),
        ("ph(5,7,9)", 7, ((3, 1, 5), (2, 2, 7), (15, 8, 9)))):
    f, v, o = run(qpit, phases=ph)
    print(f"{label:12s}: feas={f.mean():.5f}  max_viol={v.max():.2e}  "
          f"mean_obj={o.mean():9.2f}")
