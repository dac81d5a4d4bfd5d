"""Closed-loop quality impact of aggressive phase schedules: run 50 steps
and compare trajectories/controls vs the no-repack (flat 20-iter) solve."""
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
cfg, data = batch_lib.make_batch(
    "circle", BATCH, key=jax.random.PRNGKey(42), dtype=jnp.float32,
    n_veh=N_VEH)
cfg = cfg.replace(hp=HP, hu=HP, delta_tol_rel=1e-4, u_step_tol=1e-5,
                  merit_patience=2, qp_tol=1e-6, qp_fixed_iters=7)


def run(phases, steps=50):
    carry = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)
    step = jax.jit(lambda d, c: engine.mpc_step_batch(
        cfg, d, c, phases=phases))
    feas, us, xs = [], [], []
    for _ in range(steps):
        carry, out = step(data, carry)
        feas.append(out.feasible)
        us.append(out.u_applied)
        xs.append(carry.state)
    return (np.asarray(jnp.stack(feas)), np.asarray(jnp.stack(us)),
            np.asarray(jnp.stack(xs)))


ref_feas, ref_u, ref_x = run(((20, 1),))
print(f"flat20: feas={ref_feas.mean():.5f}")
for ph in (((3, 1), (2, 2), (15, 8)),
           ((3, 1), (2, 4), (15, 16)),
           ((3, 1), (3, 4), (14, 16))):
    f, u, x = run(ph)
    du = np.abs(u - ref_u).max()
    dp = np.abs(x[..., :2] - ref_x[..., :2]).max()
    print(f"{str(ph):38s} feas={f.mean():.5f}  max|du|={du:.2e}  "
          f"max|dpos|={dp:.3f} m  final|dpos|p99="
          f"{np.percentile(np.abs(x[-1,...,:2]-ref_x[-1,...,:2]), 99):.4f} m")
