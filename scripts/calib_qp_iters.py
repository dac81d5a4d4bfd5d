"""Compare qp_fixed_iters on the bench workload: feasibility, objective,
SCP iterations over a 6-step closed-loop batch."""
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
PHASES = ((4, 1), (2, 2), (14, 8))
STEPS = 6

for fi in [int(a) for a in sys.argv[1:]] or [8, 9]:
    cfg, data = batch_lib.make_batch(
        "circle", BATCH, key=jax.random.PRNGKey(42), dtype=jnp.float32,
        n_veh=N_VEH)
    cfg = cfg.replace(hp=HP, hu=HP, delta_tol_rel=1e-4, u_step_tol=1e-5,
                      merit_patience=2, qp_tol=1e-6, qp_fixed_iters=fi)

    step_j = jax.jit(lambda d, c: engine.mpc_step_batch(cfg, d, c,
                                                        phases=PHASES))
    carry = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)
    feas, objs, iters, viol = [], [], [], []
    t = None
    for s in range(STEPS):
        if s == 1:
            float(carry.state.sum())
            t = time.time()
        carry, out = step_j(data, carry)
        feas.append(float(out.feasible.mean()))
        objs.append(float(out.obj.mean()))
        iters.append(float(out.scp_iters.mean()))
        viol.append(float(jnp.maximum(out.max_violation, 0).max()))
    float(carry.state.sum())
    dt = (time.time() - t) / (STEPS - 1)
    print(f"fixed_iters={fi}: step_ms={dt*1e3:6.1f} "
          f"solves/s={BATCH/dt:7.0f}")
    print(f"  feas/step: {[f'{f:.3f}' for f in feas]}")
    print(f"  obj/step:  {[f'{o:.1f}' for o in objs]}")
    print(f"  scp_iters: {[f'{i:.2f}' for i in iters]}")
    print(f"  max_viol:  {[f'{v:.2e}' for v in viol]}")
