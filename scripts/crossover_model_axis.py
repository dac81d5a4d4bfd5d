"""Model-axis (horizon-sharded) crossover measurement — VERDICT r4 item 2.

The horizon-sharded SCP solve (``qp.solve_qp(axis_name=...)``) is XLA-only:
it forgoes the fused Pallas kernel that produced most of the single-chip
gains. This script measures, ON THE REAL CHIP, where sharding the XLA path
would actually beat running the fused kernel unsharded:

* ``T_fused(H)``: marginal per-SCP-iteration time of the fused
  ``solve_scp_stacked`` at global horizon H (the unsharded production path);
* ``T_shard(H, n)``: marginal per-SCP-iteration time of ONE SHARD of the
  row-sharded XLA path at H with n shards — emulated on a single-device
  "model" mesh by slicing shard 0's hp/n horizon block through the REAL
  sharded code path (``horizon.shard_system`` + ``solve_scp(axis_name=)``).
  The 1-device psum makes the math shard-local (numerically different, cost
  representative) and UNDERcounts the real collective cost, so the
  emulation is optimistic FOR sharding: a crossover it doesn't show won't
  appear on hardware either.

Stops are disabled (delta_tol=0 etc.) so every config runs exactly
``max_scp_iter`` iterations; marginal time = (T(I2) - T(I1)) / (I2 - I1)
with chained repeats and forced readbacks (bench.py methodology).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/crossover_model_axis.py
"""
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental.shard_map import shard_map  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

from scp_tpu.parallel import horizon  # noqa: E402
from scp_tpu.scenarios import batch as batch_lib  # noqa: E402
from scp_tpu.sim import engine  # noqa: E402
from scp_tpu.solvers import scp  # noqa: E402

B = 256
N_VEH = 4
REPS = 5
I1, I2 = 2, 6

KW = dict(delta_tol=0.0, delta_tol_rel=0.0, u_step_tol=0.0,
          merit_patience=0, slack_weight=1e5, slack_ub=1e8,
          qp_tol=1e-6, qp_fixed_iters=7)


def rtt_baseline():
    rtts = []
    for i in range(7):
        y = jnp.zeros(()) + i
        t0 = time.time()
        float(y)
        rtts.append(time.time() - t0)
    return sorted(rtts)[len(rtts) // 2]


def timeit(fn, *args):
    out = fn(*args)                          # compile + warm
    float(jnp.sum(out.obj))
    rtt = rtt_baseline()
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    float(jnp.sum(out.obj))
    return (time.time() - t0 - rtt) / REPS


def main():
    mesh = Mesh(np.array(jax.devices()[:1]), ("model",))
    import sys
    hps = ([int(a) for a in sys.argv[1:] if a.isdigit()] or [20, 40, 64])
    for hp in hps:
        cfg, data = batch_lib.make_batch(
            "circle", B, key=jax.random.PRNGKey(3), dtype=jnp.float32,
            n_veh=N_VEH)
        cfg = cfg.replace(hp=hp, hu=hp)
        keys = jax.random.split(jax.random.PRNGKey(4), B)
        carry = jax.vmap(lambda d, k: engine.init_carry(cfg, d, k))(
            data, keys)
        problems, _ = jax.jit(jax.vmap(
            lambda d, c: engine.controller_pre(cfg, d, c)))(data, carry)
        u0 = carry.u_warm

        def fused(iters):
            return jax.jit(lambda p, u: scp.solve_scp_stacked(
                p, u, u_lim=cfg.u_lim, max_scp_iter=iters,
                qp_use_pallas=True, **KW))

        def sharded(iters, n_sh):
            php = horizon.padded_hp(hp, n_sh)
            n_con_total = horizon.padded_n_con(
                cfg.replace(hp=php, hu=php), n_sh)

            def per_shard(prob, u):
                local = jax.vmap(lambda s: horizon.shard_system(
                    s, jax.lax.axis_index("model"), n_sh))(prob.sys)
                run = lambda p, uu: scp.solve_scp(  # noqa: E731
                    p, uu, u_lim=cfg.u_lim, max_scp_iter=iters,
                    axis_name="model", n_con_total=n_con_total, **KW)
                return jax.vmap(run)(prob._replace(sys=local), u)

            return jax.jit(shard_map(
                per_shard, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
                check_rep=False))

        try:
            tf = (timeit(fused(I2), problems, u0)
                  - timeit(fused(I1), problems, u0)) / (I2 - I1)
            print(f"hp={hp}: fused unsharded  {tf * 1e3:8.2f} ms/scp-iter "
                  f"(B={B})", flush=True)
        except Exception as e:  # noqa: BLE001 — VMEM ceilings are a finding
            print(f"hp={hp}: fused unsharded  FAILED: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
        for n_sh in (1, 2, 4, 8):
            try:
                ts = (timeit(sharded(I2, n_sh), problems, u0)
                      - timeit(sharded(I1, n_sh), problems, u0)) / (I2 - I1)
                print(f"hp={hp}: xla shard 1/{n_sh}   {ts * 1e3:8.2f} "
                      f"ms/scp-iter (local rows "
                      f"{horizon.padded_hp(hp, n_sh) // n_sh * cfg.n_pairs})",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"hp={hp}: xla shard 1/{n_sh}   FAILED: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
