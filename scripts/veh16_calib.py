"""V=16 regime calibration (VERDICT r4 next #4).

The r4 bench row ran the V=4-calibrated schedule at V=16 and reported
closed-loop feasibility 0.891 on randomized all-crossing conflicts with no
evidence about WHY. This instrument produces that evidence on the real
chip:

  hist   — done-by-k histogram of the V=16 warm steady state (the input
           the phase schedule is calibrated from);
  sweep  — closed-loop feasibility/objective/step-time over candidate
           phase schedules and qp_fixed_iters at V=16;
  xcheck — f64-CPU adaptive cross-check of the f32 run's infeasible
           instances: rerun the EXACT failing instances with the
           reference-parity solver configuration; instances that stay
           infeasible are genuinely infeasible randomized conflicts, not
           solver artifacts.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/veh16_calib.py {hist|sweep|xcheck} [B] [steps]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_default_matmul_precision", "highest")

from scp_tpu import config as config_lib  # noqa: E402
from scp_tpu.scenarios import batch as batch_lib  # noqa: E402
from scp_tpu.sim import engine  # noqa: E402

N_VEH, HP = 16, 10
MODE = sys.argv[1] if len(sys.argv) > 1 else "hist"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 20


def make(dtype, b=None):
    cfg, data = batch_lib.make_batch(
        "circle", b or B, key=jax.random.PRNGKey(12), dtype=dtype,
        n_veh=N_VEH)
    cfg = cfg.replace(hp=HP, hu=HP)
    if dtype == jnp.float32:
        # the V=16-calibrated depth (sweep result: feasibility peaks at
        # qp_fixed_iters=9; config.TUNED_F32_V16)
        cfg = config_lib.tuned_f32(cfg, **config_lib.TUNED_F32_V16)
    return cfg, data


def rtt():
    vals = []
    for i in range(7):
        y = jnp.zeros(()) + i
        t0 = time.time()
        float(y)
        vals.append(time.time() - t0)
    return sorted(vals)[3]


def cmd_hist():
    cfg, data = make(jnp.float32)
    carry = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)
    step = jax.jit(lambda d, c: engine.mpc_step_batch(
        cfg, d, c, phases=((20, 1),)))
    for _ in range(4):
        carry, out = step(data, carry)
    iters = np.asarray(out.scp_iters)
    cum = [(k, float((iters <= k).mean())) for k in range(1, 21)]
    print("V=16 done-by-k (warm step 4, flat 20-iter):")
    print(" ".join(f"{k}:{f:.3f}" for k, f in cum))
    print(f"mean iters {iters.mean():.2f}, capped {(iters >= 20).mean():.3f}")


SCHEDULES = [
    ("r4-default(v4)", config_lib.TUNED_F32_PHASES, 7),
    ("flat20", ((20, 1),), 7),
    ("(4,1)(3,4)(13,16)", ((4, 1), (3, 4), (13, 16)), 7),
    ("(5,1)(3,4)(12,16)", ((5, 1), (3, 4), (12, 16)), 7),
    ("(4,1)(4,2)(12,8)", ((4, 1), (4, 2), (12, 8)), 7),
    ("v4-sched,qpit8", config_lib.TUNED_F32_PHASES, 8),
    ("(4,1)(3,4)(13,16),qpit8", ((4, 1), (3, 4), (13, 16)), 8),
    ("flat20,qpit9", ((20, 1),), 9),
]

# Round-2 focus (first round showed qp_fixed_iters, not the schedule, is
# the V=16 quality lever: qpit 7 -> 9 lifts feasibility 0.904 -> 0.952 at
# better objective):
SCHEDULES_R2 = [
    ("v4-sched,qpit9", config_lib.TUNED_F32_PHASES, 9),
    ("v4-sched,qpit10", config_lib.TUNED_F32_PHASES, 10),
    ("v4-sched,qpit12", config_lib.TUNED_F32_PHASES, 12),
    ("(4,1)(3,4)(13,16),qpit10", ((4, 1), (3, 4), (13, 16)), 10),
]


def cmd_sweep():
    base_rtt = rtt()
    sched = SCHEDULES_R2 if MODE == "sweep2" else SCHEDULES
    for name, phases, qpit in sched:
        cfg, data = make(jnp.float32)
        cfg = cfg.replace(qp_fixed_iters=qpit)
        carry = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)
        step = jax.jit(lambda d, c, cfg=cfg, ph=phases:
                       engine.mpc_step_batch(cfg, d, c, phases=ph))
        feas, objs = [], []
        t_warm = None
        for i in range(STEPS):
            if i == 2:
                float(jnp.sum(out.obj))  # noqa: F821 — warm sync
                t_warm = time.time()
            carry, out = step(data, carry)
            feas.append(np.asarray(out.feasible))
            objs.append(np.asarray(out.obj))
        float(jnp.sum(out.obj))
        dt = (time.time() - t_warm - base_rtt) / (STEPS - 2)
        feas = np.stack(feas)
        print(f"{name:28s} qpit={qpit}: feas {feas.mean():.4f} "
              f"(final-step {feas[-1].mean():.4f}) "
              f"obj {np.stack(objs).mean():.1f} "
              f"step {dt * 1e3:.1f} ms "
              f"({B / dt:.0f} solves/s)", flush=True)


def cmd_xcheck():
    # f32 TPU run, tracking per-instance infeasible steps
    cfg, data = make(jnp.float32)
    carry = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)
    step = jax.jit(lambda d, c: engine.mpc_step_batch(
        cfg, d, c, phases=config_lib.TUNED_F32_PHASES))
    feas = []
    for _ in range(STEPS):
        carry, out = step(data, carry)
        feas.append(np.asarray(out.feasible))
    feas = np.stack(feas)                          # (steps, B)
    bad = np.nonzero(~feas.all(axis=0))[0]
    print(f"f32 TPU: feasibility {feas.mean():.4f}; "
          f"{len(bad)}/{B} instances with any infeasible step")
    if not len(bad):
        return
    sample = bad[:8]
    print(f"re-running instances {sample.tolist()} on CPU f64 adaptive "
          f"(fresh subprocess — the TPU backend cannot be switched off "
          f"mid-process)...", flush=True)
    import subprocess
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "xcheck64",
         str(B), str(STEPS), ",".join(map(str, sample.tolist()))],
        check=True)


def cmd_xcheck64():
    """f64 CPU adaptive rerun of given instance indices (subprocess)."""
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    sample = np.asarray([int(x) for x in sys.argv[4].split(",")])
    cfg64, data64 = make(jnp.float64, b=B)
    sub = jax.tree_util.tree_map(lambda x: x[sample], data64)
    keys = jax.random.split(jax.random.PRNGKey(0), len(sample))
    carry64 = jax.vmap(lambda d, k: engine.init_carry(cfg64, d, k))(
        sub, keys)
    step64 = jax.jit(lambda d, c: engine.mpc_step_batch(
        cfg64, d, c, phases=((cfg64.max_scp_iter, 1),)))
    feas64 = []
    for i in range(STEPS):
        carry64, out64 = step64(sub, carry64)
        feas64.append(np.asarray(out64.feasible))
        print(f"  step {i:2d}: feasible "
              f"{np.asarray(out64.feasible).astype(int).tolist()}",
              flush=True)
    feas64 = np.stack(feas64)
    both_bad = int((~feas64.all(axis=0)).sum())
    print(f"f64 CPU adaptive on the f32-failing sample: "
          f"feasibility {feas64.mean():.4f}; "
          f"{both_bad}/{len(sample)} remain infeasible "
          f"(those are genuinely infeasible conflicts)")


if __name__ == "__main__":
    dict(hist=cmd_hist, sweep=cmd_sweep, sweep2=cmd_sweep,
         xcheck=cmd_xcheck, xcheck64=cmd_xcheck64)[MODE]()
