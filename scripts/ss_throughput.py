"""Side-selection controller: f32 calibration + one-chip throughput.

VERDICT r3 top item: the reference's second controller (MIQP.py:45-88)
needs perf treatment, not just correctness parity. This script

1. calibrates ``qp_fixed_iters`` for the side-selection QPs (which differ
   from the SCP QPs: hard rate rows, linear half-plane rows, one solve per
   round instead of an SCP loop) by comparing 20-step closed-loop quality
   (feasibility, pred_obj, sides_stable) of f32 TPU fixed-iteration runs
   against the f64 CPU adaptive reference;
2. measures steady-state throughput (chained steps, forced readback,
   rtt-subtracted — bench.py methodology) for the BENCHMARKS rows:
   frog B=1024 (hp=10, dense fused path) and parallel-11 B=256 (hp=16,
   struct path with rate slabs).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ss_throughput.py [quality|speed]
"""
import functools
import os
import sys
import time

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402

CASES = (("frog", 16, 10, None), ("parallel", 8, 16, 11))


def run_loop(kind, b, hp, dtype, steps, fixed_iters, seed=7, n_veh=None):
    from scp_tpu.scenarios import batch as batch_lib
    from scp_tpu.sim import engine

    kw = {"n_veh": n_veh} if n_veh else {}
    cfg, data = batch_lib.make_batch(kind, b, key=jax.random.PRNGKey(seed),
                                     dtype=dtype, **kw)
    cfg = cfg.replace(hp=hp, hu=hp, controller="side_selection",
                      qp_fixed_iters=fixed_iters or 0,
                      side_selection_cand_iters=int(os.environ.get(
                          "SS_CAND_ITERS", "0")),
                      qp_tol=1e-6 if dtype == jnp.float32 else 1e-8)
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), b)
    sim = jax.jit(functools.partial(engine.simulate_batch, cfg,
                                    n_steps=steps))
    carry, out = sim(data, keys)
    return cfg, data, carry, out


def _report(tag, kind, out):
    print(f"{kind}: {tag} feas={float(jnp.mean(out.feasible)):.4f} "
          f"pred_obj={float(jnp.mean(out.pred_obj)):.5g} "
          f"stable={float(jnp.mean(out.sides_stable)):.3f} "
          f"slack_max={float(jnp.max(out.max_violation)):.3g}", flush=True)


def quality():
    """f32 TPU fixed-iteration sweep (run the f64 CPU reference separately
    with: python scripts/ss_throughput.py quality --cpu)."""
    steps = 20
    for kind, b, hp, nv in CASES:
        if "--cpu" in sys.argv:
            _, _, _, ref = run_loop(kind, b, hp, jnp.float64, steps, None,
                                    n_veh=nv)
            _report("f64 CPU adaptive", kind, ref)
            continue
        for k in (6, 8, 10, 12):
            _, _, _, out = run_loop(kind, b, hp, jnp.float32, steps, k,
                                    n_veh=nv)
            _report(f"f32 TPU k={k:2d}", kind, out)


def speed(fixed_iters=8):
    from scp_tpu.scenarios import batch as batch_lib
    from scp_tpu.sim import engine

    # the same coverage shapes as BENCHMARKS' SCP scenario rows: frog
    # B=1024 hp=10 (dense fused), parallel-8 hp=16 B=256 (struct), and
    # parallel-11 hp=10 B=256 (struct via 1 ghost alignment vehicle).
    # parallel-11 at hp=16 exceeds the fused kernel's VMEM budget (the
    # 176-slab working set + 176-col factor needs ~110M of the ~100M
    # scoped limit) — documented VMEM ceiling, falls to the adaptive path.
    for kind, b, hp, nv in (("frog", 1024, 10, None),
                            ("parallel", 256, 16, 8),
                            ("parallel", 256, 10, 11)):
        kw = {"n_veh": nv} if nv else {}
        cfg, data = batch_lib.make_batch(
            kind, b, key=jax.random.PRNGKey(7), dtype=jnp.float32, **kw)
        cfg = cfg.replace(hp=hp, hu=hp, controller="side_selection",
                          qp_fixed_iters=fixed_iters,
                          side_selection_cand_iters=int(os.environ.get(
                              "SS_CAND_ITERS", "0")),
                          qp_tol=1e-6)
        step_j = jax.jit(lambda d, c: engine.mpc_step_batch(cfg, d, c))
        keys = jax.random.split(jax.random.PRNGKey(8), b)
        carry = jax.vmap(lambda d, k: engine.init_carry(cfg, d, k))(data,
                                                                    keys)
        t0 = time.time()
        carry, out = step_j(data, carry)
        float(jnp.sum(out.feasible))
        compile_s = time.time() - t0
        rtts = []
        for i in range(7):
            y = jnp.zeros(()) + i
            t0 = time.time()
            float(y)
            rtts.append(time.time() - t0)
        rtt = sorted(rtts)[len(rtts) // 2]
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            carry, out = step_j(data, carry)
        feas = float(jnp.mean(out.feasible))
        dt = (time.time() - t0 - rtt) / iters
        print(f"{kind}: B={b} hp={hp} k={fixed_iters} "
              f"step_ms={dt * 1e3:.1f} solves/s={b / dt:.0f} "
              f"feas={feas:.4f} compile_s={compile_s:.1f} "
              f"stable={float(jnp.mean(out.sides_stable)):.3f}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "quality"
    if mode == "quality":
        quality()
    elif mode == "speed":
        speed(int(sys.argv[2]) if len(sys.argv) > 2 else 8)
