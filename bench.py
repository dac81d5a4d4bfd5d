"""Benchmark: SCP controller solves/s on one TPU chip.

Measures the full warm-started MPC controller step (delay compensation,
reference sampling, linearize/discretize/condense, SCP solve with the batched
IPM QP) on a randomized 4-vehicle circle batch at the N=20 horizon — the
north-star metric of BASELINE.json. ``vs_baseline`` is measured against the
per-chip share of the 10k solves/s v5e-8 target (1250 solves/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Environment note: the TPU-tunnel RPC in this environment intermittently
wedges on process start (observed: identical programs compile in ~2 s or hang
indefinitely, independent of program content). The benchmark therefore runs
its measurement in a child process with a watchdog and retries, and uses the
persistent compilation cache so retries are cheap.
"""
import json
import os
import subprocess
import sys
import time

BATCH = 1024
N_VEH = 4
HP = 20
BASELINE_SOLVES_PER_SEC_CHIP = 1250.0  # 10k on v5e-8 / 8 chips
ATTEMPT_TIMEOUT_S = 420
RETRIES = 4


def worker():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    # TPU f32 matmuls default to bfloat16 passes; the solver needs true f32
    # (positions ~30 m would carry ~0.1 m bf16 error into the constraints).
    jax.config.update("jax_default_matmul_precision", "highest")

    from scp_tpu import config as config_lib
    from scp_tpu.scenarios import batch as batch_lib
    from scp_tpu.sim import engine

    cfg, data = batch_lib.make_batch(
        "circle", BATCH, key=jax.random.PRNGKey(42), dtype=jnp.float32,
        n_veh=N_VEH)
    # Calibrated f32 solver settings + straggler phase schedule: single
    # source of truth shared with the CLI and graft entry (config.py,
    # rationale in BENCHMARKS.md).
    cfg = config_lib.tuned_f32(cfg.replace(hp=HP, hu=HP))
    PHASES = config_lib.TUNED_F32_PHASES

    def step(d, carry):
        new_carry, out = engine.mpc_step_batch(cfg, d, carry, phases=PHASES)
        return new_carry, out.feasible

    step_j = jax.jit(step)
    carry = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)

    # jax.block_until_ready does NOT synchronize through the axon TPU
    # tunnel (CLAUDE.md); every timing below forces a device->host scalar
    # readback instead and subtracts the measured round-trip baseline.
    def readback(x):
        return float(jnp.sum(x))

    t0 = time.time()
    carry, feas = step_j(data, carry)
    readback(feas)
    compile_s = time.time() - t0

    # Tunnel round-trip baseline: median readback of fresh trivial results.
    rtts = []
    for i in range(7):
        y = jnp.zeros(()) + i
        t0 = time.time()
        float(y)
        rtts.append(time.time() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]

    # enough chained steps that the rtt-subtraction error (rtt jitter /
    # iters, +-5 ms observed) is <1% of the measured step time — 5 iters
    # made the headline swing +-15% between runs
    iters = 30
    t0 = time.time()
    for _ in range(iters):
        carry, feas = step_j(data, carry)
    readback(feas)
    dt = (time.time() - t0 - rtt) / iters

    solves_per_sec = BATCH / dt
    result = {
        "metric": "scp_solves_per_sec_chip",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / BASELINE_SOLVES_PER_SEC_CHIP, 3),
    }
    print(json.dumps(result))
    print(f"# batch={BATCH} n_veh={N_VEH} hp={HP} step_ms={dt * 1e3:.1f} "
          f"compile_s={compile_s:.1f}", file=sys.stderr)

    # Secondary metric (BASELINE.json): per-step latency percentiles at the
    # N=20 horizon, single scenario (the real-time MPC budget). Per-step
    # costs differ (SCP iteration counts vary with conflict), so this
    # measures each of LSTEPS closed-loop steps individually: step i's carry
    # is advanced on host, then a scan re-runs that SAME step REPS times in
    # one jit (amortizing the tunnel round trip) and the per-step latency is
    # (t - rtt) / REPS. A k * 1e-20 warm-start perturbation (exact no-op in
    # f32 arithmetic) defeats loop-invariant hoisting of the repeated body.
    from scp_tpu.scenarios import builders
    from scp_tpu.sim import engine as eng

    cfg1, data1 = builders.circle(N_VEH, dtype=jnp.float32)
    cfg1 = config_lib.tuned_f32(cfg1.replace(hp=HP, hu=HP))
    LSTEPS = 50                  # full closed loop (cfg.n_sim at dt=0.4)
    # REPS divides the rtt-subtraction error into each step measurement
    # (±5 ms rtt jitter / REPS): 48 keeps it ~±0.1 ms on a ~0.7 ms step
    # (16 gave ±0.3 ms — visible as 0.68-0.92 ms p50 spread across runs)
    REPS = 48

    @jax.jit
    def advance(c):
        c2, out = eng.mpc_step(cfg1, data1, c)
        return c2, out.obj

    @jax.jit
    def repeat_step(c):
        def body(acc, k):
            c_k = c._replace(
                u_warm=c.u_warm + k.astype(c.u_warm.dtype) * 1e-20)
            _, out = eng.mpc_step(cfg1, data1, c_k)
            return acc + out.obj, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), c.u_warm.dtype),
                              jnp.arange(REPS))
        return acc

    c1 = eng.init_carry(cfg1, data1)
    readback(repeat_step(c1))                # compile both programs
    c_tmp, o = advance(c1)
    readback(o)

    # The warm-start perturbation must be an EXACT f32 no-op (u_warm is
    # O(1e-2) rad; 1e-20 is far below half-ulp) or the repeated "same step"
    # would silently measure different steps. Pin it: the max-k perturbed
    # step's objective must equal the unperturbed one bitwise.
    _, o_base = advance(c1)
    _, o_pert = advance(c1._replace(
        u_warm=c1.u_warm + jnp.float32(REPS - 1) * 1e-20))
    assert float(o_base) == float(o_pert), (
        "warm-start perturbation is not an exact f32 no-op; latency "
        "methodology invalid (bench.py repeat_step)")

    lats = []
    c_i = c1
    for i in range(LSTEPS):
        readback(c_i.state)                  # sync: advance() is async
        t0 = time.time()
        acc = repeat_step(c_i)
        readback(acc)
        lats.append((time.time() - t0 - rtt) / REPS)
        c_i, _ = advance(c_i)
    lats.sort()
    p50 = lats[len(lats) // 2]
    p90 = lats[min(len(lats) - 1, int(0.90 * len(lats)))]
    lat_max = lats[-1]
    # honest labels: with LSTEPS samples the top order statistic is the max,
    # not a "p99" (VERDICT r2 weak #4)
    print(f"# step_latency_ms p50={p50 * 1e3:.2f} p90={p90 * 1e3:.2f} "
          f"max={lat_max * 1e3:.2f} (1 scenario, hp={HP}, {LSTEPS} steps x "
          f"{REPS} reps, rtt={rtt * 1e3:.1f}ms)", file=sys.stderr)


def main():
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [env.get("PYTHONPATH", ""), os.path.dirname(
            os.path.abspath(__file__))] if p)
    for attempt in range(RETRIES):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker"],
                capture_output=True, text=True, timeout=ATTEMPT_TIMEOUT_S,
                env=env, cwd=os.path.dirname(os.path.abspath(__file__)))
        except subprocess.TimeoutExpired:
            print(f"# attempt {attempt + 1} timed out (TPU tunnel wedge); "
                  f"retrying", file=sys.stderr)
            time.sleep(30)
            continue
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode == 0 and lines:
            print(lines[-1])
            sys.stderr.write(proc.stderr[-2000:])
            return 0
        print(f"# attempt {attempt + 1} failed rc={proc.returncode}: "
              f"{proc.stderr[-500:]}", file=sys.stderr)
        time.sleep(30)
    print(json.dumps({"metric": "scp_solves_per_sec_chip", "value": 0.0,
                      "unit": "solves/s", "vs_baseline": 0.0}))
    return 1


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        sys.exit(main())
