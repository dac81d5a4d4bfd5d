"""16-vehicle circle throughput — the O(V^2) pair-slab regime.

The reference sweeps num_veh 3..9 (main.py:236-238); this measures the
fused SCP path at V=16 (120 pairs = 120 pair-row slabs, 2400 constraint
rows at hp=10) on the real chip, plus the VMEM boundary where the struct
kernel must fall back (VERDICT r3 item 7).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/veh16_bench.py [B] [hp]
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402

from scp_tpu import config as config_lib  # noqa: E402
from scp_tpu.scenarios import batch as batch_lib  # noqa: E402
from scp_tpu.sim import engine  # noqa: E402


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    hp = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cfg, data = batch_lib.make_batch(
        "circle", b, key=jax.random.PRNGKey(12), dtype=jnp.float32,
        n_veh=16)
    # V=16-calibrated inner depth (scripts/veh16_calib.py evidence)
    cfg = config_lib.tuned_f32(cfg.replace(hp=hp, hu=hp),
                               **config_lib.TUNED_F32_V16)
    step_j = jax.jit(lambda d, c: engine.mpc_step_batch(
        cfg, d, c, phases=config_lib.TUNED_F32_PHASES))
    keys = jax.random.split(jax.random.PRNGKey(13), b)
    carry = jax.vmap(lambda d, k: engine.init_carry(cfg, d, k))(data, keys)
    t0 = time.time()
    try:
        carry, out = step_j(data, carry)
        feas = float(jnp.mean(out.feasible))
    except Exception as e:  # noqa: BLE001 — the VMEM boundary is the result
        import re
        m = re.search(r"Ran out of memory[^;.]*", str(e))
        print(f"V=16 B={b} hp={hp}: COMPILE FAILED — "
              f"{(m.group(0) if m else str(e)[:160])}", flush=True)
        return
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
    print(f"V=16 B={b} hp={hp}: step_ms={dt * 1e3:.1f} "
          f"solves/s={b / dt:.0f} feas={feas:.4f} "
          f"mean_scp_iters={float(jnp.mean(out.scp_iters)):.2f} "
          f"compile_s={compile_s:.1f}", flush=True)


if __name__ == "__main__":
    main()
