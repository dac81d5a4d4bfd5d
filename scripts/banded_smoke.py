"""TPU smoke + first timing of the banded (Riccati) KKT path.

Measures the marginal SCP-iteration cost of the banded path vs the dense
XLA fallback at the long-horizon shapes where the fused kernel cannot
compile (the r4 crossover table: hp=64 fallback = 77 ms/iter), using the
same chained-iteration differencing as scripts/crossover_model_axis.py.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from scp_tpu import config as config_lib  # noqa: E402
from scp_tpu.scenarios import batch as batch_lib  # noqa: E402
from scp_tpu.sim import engine  # noqa: E402
from scp_tpu.solvers import scp  # noqa: E402

HP = int(sys.argv[1]) if len(sys.argv) > 1 else 64
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
MODE = sys.argv[3] if len(sys.argv) > 3 else "banded"   # banded | dense

# calibrated f32 settings from the single source (CLAUDE.md rule); the
# kkt choice comes from the cfg built in main()
_T = dict(config_lib.TUNED_F32_OVERRIDES)
_T.pop("qp_kkt", None)
KW = dict(u_lim=config_lib.SCPConfig().u_lim, **_T)


def readback(x):
    return float(jnp.sum(x))


def main():
    dtype = jnp.float32
    cfg, data = batch_lib.make_batch(
        "circle", B, key=jax.random.PRNGKey(0), dtype=dtype, n_veh=4)
    cfg = cfg.replace(hp=HP, hu=HP, qp_kkt=MODE if MODE != "dense"
                      else "dense")
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    carry = jax.vmap(lambda d, k: engine.init_carry(cfg, d, k))(data, keys)
    problem, _ = jax.jit(jax.vmap(
        lambda d, c: engine.controller_pre(cfg, d, c)))(data, carry)
    u0 = carry.u_warm

    def run(iters):
        return jax.jit(functools.partial(
            scp.solve_scp_stacked, max_scp_iter=iters,
            qp_kkt=cfg.qp_kkt, **KW))

    # chained-iteration differencing (profile_fused_split methodology)
    k0, k1 = 2, 6
    rtts = []
    for _ in range(5):
        t = time.time()
        readback(u0[0, :1])
        rtts.append(time.time() - t)
    rtt = sorted(rtts)[len(rtts) // 2]

    out = {}
    for k in (k0, k1):
        f = run(k)
        r = f(problem, u0)            # compile + warm
        readback(r.obj)
        ts = []
        for _ in range(3):
            t = time.time()
            r = f(problem, u0)
            readback(r.obj)
            ts.append(time.time() - t - rtt)
        out[k] = min(ts)
        print(f"iters={k}: {out[k]*1e3:.1f} ms", flush=True)
    per_iter = (out[k1] - out[k0]) / (k1 - k0)
    print(f"RESULT mode={MODE} hp={HP} B={B}: "
          f"{per_iter*1e3:.2f} ms/SCP-iteration "
          f"({per_iter*1e3/B*1e3:.2f} us/instance-iter)", flush=True)


if __name__ == "__main__":
    main()
