"""Break controller_pre (B=1024, n_veh=4, hp=20) into its stages."""
import os
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
from scp_tpu.sim.engine import NY
from scp_tpu.ops import discretize, condensed, reference_path
from scp_tpu.ops import constraints as con

BATCH, N_VEH, HP = 1024, 4, 20

cfg, data = batch_lib.make_batch(
    "circle", BATCH, key=jax.random.PRNGKey(42), dtype=jnp.float32,
    n_veh=N_VEH)
cfg = cfg.replace(hp=HP, hu=HP, delta_tol_rel=1e-4, u_step_tol=1e-5,
                  merit_patience=2, qp_tol=1e-6, qp_fixed_iters=9)
carry = jax.vmap(lambda d: engine.init_carry(cfg, d))(data)


def timeit(fn, *args, iters=30):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.time() - t0 - 0.029) / iters


pre_j = jax.jit(lambda d, c: jax.vmap(
    lambda di, ci: engine.controller_pre(cfg, di, ci))(d, c))

delay_j = jax.jit(lambda d, c: jax.vmap(
    lambda di, ci: engine.delay_compensate(cfg, di, ci.state, ci.u_prev1)
)(d, c))
x0, _ = delay_j(data, carry)

ref_j = jax.jit(lambda d, x0: jax.vmap(
    lambda di, x0i: reference_path.sample_reference_batch(
        di.ref_points, di.ref_valid, x0i[:, :2], x0i[:, 3] * cfg.dt,
        cfg.hp, True))(d, x0))
ref_pts = ref_j(data, x0)

disc_j = jax.jit(lambda d, c, x0: jax.vmap(
    lambda di, ci, x0i: discretize.linearize_and_discretize_batch(
        x0i, ci.u_prev1, di.params.lf, di.params.lr, cfg.dt)
)(d, c, x0))
A, B_, E = disc_j(data, carry, x0)

cond_j = jax.jit(lambda d, x0, rp, A, B_, E: jax.vmap(
    lambda di, x0i, rpi, Ai, Bi, Ei: condensed.build_condensed_batch(
        Ai, Bi, Ei, x0i, rpi.reshape(cfg.n_veh, cfg.hp * NY),
        di.params.q, di.params.r, di.params.q_final, cfg.hp, cfg.hu)
)(d, x0, rp, A, B_, E))
cm = cond_j(data, x0, ref_pts, A, B_, E)

obst_j = jax.jit(lambda d, c: jax.vmap(
    lambda di, ci: engine.predict_obstacles(cfg, di, ci.step))(d, c))
obst_pos = obst_j(data, carry)

sys_j = jax.jit(lambda cm, obst, d: jax.vmap(
    lambda cmi, oi, di: con.make_system(
        cmi.math_b, cmi.const_term, oi, di.dsafe_veh, di.dsafe_obst,
        cfg.dsafe_extra, cfg.hp, cfg.hu))(cm, obst, d))

print(f"pre total:      {timeit(pre_j, data, carry)*1e3:7.2f} ms")
print(f"  delay_comp:   {timeit(delay_j, data, carry)*1e3:7.2f} ms")
print(f"  ref sampling: {timeit(ref_j, data, x0)*1e3:7.2f} ms")
print(f"  discretize:   {timeit(disc_j, data, carry, x0)*1e3:7.2f} ms")
print(f"  condensed:    {timeit(cond_j, data, x0, ref_pts, A, B_, E)*1e3:7.2f} ms")
print(f"  obstacles:    {timeit(obst_j, data, carry)*1e3:7.2f} ms")
print(f"  make_system:  {timeit(sys_j, cm, obst_pos, data)*1e3:7.2f} ms")
