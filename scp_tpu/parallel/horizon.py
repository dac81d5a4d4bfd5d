"""Horizon-block (model-axis) parallelism for the SCP solver.

The SURVEY.md §5 "long-context/sequence-parallel" analog: the MPC horizon is
the sequence axis, and the avoidance-constraint rows — the dominant cost of
each IPM iteration (the m*n^2 KKT formation ``G^T W G``) — are indexed by
horizon step k. Sharding the k axis of the structured constraint system
(:class:`scp_tpu.ops.constraints.ConstraintSystem`) over a mesh's ``model``
axis makes every shard:

* evaluate/linearize only its hp/n_shards horizon block of constraints
  (``con.linearize``/``con.evaluate`` are reused unchanged — slicing the k
  axis is exact because every row depends only on its own k);
* contribute its row block to the condensed KKT matrix, with ONE ``psum``
  per factorization rebuilding the replicated (n x n) system;
* reduce step lengths / complementarity / violation maxima with
  ``pmin``/``pmax``/``psum`` collectives (see ``qp.solve_qp(axis_name=...)``
  and ``scp.solve_scp(axis_name=...)``).

The decision vector u (nVeh*Hu, ~80 floats) stays replicated — exactly the
activations-sharded / weights-replicated regime of sequence parallelism.
The reference has no analogue (single process, SURVEY.md §2); this is the
BASELINE.json config-5 ICI scale-out dimension.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from scp_tpu.ops import constraints as con
from scp_tpu.solvers import scp


# Padded horizon steps place every vehicle at a distinct far-away position
# (pair distance^2 >= 2e10 against dsafe^2 ~ 10), so the pad rows linearize
# to the same inert ``0*u <= ~1e10`` form the coupling masks already emit
# (constraints.linearize_slabs) and evaluate as satisfied-by-a-mile.
_PAD_SEP = 1e5


def padded_hp(hp: int, n_shards: int) -> int:
    """Smallest multiple of ``n_shards`` >= hp (horizon-axis pad target)."""
    return -(-hp // n_shards) * n_shards


def padded_n_con(cfg, n_shards: int) -> int:
    """Global avoidance-row count of the PADDED system (the ``n_con_total``
    /``mg_total`` the sharded solver must be told: pad rows participate in
    the IPM's complementarity averages like masked rows do)."""
    return padded_hp(cfg.hp, n_shards) * (
        cfg.n_pairs + cfg.n_veh * cfg.n_obst)


def pad_system(sys: con.ConstraintSystem, n_shards: int
               ) -> con.ConstraintSystem:
    """Pad the horizon axis to a multiple of ``n_shards`` with inert steps.

    Works on per-instance systems and batched ones alike (the k axis is
    addressed from the trailing end). Pad steps have zero ``math_b`` blocks
    and hugely separated positions, so every derived constraint row is
    trivially satisfied and linearizes to a zero row with a large positive
    rhs — exactly the shape of a coupling-masked row, which the QP pipeline
    (equilibration included) already handles.
    """
    hp = sys.b3.shape[-3]
    pad = padded_hp(hp, n_shards) - hp
    if pad == 0:
        return sys
    dt = sys.b3.dtype
    v = sys.b3.shape[-4]

    def zpad(a):
        shape = list(a.shape)
        shape[-3] = pad
        return jnp.concatenate([a, jnp.zeros(shape, a.dtype)], axis=-3)

    sep = (jnp.arange(v, dtype=dt) + 1.0) * jnp.asarray(_PAD_SEP, dt)
    c_shape = sys.const3.shape[:-2] + (pad, sys.const3.shape[-1])
    c_pad = jnp.broadcast_to(sep[:, None, None], c_shape)
    const3 = jnp.concatenate([sys.const3, c_pad], axis=-2)
    o_shape = sys.obst_pos.shape[:-2] + (pad, sys.obst_pos.shape[-1])
    o_pad = jnp.full(o_shape, -_PAD_SEP, dt)
    obst_pos = jnp.concatenate([sys.obst_pos, o_pad], axis=-2)
    return sys._replace(b3=zpad(sys.b3), const3=const3, obst_pos=obst_pos,
                        b3i=zpad(sys.b3i), b3j=zpad(sys.b3j))


def shard_system(sys: con.ConstraintSystem, shard_idx, n_shards: int
                 ) -> con.ConstraintSystem:
    """This shard's horizon block of a full constraint system.

    ``shard_idx`` may be traced (``jax.lax.axis_index``); the block length
    ceil(hp/n_shards) is static — non-divisible horizons are padded with
    inert steps first (:func:`pad_system`). Every k-indexed field is
    sliced; pair topology, safety distances and masks are k-free and stay
    whole.
    """
    sys = pad_system(sys, n_shards)
    hp = sys.b3.shape[1]
    kl = hp // n_shards
    k0 = shard_idx * kl

    def slc(a):
        return jax.lax.dynamic_slice_in_dim(a, k0, kl, axis=1)

    return sys._replace(b3=slc(sys.b3), const3=slc(sys.const3),
                        obst_pos=slc(sys.obst_pos),
                        b3i=slc(sys.b3i), b3j=slc(sys.b3j))


def system_pspecs(data_axis: str | None, model_axis: str
                  ) -> con.ConstraintSystem:
    """PartitionSpecs sharding a (batched) ConstraintSystem's horizon axis
    over ``model_axis`` (and the batch axis over ``data_axis`` if given).

    Use as shard_map in_specs so the solver's inputs are PHYSICALLY sharded
    over both mesh axes — no shard ever holds another's horizon block.
    """
    d = (data_axis,) if data_axis is not None else ()
    k_sharded = P(*d, None, model_axis)          # (B?, V|O|P, K, ...)
    batch_only = P(*d) if d else P()
    return con.ConstraintSystem(
        b3=k_sharded, const3=k_sharded, obst_pos=k_sharded,
        dsafe2_pair=batch_only, dsafe2_obst=batch_only,
        pair_i=batch_only, pair_j=batch_only,
        pair_mask=batch_only, obst_mask=batch_only,
        b3i=k_sharded, b3j=k_sharded)


def solve_scp_sharded(cfg, problems: scp.SCPProblem, u_init: jax.Array,
                      mesh: Mesh, **scp_kw) -> scp.SCPResult:
    """Batched SCP solve over a (data, model) mesh with horizon sharding.

    ``problems``/``u_init`` carry a leading batch axis, sharded over 'data';
    each instance's constraint rows are sharded over 'model' (the in_specs
    physically place only the local horizon block on each device). Results
    are replicated over 'model' and sharded over 'data'.
    """
    from jax.experimental.shard_map import shard_map

    n_model = mesh.shape["model"]
    n_con_total = padded_n_con(cfg, n_model)
    problems = problems._replace(sys=pad_system(problems.sys, n_model))

    def per_shard(prob, u0):
        run = lambda p, u: scp.solve_scp(            # noqa: E731
            p, u, max_scp_iter=cfg.max_scp_iter,
            axis_name="model", n_con_total=n_con_total, **scp_kw)
        return jax.vmap(run)(prob, u0)

    in_specs = (scp.SCPProblem(
        sys=system_pspecs("data", "model"),
        phi0=P("data"), psi0=P("data"), gamma0=P("data")), P("data"))
    return jax.jit(shard_map(
        per_shard, mesh=mesh, in_specs=in_specs, out_specs=P("data"),
        check_rep=False))(problems, u_init)
