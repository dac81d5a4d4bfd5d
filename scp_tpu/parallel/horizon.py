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


def shard_system(sys: con.ConstraintSystem, shard_idx, n_shards: int
                 ) -> con.ConstraintSystem:
    """This shard's horizon block of a full constraint system.

    ``shard_idx`` may be traced (``jax.lax.axis_index``); the block length
    hp/n_shards is static. Every k-indexed field is sliced; pair topology,
    safety distances and masks are k-free and stay whole.
    """
    hp = sys.b3.shape[1]
    assert hp % n_shards == 0, f"hp={hp} not divisible by {n_shards} shards"
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
    n_con_total = cfg.n_constraints

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
