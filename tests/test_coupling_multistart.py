"""Coupling masks and multi-start SCP."""
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "tests")
from test_constraints_golden import build_ref_controller, build_my_system  # noqa: E402

from scp_tpu.ops import constraints as con  # noqa: E402
from scp_tpu.solvers import scp  # noqa: E402


def test_pair_coupling_mask_drops_constraints():
    ref, sc, it, ctrl = build_ref_controller("circle", 4)
    sys_, phi0, psi0, gamma0 = build_my_system(sc, it, ctrl)
    # decouple everything: evaluation must report feasibility regardless of u
    coupling = jnp.zeros((4, 4))
    masked = sys_._replace(pair_mask=jnp.zeros_like(sys_.pair_mask))
    rng = np.random.default_rng(0)
    u = jnp.array(rng.uniform(-0.05, 0.05, size=4 * sc.Hp))
    ev = con.evaluate(masked, u, 2 * 2.1e-3)
    assert bool(ev.feasible)
    assert float(ev.max_violation) == 0.0
    # linearized rows are inert: 0*u <= big
    G, rhs = con.linearize(masked, u)
    assert float(jnp.abs(G).max()) == 0.0
    assert float(rhs.min()) >= 1e9


def test_coupling_from_adjacency():
    ref, sc, it, ctrl = build_ref_controller("circle", 3)
    import numpy as np
    math_b = jnp.array(np.transpose(ctrl.mpc.Mathcal_B, (2, 0, 1)))
    const = jnp.array(ctrl.mpc.const_term[:, 0, :].T)
    adj = jnp.array([[0, 1, 0], [0, 0, 0], [0, 0, 0]])  # only pair (0,1)
    sys_ = con.make_system(math_b, const, jnp.zeros((0, sc.Hp, 2)),
                           jnp.array(sc.dsafeVehicles),
                           jnp.array(sc.dsafeObstacles).reshape(3, -1),
                           sc.dsafeExtra, sc.Hp, sc.Hu, coupling=adj)
    np.testing.assert_array_equal(np.asarray(sys_.pair_mask), [1.0, 0.0, 0.0])


def test_multistart_prefers_feasible():
    ref, sc, it, ctrl = build_ref_controller("circle", 3)
    sys_, phi0, psi0, gamma0 = build_my_system(sc, it, ctrl)
    problem = scp.SCPProblem(sys=sys_, phi0=phi0, psi0=psi0, gamma0=gamma0)
    res = scp.solve_scp_multistart(
        problem, jnp.zeros((3 * sc.Hp,)), u_lim=sc.uLim, qp_tol=1e-10,
        qp_max_iter=60)
    single = scp.solve_scp(problem, jnp.zeros((3 * sc.Hp,)), u_lim=sc.uLim,
                           qp_tol=1e-10, qp_max_iter=60)
    assert bool(res.feasible)
    # warm (zero) start is feasible here, so multistart returns its result
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(single.u),
                               atol=1e-9)
