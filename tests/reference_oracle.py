"""Load the read-only reference implementation as a numeric oracle.

The reference at /root/reference cannot be imported as published: it imports
modules that are unavailable or nonexistent (``ode`` — MPC_Iter.py:4,
``autograd`` — Model.py:4, ``cvxpy``/``gurobipy``/``qpsolvers``) and reads the
undefined attribute ``scenario.uLim`` (SCP_controller.py:34; SURVEY.md Q1/Q2).
This module stubs the missing imports, patches ``uLim``, and exposes the
reference classes so golden tests can compare our TPU implementation's
matrices and solutions against the original numerics.

No reference code is copied — it is imported from the read-only mount.
"""
import sys
import types

REFERENCE_PATH = "/root/reference"


def _stub_module(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference():
    """Import reference modules with missing third-party deps stubbed."""
    _stub_module("ode")
    _stub_module("autograd", jacobian=lambda f: f)
    _stub_module("qpsolvers", solve_qp=None)
    cp = _stub_module("cvxpy")
    for name in ("Variable", "Problem", "Minimize", "quad_form", "vstack"):
        if not hasattr(cp, name):
            setattr(cp, name, lambda *a, **k: None)
    if not hasattr(cp, "GUROBI"):
        cp.GUROBI = "GUROBI"
    gp = _stub_module("gurobipy")
    if not hasattr(gp, "GRB"):
        gp.GRB = types.SimpleNamespace()

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    import Model  # noqa: F401
    import Scenarios  # noqa: F401
    import SampleReferTraj  # noqa: F401
    import MPC_Iter  # noqa: F401
    import SCP_controller  # noqa: F401

    return types.SimpleNamespace(
        Model=Model,
        Scenarios=Scenarios,
        SampleReferTraj=SampleReferTraj,
        MPC_Iter=MPC_Iter,
        SCP_controller=SCP_controller,
    )


def make_scenario(kind="circle", n_veh=3, is_noise=False):
    """Build a completed reference Scenario with the Q1 uLim patch applied."""
    import math

    ref = load_reference()
    sc = ref.Scenarios.Scenario(is_noise)
    if kind == "circle":
        angles = [2 * math.pi / n_veh * (i + 1) for i in range(n_veh)]
        sc.get_circle_scenario(angles)
    elif kind == "frog":
        sc.get_frog_scenario()
    elif kind == "parallel":
        sc.get_parallel_scenario(n_veh)
        sc.dsafeExtra = 0.9
    else:
        raise ValueError(kind)
    sc.complete_scenario()
    sc.uLim = sc.mechanicalSteeringLimit  # Q1 patch (MATLAB original's value)
    return ref, sc
