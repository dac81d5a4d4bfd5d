"""Static configuration pytrees for the TPU-native SCP/MPC engine.

The reference (``/root/reference``) hard-codes constants across ``Config.py:4-26``,
``Scenarios.py:42-87`` and in-file literals (``SCP_controller.py:83-86,216-218``).
Here they become two layers:

* :class:`SCPConfig` — **static** (hashable, Python scalars only). Everything that
  determines array *shapes* or compiled control flow lives here; it is passed as a
  static argument to ``jax.jit`` so one compiled solver serves a whole scenario
  family.
* :class:`ScenarioData` — **dynamic** pytree of arrays (initial states, reference
  polylines, obstacle tables, per-vehicle weights). Batched / sharded freely.

Design note: the reference's ``scenario.uLim`` is read but never defined
(``SCP_controller.py:34`` vs ``Scenarios.py:42-87`` — SURVEY.md Q1). We define it
explicitly as the per-step box bound on the steering command, defaulting to the
mechanical steering limit as in the MATLAB original.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

# Model dimensions (fixed by the bicycle model, reference Model.py:36-38).
NX = 6  # state:   [x, y, heading, v_rear, accel, steering]
NU = 1  # control: steering-angle reference
NY = 2  # output:  [x, y] position


# ---- calibrated float32 solver configuration (single source of truth) ----
# Consumed by bench.py, scp_tpu.cli and __graft_entry__ so every entry point
# runs the same documented calibration (BENCHMARKS.md):
#   * qp_fixed_iters=7 — 50-step closed-loop feasibility 0.99906 at 7 vs
#     0.99766 at 9, equal objective (scripts/qpit_quality.py); 6 degrades
#     the objective ~7%.
#   * scale-free stops (delta_tol_rel / u_step_tol) + merit_patience=2 —
#     the reference's absolute merit stop is unreachable in f32
#     (BENCHMARKS.md "findings that shaped the design").
# The reference's analogue is the single shared Config.py:4-26 constant bag.
#   * qp_kkt="auto" — the fused dense kernel where its VMEM gate admits
#     it (the hp<=40 fast path), the banded/Riccati formulation wherever
#     the dense path would fall back: the r4 "30x cliff" above the fused
#     ceiling (e.g. circle-4 at hp=64) now lands on the fused banded
#     sweeps at ~1/5 the dense-fallback cost (BENCHMARKS.md).
TUNED_F32_OVERRIDES: dict[str, Any] = dict(
    delta_tol_rel=1e-4, u_step_tol=1e-5, merit_patience=2,
    qp_tol=1e-6, qp_fixed_iters=7, qp_kkt="auto")

# V=16 regime override (scripts/veh16_calib.py, real-chip sweep over
# schedules x qp_fixed_iters at B=256/hp=10 randomized all-crossing
# conflicts): the quality lever at 120 coupled pairs is INNER-QP DEPTH,
# not the straggler schedule — every schedule at qp_fixed_iters=7 sits at
# 0.87-0.90 closed-loop feasibility (including flat-20), while 9 fixed
# iterations lift it to 0.949 at 17% better objective. Deeper is NOT
# better: 10/12 iterations degrade feasibility (0.941/0.906) while the
# objective keeps falling — the sharper optima hug the constraint
# boundary. The V=4 phase schedule itself transfers unchanged (the V=16
# done-by-k histogram is no heavier: 78% converged by iteration 4).
TUNED_F32_V16: dict[str, Any] = dict(qp_fixed_iters=9)

# Side-selection controller f32 calibration (scripts/ss_throughput.py +
# 50-step canonical closed loops): its single-QP-per-round solves need a
# DEEPER fixed iteration count than the SCP loop's 7 — there is no outer
# SCP iteration to absorb a sloppy solve, and parallel-11 collapses to
# 0.52-0.86 closed-loop feasibility at k <= 10. 12 final / 8 candidate
# iterations match the f64 adaptive reference on both canonical scenarios
# (frog obj 288 vs 297 feas 1.0; parallel-11 obj 4700 vs 4695 feas 1.0,
# sides_stable 0.98). Candidate solves only rank; the winner is re-solved
# at full accuracy by the reselection round.
TUNED_F32_SIDE_SELECTION: dict[str, Any] = dict(
    qp_fixed_iters=12, side_selection_cand_iters=8, qp_tol=1e-6)

# Straggler-repacking phase schedule for BATCHED f32 stepping
# (engine.mpc_step_batch): from the warm-step done-by-k histogram (15% of
# instances converged by iteration 3, 45% by 4, 80% by 6, 92% by 8);
# 3 + 2/4 + 15/16 = 4.44 effective full-batch iterations. Recalibrated on
# the r3 triangular-formation kernel (scripts/sweep_phases.py, 30-step
# steady state): 9% faster than the previous (3,1),(2,2),(15,8) at equal
# objective; 50-step closed-loop feasibility 0.99867 vs 0.99883
# (scripts/sched_quality.py) — instances beyond a phase's capacity keep
# their prior feasible iterate.
TUNED_F32_PHASES: tuple = ((3, 1), (2, 4), (15, 16))


def tuned_f32(cfg: "SCPConfig", **extra: Any) -> "SCPConfig":
    """Apply the calibrated f32 solver settings (callers may override)."""
    return cfg.replace(**{**TUNED_F32_OVERRIDES, **extra})


# ---- reference noise-model mapping (Model.py:84-87) ----
# The reference adds N(0, REF_NOISE_RHS_STD) to dx/dt and dy/dt on EVERY
# RHS evaluation inside its adaptive integrators — per-evaluation noise
# whose realized dispersion depends on the step sizes dopri5 takes, not a
# well-defined SDE. What matters for the closed loop is the dispersion of
# the CARRIED state, which comes from ONE dopri5 call spanning the full
# dt = 0.4 s per MPC step (main.py:184-191, Q10 restart integration).
# REF_NOISE_STEP_STD is that measured per-step position std
# (scripts/measure_ref_noise.py: 2.8e-7 m at dt=0.4, atol=rtol=1e-8,
# 4 m/s cruise; consistent with sigma_rhs * sum(h_i^2)^(1/2) * ~0.9 for
# the ~9 internal steps dopri5 takes).
REF_NOISE_RHS_STD = 3e-6      # Model.py:84-87
REF_NOISE_STEP_STD = 2.8e-7   # measured carried-state std per MPC step [m]


def reference_noise_std(cfg: "SCPConfig") -> float:
    """Per-tick ``noise_std`` whose carried-state dispersion matches the
    reference's noise runs.

    Our engine adds N(0, (noise_std * tick_length)^2) to the position at
    each of the ``ticks_per_sim`` ticks (sim/engine.rollout_plant), so the
    per-step carried std is ``noise_std * tick_length * sqrt(ticks_per_sim)``.
    Matching it to REF_NOISE_STEP_STD gives this mapping. (The in-step
    time-correlation differs — the reference's logged tick k state carries
    one integration's noise over span k*tick_length, ours a k-step random
    walk — but the per-step dispersion that feeds back into the closed
    loop is matched; asserted statistically in tests/test_invariants.py.)
    """
    return REF_NOISE_STEP_STD / (
        cfg.tick_length * math.sqrt(cfg.ticks_per_sim))


@dataclasses.dataclass(frozen=True)
class SCPConfig:
    """Static solver/problem configuration (hashable; safe as a jit static arg).

    Mirrors reference ``Scenarios.Scenario.__init__`` (Scenarios.py:42-87),
    ``Config.QCQP`` (Config.py:12-18) and the SCP literals
    (SCP_controller.py:83-86).
    """

    # Problem shape
    n_veh: int = 1
    n_obst: int = 0
    hp: int = 10            # prediction horizon (Scenarios.py:50)
    hu: int = 10            # control horizon (Scenarios.py:51)
    n_ref_points: int = 2   # padded length of reference polylines

    # Timing (seconds). All are multiples of tick_length after quantization
    # (reference complete_scenario, Scenarios.py:204-214).
    tick_length: float = 0.01
    dt: float = 0.4
    t_end: float = 20.0
    delay_x: float = 0.0
    delay_u: float = 0.03

    # Limits (Scenarios.py:52-54)
    lateral_accel_limit: float = 9.81 / 2
    mechanical_steering_limit: float = math.pi / 180 * 3
    du_lim: float = math.pi / 180 * 6      # steering-rate limit per MPC step
    u_lim: float = math.pi / 180 * 3       # box bound in the QP (see Q1 note)

    # Collision geometry
    dsafe_extra: float = 1.0               # Scenarios.py:58

    # SCP loop (SCP_controller.py:83-86,191-195)
    max_scp_iter: int = 20
    delta_tol: float = 1e-3
    delta_tol_rel: float = 0.0   # relative merit stop (needed for float32)
    u_step_tol: float = 0.0      # scale-free iterate-step stop (radians)
    merit_patience: int = 0      # >0: stop after this many consecutive
    # iterations without improving the best merit by the delta threshold —
    # catches f32 QP-noise oscillation that the |delta| stop never exits
    scp_keep_best: bool = False  # return the best-merit iterate instead of
    # the last (monotone SCP): an f32 inner QP can return a merit-worsening
    # step on flat-objective instances; keep-best makes that harmless.
    # Off by default for reference compat (the reference keeps the last).
    slack_weight: float = 1e5              # psi_omega_weight, exact-penalty weight
    slack_ub: float = 1e8                  # reference uses 1e25; clamped for f32
    constraint_tolerance: float = 2 * 2.1 * 1e-3  # Config.py:18

    # Penalty-score constants (QCQP_evaluate, SCP_controller.py:216-218)
    c_quad: float = 1e9
    c_linear: float = 0.0

    # Inner QP solver
    qp_max_iter: int = 30
    qp_tol: float = 1e-7
    qp_fixed_iters: int = 0   # >0: run exactly this many IPM iterations
    qp_correctors: int = 0    # Gondzio centrality correctors per iteration
    # (fused TPU kernel only): extra backsolves on the same factor that
    # lengthen steps, trading factorizations for solves
    qp_warm_dual: bool = False  # warm-start IPM duals from the previous
    # SCP iteration's solve (allows fewer fixed iterations)
    qp_cheap_k: bool = False  # form KKT matrix with fast bf16 matmul
    qp_kkt: str = "dense"  # KKT factorization of the inner IPM:
    # "dense"  — condensed O((V*hu)^3) factor (golden-parity default);
    # "banded" — block-banded/Riccati formulation (ops/riccati.py),
    #            O(hp * (V*NX)^3): linear in the horizon — the long-
    #            horizon path (the dense factor is the hp>=48 VMEM cliff);
    # "auto"   — fused dense kernel where it fits, banded wherever the
    #            dense path would fall back (VMEM gate / non-TPU backend).

    # Integration substeps: RK4 steps per tick for plant / delay compensation.
    rk4_substeps: int = 1

    # Reference-compat switches (SURVEY.md §2a):
    # Q10 — the reference integrates each tick from the step start with the
    # control sampled at that tick's END, so the state carried into the next
    # step sees the latest command over the WHOLE step (the 3-tick actuator
    # delay never reaches the carried state). False = physically-correct
    # piecewise-constant control with the delay switch.
    plant_compat_q10: bool = True
    # Q5 — obstacle violations invisible to the SCP stop rule when n_veh == 1.
    compat_q5: bool = True

    # Noise (Model.py:84-87): std of the white noise on dx, dy.
    noise_std: float = 0.0

    # Controller: "scp" (SCP_controller.py) or "side_selection" (the convex
    # replacement of the big-M MIQP, see scp_tpu/solvers/miqp.py).
    controller: str = "scp"

    def __post_init__(self):
        # Hu != Hp is an explicit unsupported subset of the closed-loop
        # engine, not a silent corruption (VERDICT r4 missing #3): the
        # reference's SCP controller itself uses Hp throughout
        # (SCP_controller.py:78-80; only the unused-by-its-scenarios MIQP
        # variant reads Hu, MIQP.py:127-129), and the engine's warm-start /
        # rate-row / banded-KKT plumbing all assume hp == hu. The
        # ops layer's Hu < Hp condensed truncation (MPC_Iter.py:147
        # semantics) remains supported and golden-tested at the
        # ops/condensed.py level, which takes hp/hu directly.
        if self.hu != self.hp:
            raise ValueError(
                f"SCPConfig requires hu == hp for the closed-loop engine "
                f"(got hp={self.hp}, hu={self.hu}); the condensed-matrix "
                f"ops support Hu < Hp truncation directly via "
                f"ops.condensed.prediction_matrices(hp=, hu=)")
    side_selection_rounds: int = 2
    # side-selection candidate-phase QP iteration count (0 = use
    # qp_fixed_iters): candidates only need ranking fidelity — the winner
    # is refined at full accuracy by the reselection round(s)
    side_selection_cand_iters: int = 0
    # obstAsQCQP (Config.py:8, MIQP.py:224-253): True = obstacles as circles
    # at the safety distance; False = rotated rectangles with chord-augmented
    # dimensions (side_selection controller only).
    obst_as_qcqp: bool = True

    # ---- derived tick quantities (reference Scenarios.py:204-214) ----
    @property
    def ticks_per_sim(self) -> int:
        return round(self.dt / self.tick_length + 1e-8)

    @property
    def n_sim(self) -> int:
        return round(self.t_end / self.dt + 1e-8)

    @property
    def ticks_total(self) -> int:
        return self.n_sim * self.ticks_per_sim

    @property
    def ticks_delay_x(self) -> int:
        return round(self.delay_x / self.tick_length + 1e-8)

    @property
    def ticks_delay_u(self) -> int:
        return round(self.delay_u / self.tick_length + 1e-8)

    @property
    def n_pairs(self) -> int:
        return self.n_veh * (self.n_veh - 1) // 2

    @property
    def n_constraints(self) -> int:
        """Avoidance rows in the linearized QP (SCP_controller.py:80)."""
        return self.hp * (self.n_pairs + self.n_veh * self.n_obst)

    @property
    def delay_comp_time(self) -> float:
        """Horizon of the delay-compensation rollout (MPC_Iter.py:26-29)."""
        return self.delay_x + self.dt + self.delay_u

    def replace(self, **kw: Any) -> "SCPConfig":
        return dataclasses.replace(self, **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VehicleParams:
    """Per-vehicle parameter arrays, shape (n_veh,) each.

    Vectorized form of the reference's per-vehicle lists
    (``Scenario.addVehicle``, Scenarios.py:89-103).
    """

    lf: jax.Array        # center -> front axle [m]
    lr: jax.Array        # center -> rear axle  [m]
    length: jax.Array    # bumper-to-bumper [m]
    width: jax.Array     # [m]
    q: jax.Array         # tracking weight
    q_final: jax.Array   # terminal tracking weight
    r: jax.Array         # steering-rate weight


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ScenarioData:
    """Dynamic scenario arrays. A leading batch axis may be added via vmap.

    Fields mirror the reference ``Scenario`` object after
    ``complete_scenario()`` (Scenarios.py:204-252), as stacked arrays.
    """

    x0: jax.Array           # (n_veh, NX) initial states
    u0: jax.Array           # (n_veh,) initial steering commands
    params: VehicleParams
    # Reference polylines, padded to n_ref_points with the last vertex repeated.
    ref_points: jax.Array   # (n_veh, n_ref_points, 2)
    ref_valid: jax.Array    # (n_veh, n_ref_points) bool — True for real vertices
    # Obstacle table rows: [x, y, heading, speed, length, width]
    # (Scenarios.py:105-107); zero rows when n_obst == 0.
    obstacles: jax.Array    # (n_obst, 6)
    # Safety distances (Scenarios.py:229-252).
    dsafe_veh: jax.Array    # (n_veh, n_veh)
    dsafe_obst: jax.Array   # (n_veh, n_obst)


def default_vehicle_params(n_veh: int, dtype=jnp.float64) -> VehicleParams:
    """Vectorized ``DefaultVehicle`` parameters (reference Model.py:8-29)."""
    ones = jnp.ones((n_veh,), dtype)
    return VehicleParams(
        lf=0.34 * ones,
        lr=0.34 * ones,
        length=0.98 * ones,
        width=0.88 * ones,
        q=1.0 * ones,
        q_final=20.0 * ones,
        r=4000.0 * ones,
    )
