"""Kinematic bicycle model — pure-function JAX version.

Reimplements the dynamics of the reference ``BicyleModel`` (Model.py:61-115):
a 6-state kinematic bicycle (Rajamani, *Vehicle Dynamics and Control*, p.24)
with a first-order steering actuator ``du = (u_ref - u)/0.1`` and rear-axle ->
center speed correction.

TPU-first differences from the reference:

* the ODE is a pure ``f(x, u_ref, lf, lr)`` usable under ``jit``/``vmap``;
* the linearization is exact forward-mode autodiff (``jax.jacfwd``) instead of
  the hand-transcribed symbolic Jacobian (Model.py:45-59);
* integration is fixed-step RK4 via ``lax.scan`` (replacing
  ``scipy.integrate.odeint``/``dopri5``, MPC_Iter.py:26-29, main.py:184-191);
* process noise (Model.py:84-87) is injected with explicit ``jax.random`` keys
  so Monte-Carlo batches are a ``vmap`` over keys.

State layout: ``[x, y, heading, v_rear, accel, steering]``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from scp_tpu.config import NX, NU, NY

STEERING_TIME_CONSTANT = 0.1  # first-order actuator lag [s] (Model.py:83)


def ode(x: jax.Array, u_ref: jax.Array, lf: jax.Array, lr: jax.Array) -> jax.Array:
    """Continuous-time dynamics dx/dt. ``x``: (NX,), ``u_ref``: scalar."""
    L = lf + lr
    R = lr / L
    phi = x[2]
    v_rear = x[3]
    a = x[4]
    u = x[5]
    tan_u = jnp.tan(u)
    v_center = v_rear * jnp.sqrt(1.0 + (R * tan_u) ** 2)
    beta = jnp.arctan(R * tan_u)  # slip angle
    return jnp.stack([
        v_center * jnp.cos(phi + beta),
        v_center * jnp.sin(phi + beta),
        v_center * tan_u * jnp.cos(beta) / L,
        a,
        jnp.zeros_like(a),
        (u_ref - u) / STEERING_TIME_CONSTANT,
    ])


def output_matrix(dtype=jnp.float64) -> jax.Array:
    """C = eye(NY, NX): the measured output is the (x, y) position (Model.py:56)."""
    return jnp.eye(NY, NX, dtype=dtype)


def linearize(x: jax.Array, u_ref: jax.Array, lf: jax.Array, lr: jax.Array):
    """Exact continuous-time linearization around ``(x, u_ref)``.

    Returns ``(Ac, Bc, Ec)`` with ``dx = Ac x + Bc u + Ec`` matching the
    reference's ``comp_jacobian`` (Model.py:45-59) but via autodiff.
    ``Bc`` is analytically constant ``[0,...,0, 1/T]``.
    """
    Ac = jax.jacfwd(ode, argnums=0)(x, u_ref, lf, lr)
    Bc = jax.jacfwd(ode, argnums=1)(x, u_ref, lf, lr).reshape(NX, NU)
    f0 = ode(x, u_ref, lf, lr)
    Ec = f0 - Ac @ x - (Bc @ jnp.reshape(u_ref, (NU,)))
    return Ac, Bc, Ec


def rk4_step(x: jax.Array, u_ref: jax.Array, lf, lr, h) -> jax.Array:
    """One classical RK4 step of size ``h`` with zero-order-hold control."""
    k1 = ode(x, u_ref, lf, lr)
    k2 = ode(x + 0.5 * h * k1, u_ref, lf, lr)
    k3 = ode(x + 0.5 * h * k2, u_ref, lf, lr)
    k4 = ode(x + h * k3, u_ref, lf, lr)
    return x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


@partial(jax.jit, static_argnames=("n_steps", "substeps"))
def integrate(x0: jax.Array, u_ref: jax.Array, lf, lr, h: float,
              n_steps: int, substeps: int = 1) -> jax.Array:
    """Integrate ``n_steps`` intervals of length ``h`` with constant ``u_ref``.

    Returns the trajectory including the initial state, shape (n_steps+1, NX).
    Replaces ``scipy.integrate.odeint`` in the delay-compensation path
    (MPC_Iter.py:26-29); with smooth dynamics RK4 at tick resolution matches
    the reference's 1e-8-tolerance adaptive integrators to ~1e-9.
    """
    hs = h / substeps

    def step(x, _):
        def sub(x, _):
            return rk4_step(x, u_ref, lf, lr, hs), None
        x, _ = jax.lax.scan(sub, x, None, length=substeps, unroll=True)
        return x, x

    # unroll: these are tiny (NX,) elementwise chains — the scan's
    # per-iteration dispatch dominates; unrolled, XLA fuses stages.
    _, traj = jax.lax.scan(step, x0, None, length=n_steps, unroll=True)
    return jnp.concatenate([x0[None], traj], axis=0)


def make_init_state(x_start, y_start, heading, speed, accel=0.0, steering=0.0,
                    dtype=jnp.float64) -> jax.Array:
    """Initial state vector (reference ``makeInitState``, Model.py:42-43)."""
    return jnp.array([x_start, y_start, heading, speed, accel, steering], dtype)
