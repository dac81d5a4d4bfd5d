"""Measure the reference noise model's realized position dispersion.

The reference injects N(0, 3e-6) into dx/dt and dy/dt on EVERY RHS
evaluation inside its adaptive integrators (Model.py:84-87,112-114) — a
per-evaluation perturbation whose realized effect depends on the step sizes
dopri5 happens to take, not a well-defined SDE. The quantity that matters
for closed-loop behavior is the dispersion of the CARRIED state: the state
at the last tick of each MPC step comes from one dopri5 call spanning the
full dt=0.4 s (main.py:184-191, Q10 restart integration).

This script measures that dispersion empirically (dopri5, atol=rtol=1e-8,
straight-line cruise at the default 4 m/s) to calibrate
``config.REF_NOISE_STEP_STD``; see ``config.reference_noise_std`` for the
per-tick mapping our engine uses.

Result (3000 samples, recorded 2026-08-21):
    span 0.4 s  (per MPC step): std x,y ~= 2.81e-7 / 2.78e-7 m
    span 0.01 s (per tick call): std x,y ~= 2.02e-8 / 2.05e-8 m
"""
import sys

import numpy as np
from scipy import integrate

sys.path.insert(0, "tests")
from reference_oracle import load_reference  # noqa: E402


def main(n=3000):
    ref = load_reference()
    noisy = ref.Model.BicyleModel(True)
    clean = ref.Model.BicyleModel(False)
    x0 = np.array([0.0, 0.0, 0.0, 4.0, 0.0, 0.0])
    u_ref, lf, lr = 0.0, 0.34, 0.34

    def integ(model, span, seed=None):
        if seed is not None:
            np.random.seed(seed)
        p = integrate.ode(model.odes_).set_integrator(
            "dopri5", atol=1e-8, rtol=1e-8)
        p.set_initial_value(x0.copy(), t=0.0).set_f_params(u_ref, lf, lr)
        return p.integrate(span)

    for span in (0.4, 0.01):
        base = integ(clean, span)
        devs = np.empty((n, 2))
        for i in range(n):
            devs[i] = integ(noisy, span, seed=i)[:2] - base[:2]
        print(f"span={span}: std x,y = {devs.std(0)} (mean {devs.mean(0)})")


if __name__ == "__main__":
    main()
