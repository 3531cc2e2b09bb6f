"""Torque-limited inverted pendulum — the classic nonlinear MPC testbed.

The reference has no nonlinear plant (its battery problem is LTI,
``Code/MATLAB/gpad.m:34-44``); this provides the standard NMPC benchmark
for the successive-linearization layer (``tpu_gpad.nonlinear``). State
``x = [theta, omega]`` with theta = 0 hanging down, theta = pi upright;
input is the motor torque.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pendulum_dynamics(
    m: float = 1.0,
    l: float = 1.0,
    b: float = 0.1,
    g: float = 9.81,
):
    """Continuous dynamics ``f(x, u) -> xdot`` for a damped pendulum:
    ``ml^2 theta'' = -mgl sin(theta) - b theta' + u``. jax-traceable —
    discretize with ``tpu_gpad.nonlinear.rk4``."""

    def f(x, u):
        theta, omega = x[0], x[1]
        domega = (-m * g * l * jnp.sin(theta) - b * omega + u[0]) / (m * l * l)
        return jnp.stack([omega, domega])

    return f


UPRIGHT = np.array([np.pi, 0.0])
