"""2D point mass with quadratic drag — the trajectory-tracking NMPC testbed.

State ``x = [px, py, vx, vy]``, input ``u = [ax, ay]`` (commanded
acceleration); drag decelerates the mass by ``k |v| v``. The drag term is
the nonlinearity: without it this is a double integrator the LTI stack
already covers, with it the linearization changes along every trajectory
— the regime ``tpu_gpad.nonlinear``'s preview mode targets (a planar
drone/vehicle chasing a moving reference).
"""

from __future__ import annotations

import jax.numpy as jnp


def point_mass_drag(k: float = 0.3):
    """Continuous dynamics ``f(x, u) -> xdot``; jax-traceable. ``k`` is the
    quadratic drag coefficient (0 reduces to a double integrator)."""

    def f(x, u):
        v = x[2:]
        speed = jnp.sqrt(jnp.sum(v * v) + 1e-9)
        return jnp.concatenate([v, u - k * speed * v])

    return f


def figure_eight(n: int, dt: float, scale: float = 1.0, period: float = 8.0):
    """A (n, 4) figure-eight reference trajectory (positions + consistent
    velocities) for the point mass: a Lissajous 1:2 curve."""
    import numpy as np

    t = np.arange(n) * dt
    w = 2.0 * np.pi / period
    px = scale * np.sin(w * t)
    py = scale * np.sin(2.0 * w * t) / 2.0
    vx = scale * w * np.cos(w * t)
    vy = scale * w * np.cos(2.0 * w * t)
    return np.stack([px, py, vx, vy], axis=1)
