"""Numerical-health checks (the sanitizer story).

The reference has no race detector or sanitizer configs at all and carries
known hazards (SURVEY.md section 5: the Step-4/DeviceArrayCopy sync-window
overlap at ``main.cu:166-171``, the host-pointer bug in ``step2.cu:143``).
Under XLA's functional semantics those bug classes cannot exist; what CAN go
wrong numerically is divergence (a too-small Lipschitz constant makes the
dual iteration expand) or NaN poisoning from bad problem data. This module
is the ``compute-sanitizer`` equivalent: a checkified solve that *raises* on
non-finite iterates instead of silently returning garbage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from tpu_gpad.types import GPADData, SolveResult
from tpu_gpad.solver.core import SolverConfig, solve_batch


def validate_data(data: GPADData) -> list[str]:
    """Host-side sanity checks on the dual constants; returns problem list."""
    problems = []
    for name in ("MG_T", "GL_T", "gP_map", "gP_const", "pD_map", "pD_const",
                 "theta", "beta", "L", "D"):
        arr = getattr(data, name)
        if arr is None:
            continue
        if not bool(jnp.all(jnp.isfinite(arr))):
            problems.append(f"{name} contains non-finite values")
    if float(data.L) <= 0.0:
        problems.append(f"Lipschitz constant L={float(data.L)} is not positive")
    th = jnp.asarray(data.theta)
    if bool(jnp.any((th <= 0) | (th > 1))):
        problems.append("theta schedule leaves (0, 1]")
    return problems


def solve_batch_checked(
    data: GPADData,
    x0: jax.Array,
    config: SolverConfig = SolverConfig(),
    y0: jax.Array | None = None,
) -> SolveResult:
    """``solve_batch`` wrapped in ``checkify``: raises ``JaxRuntimeError``
    with a located message if the returned iterates are non-finite
    (divergence / NaN poisoning), instead of propagating garbage.

    Debug/CI tool — the checks force extra device->host sync; do not put it
    in a latency-critical loop.
    """

    def run(x0, y0):
        res = solve_batch(data, x0, config=config, y0=y0)
        checkify.check(
            jnp.all(jnp.isfinite(res.z)),
            "GPAD primal iterate z is non-finite: the dual iteration "
            "diverged (L too small?) or the problem data contains NaN/inf",
        )
        checkify.check(
            jnp.all(jnp.isfinite(res.y)),
            "GPAD dual iterate y is non-finite",
        )
        checkify.check(
            jnp.all(res.y >= 0.0),
            "dual iterate left the nonnegative orthant (projection broken)",
        )
        return res

    err, res = checkify.checkify(run)(x0, y0)
    err.throw()
    return res
