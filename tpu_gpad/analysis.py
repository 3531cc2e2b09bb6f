"""Convergence analysis: per-iteration residual/gap traces.

The cookbook's per-step analysis (``ECE_5770_GPAD_Cookbook.pdf`` p.5) and
the paper's iteration-count experiments (``nmpc12-gpad.pdf`` sec. 5.2) both
study how GPAD converges over iterations. This module runs the same jitted
iteration as the production solver but records the primal-infeasibility and
duality-gap surrogate at EVERY iteration (a ``lax.scan`` with per-step
outputs) — kept separate from ``solver.core`` so the hot paths never pay
for tracing.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_gpad.types import GPADData
from tpu_gpad.solver.core import (
    SolverConfig,
    affine_params,
    _init_state,
    _iteration,
    _make_matmul,
    _momentum,
    _residuals,
    _restart_update,
)


@dataclass
class ConvergenceTrace:
    """Per-iteration diagnostics: arrays of shape (iterations, B)."""

    residual: np.ndarray  # max primal infeasibility of z_k (unscaled)
    gap: np.ndarray  # duality-gap surrogate -w_k' g(zhat_k)
    u: np.ndarray  # (B, n_u) final first move (sanity/cross-check)


def convergence_trace(
    data: GPADData,
    x0,
    config: SolverConfig = SolverConfig(),
) -> ConvergenceTrace:
    """Run ``config.iterations`` GPAD iterations recording residual/gap at
    every step. Uses the mvp-form XLA iteration (identical math to the
    production engines); supports ``config.restart``."""
    import dataclasses

    if config.iterations is None:
        config = dataclasses.replace(config, iterations=data.max_iters)
    if config.iterations > data.max_iters and not config.restart:
        # match solve_batch's guard: jitted schedule reads clamp out-of-
        # range indices silently, which would freeze the momentum scalars
        raise ValueError(
            f"config asks for {config.iterations} iterations but the "
            f"shipped momentum schedule only has {data.max_iters}; "
            "re-dualize with a longer one"
        )
    x0 = jnp.atleast_2d(jnp.asarray(x0, dtype=jnp.float32))
    mm = _make_matmul(config)
    g_P, p_D = affine_params(data, x0)
    batch_shape = g_P.shape[:-1]

    def run(g_P, p_D):
        y, y_prev, z, w, zhat = _init_state(data, batch_shape)
        ones = jnp.ones(batch_shape, dtype=jnp.float32)

        def step(carry, k):
            y, y_prev, z, th, th_prev = carry
            theta_k, beta_k = _momentum(config, data, k, th, th_prev)
            w, zhat, z, y_next = _iteration(
                data, g_P, p_D, theta_k, beta_k, y, y_prev, z, mm, None
            )
            if config.restart:
                y_prev, th, th_prev = _restart_update(
                    config, th, th_prev, y, y_next, w
                )
            else:
                y_prev = y
            viol_z, _, gap = _residuals(data, g_P, p_D, z, zhat, w, mm)
            return (y_next, y_prev, z, th, th_prev), (
                jnp.maximum(viol_z, 0.0),
                gap,
            )

        (y, y_prev, z, _, _), (res_hist, gap_hist) = jax.lax.scan(
            step, (y, y_prev, z, ones, ones),
            jnp.arange(config.iterations),
        )
        return res_hist, gap_hist, z[..., : data.n_u]

    res_hist, gap_hist, u = jax.jit(run)(g_P, p_D)
    return ConvergenceTrace(
        residual=np.asarray(res_hist),
        gap=np.asarray(gap_hist),
        u=np.asarray(u),
    )


def plot_convergence(trace: ConvergenceTrace, scenario: int = 0,
                     path: str | None = None):
    """Semilog residual/gap curves (the cookbook-figure analogue)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover
        return None
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.semilogy(np.maximum(trace.residual[:, scenario], 1e-16),
                label="primal infeasibility")
    ax.semilogy(np.maximum(np.abs(trace.gap[:, scenario]), 1e-16),
                label="|duality-gap surrogate|")
    ax.set_xlabel("iteration")
    ax.legend()
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=120)
    return fig
