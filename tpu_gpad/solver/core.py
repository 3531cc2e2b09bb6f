"""Jitted GPAD solver (the L1/L2 online layer).

TPU-native design notes
-----------------------
The reference runs one CUDA kernel per algorithm step with device-wide syncs
between them (``main.cu:160-175``). Here the whole iteration is a single
traced loop body: XLA fuses the SAXPY/projection steps into the two matmuls,
and batching over scenarios turns those matmuls into MXU-shaped
(B, m) @ (m, n_z) / (B, n_z) @ (n_z, m) products. There are no host syncs
anywhere in the loop.

Two termination modes, as in the paper (``nmpc12-gpad.pdf`` Algorithms 1-2):

- ``mode="fixed"``: hard-real-time fixed iteration budget via
  ``lax.fori_loop`` (the only mode the reference enables; ``main.cu:87,160``).
- ``mode="eps"``: epsilon-optimality checks every ``check_every`` iterations
  via ``lax.while_loop``. Under vmap-style batching there is no per-scenario
  early exit in lockstep SIMD; instead a converged mask is carried (the GPAD
  iterate is stationary at the fixed point, so converged lanes keep running
  harmlessly) and the loop exits when *all* scenarios in the (possibly
  mesh-sharded) batch converge — the cross-device reduction is a ``psum``
  over ``collective_axes``. This reproduces the commented epsilon test of
  ``acceldualgrad.m:66-79``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from tpu_gpad.types import GPADData, SolveResult


@dataclass(frozen=True)
class SolverConfig:
    """Runtime solver configuration (replaces the reference's compile-time
    ``#define`` feature matrix, ``kernel_functions.h:3-7``)."""

    iterations: int | None = None  # fixed budget (or max iters in eps mode);
    # None means "the full length of the shipped theta/beta schedule"
    mode: str = "fixed"  # "fixed" | "eps"
    eps_g: float = 1e-6  # primal feasibility tolerance (acceldualgrad.m:12)
    eps_V: float = 1e-6  # duality-gap tolerance (acceldualgrad.m:13)
    check_every: int = 10  # K, cadence of the eps test (paper sec. 5.1 uses K=10)
    engine: str = "xla"  # "xla" | "pallas"
    matmul_dtype: str = "float32"  # operand dtype for the hot matmuls
    precision: str = "highest"  # lax matmul precision for fp32 operands on TPU
    # ("highest" = true fp32 on the MXU; "default" = fastest, bf16-ish passes)
    collective_axes: tuple = ()  # mesh axes to psum the all-converged test over
    model_axis: str | None = None  # mesh axis the dual dimension m is sharded
    # over (tensor parallelism): step-2 partial products are psum'd per
    # iteration; residual reductions become pmax/psum over this axis
    unroll: int = 1  # fori_loop unroll factor


def affine_params(data: GPADData, x0: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-scenario dual constants: g_P(x0), p_D(x0) (acceldualgrad.m:21,23)."""
    g_P = x0 @ data.gP_map + data.gP_const
    p_D = x0 @ data.pD_map + data.pD_const
    return g_P, p_D


def _make_matmul(config: "SolverConfig"):
    """Hot-loop matmul closure: operand dtype + MXU precision from config."""
    mm_dtype = jnp.dtype(config.matmul_dtype)
    precision = lax.Precision(config.precision.lower())

    def mm(a, b):
        return jnp.matmul(
            a.astype(mm_dtype),
            b.astype(mm_dtype),
            precision=precision,
            preferred_element_type=jnp.float32,
        )

    return mm


def _iteration(data: GPADData, g_P, p_D, theta_k, beta_k, y, y_prev, z, mm,
               model_axis=None):
    """One GPAD iteration (steps 1-4, acceldualgrad.m:43-52), batched.

    Under tensor parallelism (``model_axis`` set, dual dimension m sharded
    across the mesh inside shard_map) step 2's row-slice partial products are
    reduced with a single psum; steps 1/3/4 are embarrassingly local.
    """
    w = y + beta_k * (y - y_prev)
    zhat_partial = mm(w, data.MG_T)
    if model_axis is not None:
        zhat_partial = lax.psum(zhat_partial, model_axis)
    zhat = -zhat_partial - g_P
    z = (1.0 - theta_k) * z + theta_k * zhat
    y_next = jnp.maximum(w + mm(zhat, data.GL_T) + p_D, 0.0)
    return w, zhat, z, y_next


def _residuals(data: GPADData, g_P, p_D, z, zhat, w, mm, model_axis=None):
    """Primal violation max(G z - b) and gap surrogate -w' g(zhat).

    Recovered from the scaled operands: g(z) = L * (G_L z + p_D)."""
    gz = data.L * (mm(z, data.GL_T) + p_D)
    gzh = data.L * (mm(zhat, data.GL_T) + p_D)
    viol_z = jnp.max(gz, axis=-1)
    viol_zhat = jnp.max(gzh, axis=-1)
    gap = -jnp.sum(w * gzh, axis=-1)
    if model_axis is not None:
        viol_z = lax.pmax(viol_z, model_axis)
        viol_zhat = lax.pmax(viol_zhat, model_axis)
        gap = lax.psum(gap, model_axis)
    return viol_z, viol_zhat, gap


def _init_state(data: GPADData, batch_shape):
    zeros = functools.partial(jnp.zeros, dtype=jnp.float32)
    y = zeros(batch_shape + (data.m,))
    y_prev = zeros(batch_shape + (data.m,))
    z = zeros(batch_shape + (data.n_z,))
    w = zeros(batch_shape + (data.m,))
    zhat = zeros(batch_shape + (data.n_z,))
    return y, y_prev, z, w, zhat


def _solve_fixed(data: GPADData, g_P, p_D, config: SolverConfig) -> SolveResult:
    mm = _make_matmul(config)
    batch_shape = g_P.shape[:-1]
    y, y_prev, z, w, zhat = _init_state(data, batch_shape)

    def body(k, carry):
        y, y_prev, z, _, _ = carry
        w, zhat, z, y_next = _iteration(
            data, g_P, p_D, data.theta[k], data.beta[k], y, y_prev, z, mm,
            config.model_axis,
        )
        return y_next, y, z, w, zhat

    y, y_prev, z, w, zhat = lax.fori_loop(
        0, config.iterations, body, (y, y_prev, z, w, zhat), unroll=config.unroll
    )
    viol_z, _, gap = _residuals(data, g_P, p_D, z, zhat, w, mm, config.model_axis)
    iters = jnp.full(batch_shape, config.iterations, dtype=jnp.int32)
    return SolveResult(
        u=z[..., : data.n_u],
        z=z,
        y=y,
        iterations=iters,
        residual=jnp.maximum(viol_z, 0.0),
        gap=gap,
        converged=jnp.ones(batch_shape, dtype=bool),
    )


def _solve_eps(data: GPADData, g_P, p_D, config: SolverConfig) -> SolveResult:
    mm = _make_matmul(config)
    batch_shape = g_P.shape[:-1]
    y, y_prev, z, w, zhat = _init_state(data, batch_shape)
    converged = jnp.zeros(batch_shape, dtype=bool)
    iters = jnp.full(batch_shape, config.iterations, dtype=jnp.int32)
    z_out = z  # primal point captured at first convergence per scenario
    k0 = jnp.asarray(0, dtype=jnp.int32)
    done = jnp.asarray(False)

    def cond(carry):
        k, done, *_ = carry
        return jnp.logical_and(k < config.iterations, jnp.logical_not(done))

    def body(carry):
        k, done, y, y_prev, z, w, zhat, converged, iters, z_out = carry
        w, zhat, z, y_next = _iteration(
            data, g_P, p_D, data.theta[k], data.beta[k], y, y_prev, z, mm,
            config.model_axis,
        )
        y_prev, y = y, y_next

        def check(args):
            converged, iters, z_out = args
            viol_z, viol_zhat, gap = _residuals(data, g_P, p_D, z, zhat, w, mm, config.model_axis)
            ok_z = viol_z <= config.eps_g
            ok_zhat = jnp.logical_and(viol_zhat <= config.eps_g, gap <= config.eps_V)
            ok = jnp.logical_or(ok_z, ok_zhat)
            newly = jnp.logical_and(ok, jnp.logical_not(converged))
            iters = jnp.where(newly, k + 1, iters)
            # On the zhat branch the eps-optimal point is zhat (paper Alg. 1):
            # it is exactly optimal for the Lagrangian at w, while the averaged
            # z may still be infeasible.
            z_sel = jnp.where(ok_z[..., None], z, zhat)
            z_out = jnp.where(newly[..., None], z_sel, z_out)
            return jnp.logical_or(converged, ok), iters, z_out

        do_check = (k + 1) % config.check_every == 0
        converged, iters, z_out = lax.cond(
            do_check, check, lambda a: a, (converged, iters, z_out)
        )
        n_unconverged = jnp.sum(jnp.logical_not(converged).astype(jnp.int32))
        for ax in config.collective_axes:
            n_unconverged = lax.psum(n_unconverged, ax)
        done = n_unconverged == 0
        return k + 1, done, y, y_prev, z, w, zhat, converged, iters, z_out

    carry = (k0, done, y, y_prev, z, w, zhat, converged, iters, z_out)
    (k, done, y, y_prev, z, w, zhat, converged, iters, z_out) = lax.while_loop(
        cond, body, carry
    )
    z_final = jnp.where(converged[..., None], z_out, z)
    viol_z, _, gap = _residuals(data, g_P, p_D, z_final, zhat, w, mm, config.model_axis)
    return SolveResult(
        u=z_final[..., : data.n_u],
        z=z_final,
        y=y,
        iterations=iters,
        residual=jnp.maximum(viol_z, 0.0),
        gap=gap,
        converged=converged,
    )


@functools.partial(jax.jit, static_argnames=("config",))
def solve_batch(data: GPADData, x0: jax.Array, config: SolverConfig = SolverConfig()) -> SolveResult:
    """Solve a batch of MPC QPs: ``x0`` has shape (..., n_x).

    All scenarios share the plant (hence ``MG_T``/``GL_T``); per-scenario
    constants are the affine maps of x0. The returned ``SolveResult`` fields
    carry the same leading batch dims.
    """
    import dataclasses as _dc

    n_iters = config.iterations if config.iterations is not None else data.max_iters
    if n_iters > data.max_iters:
        raise ValueError(
            f"config asks for {n_iters} iterations but the shipped momentum "
            f"schedule only has {data.max_iters}; re-dualize with a longer one"
        )
    config = _dc.replace(config, iterations=n_iters)
    g_P, p_D = affine_params(data, x0)
    if config.engine == "pallas":
        from tpu_gpad.solver import kernels

        return kernels.solve_batch_pallas(data, g_P, p_D, config)
    if config.engine != "xla":
        raise ValueError(f"unknown engine: {config.engine!r}")
    if config.mode == "fixed":
        return _solve_fixed(data, g_P, p_D, config)
    if config.mode == "eps":
        return _solve_eps(data, g_P, p_D, config)
    raise ValueError(f"unknown mode: {config.mode!r}")


def solve(data: GPADData, x0: jax.Array, config: SolverConfig = SolverConfig()) -> SolveResult:
    """Single-scenario solve: ``x0`` of shape (n_x,)."""
    return solve_batch(data, x0[None, :], config=config)
