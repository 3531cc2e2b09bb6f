"""Fused Pallas GPAD iteration kernel (the L2 hot path).

TPU-native design (SURVEY.md section 7, build step 3)
-----------------------------------------------------
The reference launches 5 CUDA kernels per GPAD iteration with three
device-wide syncs between them and every iterate round-tripping through HBM
(``Code/CUDA/FinalProject/main.cu:160-175``). Here the *entire solve* — all
``iterations`` of steps 1-4 — is ONE kernel invocation per batch tile:

- ``MG_T`` (m, n_z) and ``GL_T`` (n_z, m) are staged into VMEM once and
  reused for every iteration of every scenario in the tile (their index map
  is constant, so Mosaic does not re-fetch them between grid steps);
- the dual/primal iterates ``y, y_prev, z, w, zhat`` live in VMEM/vregs as
  ``fori_loop`` carries — zero HBM traffic inside the loop;
- the two hot MVPs run as (B_t, m) @ (m, n_z) and (B_t, n_z) @ (n_z, m) MXU
  matmuls fused with their SAXPY/projection neighbors on the VPU (the
  replacement for ``kernel_functions.cu:16-64`` step 2 and ``:142-200``
  step 4 + the branchless projection at ``:195``);
- the momentum schedule ``theta/beta`` is scalar-prefetched into SMEM —
  the TPU equivalent of the reference shipping the precomputed schedule with
  the problem file (``main.cu:61-64``).

Padding: m and n_z are padded to lane multiples (128). Zero padding is
*inert* through the iteration: padded rows/cols of the operands are zero, so
padded lanes of ``w``/``zhat`` stay identically zero and ``y = relu(0)`` stays
zero (no -inf sentinels needed; cf. the sentinel discussion in SURVEY.md §7).

The kernel is used when both condensed matrices fit in VMEM alongside a
batch tile (true for every bundled benchmark config); otherwise the solver
falls back to the XLA engine, which pipelines HBM-resident matmuls well at
those sizes (``engine="auto"``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_gpad.types import GPADData, SolveResult

LANE = 128
SUBLANE = 8
_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom below the ~16 MB/core VMEM


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def _pad2(x: jax.Array, rows: int, cols: int) -> jax.Array:
    r, c = x.shape
    if r == rows and c == cols:
        return x
    return jnp.pad(x, ((0, rows - r), (0, cols - c)))


def vmem_bytes(batch_tile: int, m_p: int, nz_p: int, iters_bytes: int = 0) -> int:
    """Estimated VMEM footprint of one grid step of the fused kernel."""
    mats = 4 * (m_p * nz_p) * 2  # MG_T + GL_T, fp32
    per_row = 4 * (4 * m_p + 4 * nz_p)  # y,y_prev,w,p_D + z,zhat,g_P,z_out... (approx)
    return mats + batch_tile * per_row + iters_bytes


def pick_batch_tile(B: int, m_p: int, nz_p: int) -> int | None:
    """Largest power-of-two batch tile that fits the VMEM budget, or None if
    even the smallest tile does not fit (caller should fall back to XLA)."""
    for bt in (512, 256, 128, 64, 32, 16, 8):
        if bt > max(B, 8):
            continue
        if vmem_bytes(bt, m_p, nz_p) <= _VMEM_BUDGET:
            return bt
    return 8 if vmem_bytes(8, m_p, nz_p) <= _VMEM_BUDGET else None


def fits_vmem(data: GPADData) -> bool:
    m_p = _round_up(data.m, LANE)
    nz_p = _round_up(data.n_z, LANE)
    return pick_batch_tile(8, m_p, nz_p) is not None


def _gpad_kernel(
    # scalar prefetch
    theta_ref,
    beta_ref,
    # tensor inputs
    gP_ref,
    pD_ref,
    MG_ref,
    GL_ref,
    # outputs
    z_ref,
    y_ref,
    w_ref,
    zhat_ref,
    *,
    iterations: int,
    mm_dtype,
    precision,
):
    """One batch tile: run the full GPAD loop with VMEM-resident state."""
    MG = MG_ref[:].astype(mm_dtype)  # (m_p, nz_p)
    GL = GL_ref[:].astype(mm_dtype)  # (nz_p, m_p)
    g_P = gP_ref[:]  # (B_t, nz_p)
    p_D = pD_ref[:]  # (B_t, m_p)

    f32 = jnp.float32
    # Initial iterates derived from loaded operands (not a zeros broadcast):
    # Mosaic assigns broadcast-zeros a replicated vector layout that cannot be
    # relayout'd against the general layout of loop-carried values.
    y0 = p_D * 0.0
    z0 = g_P * 0.0

    def body(k, carry):
        y, y_prev, z, _, _ = carry
        beta_k = beta_ref[k]
        theta_k = theta_ref[k]
        # Step 1 (SAXPY): w = y + beta (y - y_prev)        [VPU]
        w = y + beta_k * (y - y_prev)
        # Step 2 (MVP):   zhat = -(w @ MG_T) - g_P         [MXU]
        zhat = (
            -jnp.dot(
                w.astype(mm_dtype), MG,
                preferred_element_type=f32, precision=precision,
            )
            - g_P
        )
        # Step 3 (SAXPY): z = (1-theta) z + theta zhat     [VPU]
        z = (1.0 - theta_k) * z + theta_k * zhat
        # Step 4 (MVP + branchless projection onto y >= 0) [MXU + VPU]
        y_next = jnp.maximum(
            w
            + jnp.dot(
                zhat.astype(mm_dtype), GL,
                preferred_element_type=f32, precision=precision,
            )
            + p_D,
            0.0,
        )
        return y_next, y, z, w, zhat

    y, y_prev, z, w, zhat = jax.lax.fori_loop(
        0, iterations, body, (y0, y0, z0, y0, z0)
    )
    z_ref[:] = z
    y_ref[:] = y
    w_ref[:] = w
    zhat_ref[:] = zhat


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "matmul_dtype", "precision", "interpret"),
)
def gpad_pallas_fixed(
    data: GPADData,
    g_P: jax.Array,
    p_D: jax.Array,
    *,
    iterations: int,
    matmul_dtype: str = "float32",
    precision: str = "highest",
    interpret: bool = False,
):
    """Run the fused fixed-budget GPAD kernel on a (B, n_z)/(B, m) batch.

    Returns padded-stripped final (z, y, w, zhat)."""
    B = g_P.shape[0]
    m, n_z = data.m, data.n_z
    m_p = _round_up(m, LANE)
    nz_p = _round_up(n_z, LANE)
    B_t = pick_batch_tile(B, m_p, nz_p)
    if B_t is None:
        raise ValueError(
            f"problem (m={m}, n_z={n_z}) does not fit the fused kernel's VMEM "
            "budget; use engine='xla'"
        )
    B_p = _round_up(B, B_t)

    MG = _pad2(data.MG_T, m_p, nz_p)
    GL = _pad2(data.GL_T, nz_p, m_p)
    gP = _pad2(g_P, B_p, nz_p)
    pD = _pad2(p_D, B_p, m_p)
    theta = data.theta[:iterations]
    beta = data.beta[:iterations]

    grid = (B_p // B_t,)
    kernel = functools.partial(
        _gpad_kernel,
        iterations=iterations,
        mm_dtype=jnp.dtype(matmul_dtype),
        precision=jax.lax.Precision(precision.lower()),
    )
    # index maps receive (grid_idx, *scalar_prefetch_refs)
    batch_spec_nz = pl.BlockSpec(
        (B_t, nz_p), lambda i, th, be: (i, 0), memory_space=pltpu.VMEM
    )
    batch_spec_m = pl.BlockSpec(
        (B_t, m_p), lambda i, th, be: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda r, c: pl.BlockSpec(
        (r, c), lambda i, th, be: (0, 0), memory_space=pltpu.VMEM
    )

    flops_mm = 2 * B_t * m_p * nz_p * 2 * iterations * (B_p // B_t)
    z, y, w, zhat = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # theta, beta -> SMEM
            grid=grid,
            in_specs=[
                batch_spec_nz,  # g_P
                batch_spec_m,  # p_D
                full(m_p, nz_p),  # MG_T (constant index map: fetched once)
                full(nz_p, m_p),  # GL_T
            ],
            out_specs=[
                batch_spec_nz,  # z
                batch_spec_m,  # y
                batch_spec_m,  # w
                batch_spec_nz,  # zhat
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B_p, nz_p), jnp.float32),
            jax.ShapeDtypeStruct((B_p, m_p), jnp.float32),
            jax.ShapeDtypeStruct((B_p, m_p), jnp.float32),
            jax.ShapeDtypeStruct((B_p, nz_p), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_mm, bytes_accessed=4 * (2 * m_p * nz_p + B_p * (m_p + nz_p)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(theta, beta, gP, pD, MG, GL)
    return z[:B, :n_z], y[:B, :m], w[:B, :m], zhat[:B, :n_z]


def solve_batch_pallas(data: GPADData, g_P: jax.Array, p_D: jax.Array, config) -> SolveResult:
    """Pallas-engine entry called from ``solver.core.solve_batch``.

    Residuals/gap are recovered outside the kernel with one cheap matmul
    (same math as the XLA engine's ``_residuals``)."""
    from tpu_gpad.solver import core as _core

    if config.model_axis is not None:
        raise ValueError(
            "engine='pallas' does not support dual-dimension tensor "
            "parallelism; use engine='xla' for model-axis sharding"
        )
    batch_shape = g_P.shape[:-1]
    Bflat = int(np.prod(batch_shape)) if batch_shape else 1
    gP2 = g_P.reshape(Bflat, data.n_z)
    pD2 = p_D.reshape(Bflat, data.m)
    interpret = jax.default_backend() != "tpu"

    if config.mode == "eps":
        # Epsilon mode needs the collective stopping test and per-scenario
        # capture logic; route it through the XLA engine (the hot production
        # path — hard-real-time fixed budget, main.cu:87 — is the kernel).
        import dataclasses

        res = _core._solve_eps(data, gP2, pD2, dataclasses.replace(config, engine="xla"))
    else:
        z, y, w, zhat = gpad_pallas_fixed(
            data,
            gP2,
            pD2,
            iterations=config.iterations,
            matmul_dtype=config.matmul_dtype,
            precision=config.precision,
            interpret=interpret,
        )
        mm = _core._make_matmul(config)
        viol_z, _, gap = _core._residuals(data, gP2, pD2, z, zhat, w, mm)
        res = SolveResult(
            u=z[:, : data.n_u],
            z=z,
            y=y,
            iterations=jnp.full((Bflat,), config.iterations, dtype=jnp.int32),
            residual=jnp.maximum(viol_z, 0.0),
            gap=gap,
            converged=jnp.ones((Bflat,), dtype=bool),
        )

    def unflatten(x):
        return x.reshape(batch_shape + x.shape[1:])

    return jax.tree.map(unflatten, res)
