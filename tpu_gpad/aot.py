"""AOT solver export: serialized StableHLO artifacts for serving.

The reference ships a prebuilt solver binary (`build/main`, SURVEY.md C10)
compiled for one GPU architecture. The TPU-native analogue is
``jax.export``: trace + lower the jitted solve once, serialize the
StableHLO (with the problem constants baked in), and reload it later —
in a process that never imports ``tpu_gpad`` or re-traces anything — via
``load_solver``. One artifact = one deployed controller.

Two batch conventions:

- ``batch_size=None`` (default): the batch dimension is exported
  SYMBOLIC (any batch size at call time). Symbolic shapes cannot flow
  through the Pallas kernels' static grids, so the artifact uses the XLA
  engine.
- ``batch_size=B``: concrete shapes; the engine resolves exactly as a
  live ``solve_batch`` would (fused Pallas kernels on TPU), at the cost
  of serving that one batch size only.

The exported callable returns the ``SolveResult`` fields as a plain dict
(pytree-serialization-friendly).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp

from tpu_gpad.types import GPADData
from tpu_gpad.solver.core import SolverConfig, solve_batch


def export_solver(
    data: GPADData,
    config: SolverConfig = SolverConfig(),
    batch_size: int | None = None,
    path: str | Path | None = None,
) -> bytes:
    """Serialize an AOT-compiled batched solve for this problem.

    The returned bytes (also written to ``path`` if given) reload with
    :func:`load_solver` on a machine with the same accelerator platform.
    All problem constants (``GPADData``) are baked into the artifact; the
    only runtime input is ``x0`` of shape (B, n_x) float32.
    """
    from jax import export as jexport

    if batch_size is None:
        # symbolic batch: any B at call time; Pallas grids need static
        # shapes, so pin the XLA engine
        config = dataclasses.replace(config, engine="xla")
        (b,) = jexport.symbolic_shape("b")
        x_spec = jax.ShapeDtypeStruct((b, data.n_x), jnp.float32)
    else:
        x_spec = jax.ShapeDtypeStruct((batch_size, data.n_x), jnp.float32)

    def fn(x0):
        res = solve_batch(data, x0, config=config)
        return {
            "u": res.u,
            "z": res.z,
            "y": res.y,
            "iterations": res.iterations,
            "residual": res.residual,
            "gap": res.gap,
            "converged": res.converged,
        }

    exported = jexport.export(jax.jit(fn))(x_spec)
    blob = exported.serialize()
    if path is not None:
        Path(path).write_bytes(blob)
    return blob


def load_solver(src: bytes | str | Path):
    """Deserialize an :func:`export_solver` artifact into a callable.

    Returns ``solve(x0) -> dict`` with the ``SolveResult`` fields. Needs
    only jax at load time (no tpu_gpad imports, no re-trace, no
    re-compile beyond XLA consuming the shipped StableHLO)."""
    from jax import export as jexport

    if not isinstance(src, (bytes, bytearray)):
        src = Path(src).read_bytes()
    exported = jexport.deserialize(bytes(src))

    def solve(x0):
        return exported.call(jnp.asarray(x0, dtype=jnp.float32))

    return solve


def export_stagewise_solver(
    data,
    config: SolverConfig = SolverConfig(),
    batch_size: int | None = None,
    path: str | Path | None = None,
) -> bytes:
    """:func:`export_solver` for the STAGE-WISE engine: one deployable
    long-horizon controller artifact with the O(N) Riccati constants
    baked in (``StagewiseData`` from ``build_stagewise``).

    Same two batch conventions: symbolic batch pins the XLA stage-wise
    executor (the fused kernel's grid and the measured routing rules
    need a concrete B); a concrete ``batch_size`` resolves routing
    exactly as a live ``solve_stagewise`` would."""
    from jax import export as jexport

    from tpu_gpad.stagewise import solve_stagewise

    engine, scan = "auto", "auto"
    if batch_size is None:
        # symbolic batch: no branch on B is possible, so pin the XLA
        # executor with sequential sweeps (the batch-dependent kernel
        # and associative routing rules need a concrete B)
        engine, scan = "xla", "sequential"
        (b,) = jexport.symbolic_shape("b")
        x_spec = jax.ShapeDtypeStruct((b, data.n_x), jnp.float32)
    else:
        x_spec = jax.ShapeDtypeStruct((batch_size, data.n_x), jnp.float32)

    def fn(x0):
        res = solve_stagewise(
            data, x0, config=config, engine=engine, scan=scan)
        return {
            "u": res.u,
            "z": res.z,
            "y": res.y,
            "iterations": res.iterations,
            "residual": res.residual,
            "gap": res.gap,
            "converged": res.converged,
        }

    exported = jexport.export(jax.jit(fn))(x_spec)
    blob = exported.serialize()
    if path is not None:
        Path(path).write_bytes(blob)
    return blob
