"""shard_map-based distributed GPAD.

Layouts
-------
2D mesh ``(data, model)``:

- **data** (scenario DP, the workhorse): ``X0`` and all per-scenario state
  shard along the batch axis; the plant matrices replicate. Zero
  communication in fixed mode; one scalar psum per ``check_every``
  iterations in eps mode (the collective all-converged stopping test,
  ``nmpc12-gpad.pdf`` Algorithm 1 done fleet-wide).
- **model** (dual-dimension TP, for very large single instances): the
  constraint dimension m shards across devices — each holds a row slice of
  ``MG_T``, a column slice of ``GL_T`` and slices of ``p_D``/``y``/``w``.
  Step 2 psums its partial products (one (B, n_z) psum per iteration);
  steps 1/3/4 are local. Residual reductions become pmax/psum.

The per-scenario GPAD state never crosses devices in DP — each scenario is
fully resident on one chip, so scaling is embarrassingly linear (the
BASELINE.md >=0.95x target).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tpu_gpad.types import GPADData, SolveResult
from tpu_gpad.solver.core import SolverConfig, solve_batch


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ``(data, model)`` mesh. Defaults to all devices on data."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs more than {len(devices)} devices")
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def data_specs(like: GPADData, model_axis: str | None = None) -> GPADData:
    """PartitionSpecs for every GPADData leaf (static metadata copied from
    ``like`` so the pytree structures match).

    With ``model_axis`` set, the dual dimension m of MG_T/GL_T/pD shards over
    it; everything else replicates."""
    import dataclasses

    ma = model_axis
    if like.paired:
        # half-stack layout: the dual dimension m_h shards; the +/- pair
        # axis (size 2) replicates
        pD_map, pD_const = P(None, None, ma), P(None, ma)
    else:
        pD_map, pD_const = P(None, ma), P(ma)
    return dataclasses.replace(
        like,
        MG_T=P(ma, None),  # (m or m_h, n_z): rows sharded
        GL_T=P(None, ma),  # (n_z, m or m_h): cols sharded
        gP_map=P(),
        gP_const=P(),
        pD_map=pD_map,
        pD_const=pD_const,
        D=None if like.D is None else P(ma, None),  # dual-Hessian rows shard
        soft_damp=None if like.soft_damp is None else P(ma),
        L=P(),
        theta=P(),
        beta=P(),
    )


def result_specs(data_axis: str | None, model_axis: str | None, paired: bool = False) -> SolveResult:
    da, ma = data_axis, model_axis
    return SolveResult(
        u=P(da, None),
        z=P(da, None),
        y=P(da, None, ma) if paired else P(da, ma),
        iterations=P(da),
        residual=P(da),
        gap=P(da),
        converged=P(da),
    )


def shard_batch(mesh: Mesh, X0: jax.Array, data_axis: str = "data") -> jax.Array:
    """Place a scenario batch sharded along the mesh's data axis."""
    return jax.device_put(X0, jax.sharding.NamedSharding(mesh, P(data_axis, None)))


# Inert-row p_D constant: projected dual of a padded row is
# relu(w + q - _PAD_BIG) == 0 for any reachable w/q, so padded duals stay
# exactly zero from the zero initialization (shared constant: types.PAD_BIG).
from tpu_gpad.types import PAD_BIG as _PAD_BIG  # noqa: E402


def pad_dual_rows(data: GPADData, pad: int) -> GPADData:
    """Append ``pad`` inert dual rows so the dual dimension m divides a
    model (tensor-parallel) mesh axis — the "odd shapes" recipe of
    SURVEY.md section 7.

    A padded row is a vacuous constraint ``0' z <= _PAD_BIG * L``: its
    MG_T row / GL_T column (and D row+column) are zero, so it contributes
    nothing to any matmul, and its p_D constant is ``-_PAD_BIG`` so its
    projected dual is exactly 0 at every iteration (both signs in the
    paired layout). Restart dot-products, residual maxima and the gap sum
    are all unchanged by identically-zero rows. ``n_struct`` is cleared:
    padding lands after the identity block, breaking the "rows
    [n_struct:] == I" contract (TP never uses the flat path anyway)."""
    import dataclasses

    if pad <= 0:
        return data
    f32 = jnp.float32

    def pad_last(a, value=0.0):
        widths = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
        return jnp.pad(a, widths, constant_values=value)

    MG_T = jnp.pad(data.MG_T, [(0, pad), (0, 0)])  # (m(_h)+pad, n_z)
    GL_T = pad_last(data.GL_T)  # (n_z, m(_h)+pad)
    pD_map = pad_last(data.pD_map)
    pD_const = pad_last(data.pD_const, value=jnp.asarray(-_PAD_BIG, f32))
    D = None
    if data.D is not None:
        D = jnp.pad(data.D, [(0, pad), (0, pad)])
    soft_damp = None
    if data.soft_damp is not None:
        soft_damp = pad_last(data.soft_damp)  # padded rows are hard (damp 0)
    return dataclasses.replace(
        data, MG_T=MG_T, GL_T=GL_T, pD_map=pD_map, pD_const=pD_const, D=D,
        soft_damp=soft_damp, n_struct=None,
    )


@functools.partial(
    jax.jit, static_argnames=("config", "mesh", "data_axis", "model_axis")
)
def solve_batch_sharded(
    data: GPADData,
    X0: jax.Array,
    config: SolverConfig = SolverConfig(),
    *,
    mesh: Mesh,
    data_axis: str | None = "data",
    model_axis: str | None = None,
) -> SolveResult:
    """Mesh-sharded batched solve via shard_map.

    ``X0`` (B, n_x) shards along ``data_axis`` (B must divide evenly);
    optionally the dual dimension shards along ``model_axis``. A dual
    dimension that does not divide the model axis is padded with inert
    rows (``pad_dual_rows``) and the returned dual ``y`` is sliced back to
    the true m — any m is accepted. In eps mode the loop exits only when
    every scenario on every device has converged (psum'd predicate)."""
    import dataclasses

    n_data = mesh.shape[data_axis] if data_axis else 1
    n_model = mesh.shape[model_axis] if model_axis else 1
    if X0.shape[0] % n_data:
        raise ValueError(f"batch {X0.shape[0]} not divisible by data axis {n_data}")
    m_dim = data.m_half if data.paired else data.m
    dual_pad = (-m_dim) % n_model
    if dual_pad:
        data = pad_dual_rows(data, dual_pad)

    inner_cfg = dataclasses.replace(
        config,
        model_axis=model_axis,
        collective_axes=tuple(a for a in (data_axis, model_axis) if a is not None),
    )

    def local_solve(data_local: GPADData, x0_local: jax.Array) -> SolveResult:
        return solve_batch(data_local, x0_local, config=inner_cfg)

    shmapped = jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(data_specs(data, model_axis), P(data_axis, None)),
        out_specs=result_specs(data_axis, model_axis, paired=data.paired),
        check_vma=False,
    )
    out = shmapped(data, X0)
    if dual_pad:
        out = dataclasses.replace(out, y=out.y[..., :m_dim])
    return out


def _stacked_data_specs(like: GPADData, plant_axis: str) -> GPADData:
    """PartitionSpecs for a ``stack_data`` result: the leading plant axis
    of every array leaf shards over ``plant_axis``; within a plant,
    everything replicates (plants are embarrassingly parallel)."""
    import dataclasses

    from tpu_gpad.solver.multi import _ARRAYS

    base = data_specs(like, model_axis=None)
    upd = {f: P(plant_axis, *getattr(base, f)) for f in _ARRAYS}
    upd["D"] = None if like.D is None else P(plant_axis, *base.D)
    return dataclasses.replace(base, **upd)


@functools.partial(
    jax.jit, static_argnames=("config", "mesh", "plant_axis")
)
def solve_multi_sharded(
    data: GPADData,
    x0: jax.Array,
    config: SolverConfig = SolverConfig(),
    *,
    mesh: Mesh,
    plant_axis: str = "data",
) -> SolveResult:
    """Mesh-sharded multi-plant solve: the plant axis of a ``stack_data``
    result shards over ``plant_axis`` (P must divide evenly), each device
    vmapping over its local plants — fleets of heterogeneous controllers
    scale across chips with zero communication (each plant's iteration is
    fully device-resident, so scaling is embarrassingly linear, like
    scenario DP). ``x0``: (P, B, n_x) per-plant scenario batches.

    For sharding WITHIN one plant (huge batches or duals), use
    ``solve_batch_sharded`` on that plant instead — the two compose only
    by nesting meshes, which this helper deliberately does not do."""
    from tpu_gpad.solver.multi import solve_multi

    n_dev = mesh.shape[plant_axis]
    n_plants = data.theta.shape[0]
    if data.theta.ndim < 2:
        raise ValueError("solve_multi_sharded needs a stack_data result")
    if n_plants % n_dev:
        raise ValueError(
            f"plant count {n_plants} not divisible by mesh axis {n_dev}"
        )
    if x0.shape[0] != n_plants:
        raise ValueError(
            f"x0 leading axis {x0.shape[0]} != number of plants {n_plants}"
        )

    def local_solve(data_local: GPADData, x0_local: jax.Array) -> SolveResult:
        return solve_multi(data_local, x0_local, config=config)

    pa = plant_axis
    shmapped = jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(_stacked_data_specs(data, pa), P(pa)),
        out_specs=SolveResult(
            u=P(pa), z=P(pa), y=P(pa), iterations=P(pa),
            residual=P(pa), gap=P(pa), converged=P(pa),
        ),
        check_vma=False,
    )
    return shmapped(data, x0)


def _stagewise_stacked_specs(like, plant_axis: str):
    """PartitionSpecs for a ``stack_stagewise`` result: every array leaf
    (incl. the per-plant L and schedules) gained a leading plant axis in
    the stack — shard it; meta fields ride along untouched."""
    import jax.tree_util as jtu

    leaves, treedef = jtu.tree_flatten(like)
    specs = [P(plant_axis, *([None] * (np.ndim(leaf) - 1)))
             for leaf in leaves]
    return jtu.tree_unflatten(treedef, specs)


@functools.partial(
    jax.jit, static_argnames=("config", "mesh", "plant_axis")
)
def solve_stagewise_multi_sharded(
    data,
    x0: jax.Array,
    config: SolverConfig = SolverConfig(),
    *,
    mesh: Mesh,
    plant_axis: str = "data",
) -> SolveResult:
    """Mesh-sharded multi-plant STAGE-WISE solve: the O(N) twin of
    ``solve_multi_sharded`` for fleets of heterogeneous long-horizon
    controllers. The plant axis of a ``stack_stagewise`` result (P
    different dynamics, Riccati constants and Lipschitz constants)
    shards over ``plant_axis``; each device runs its local plants'
    backward/forward sweeps with zero cross-device communication.
    ``x0``: (P, n_x) one state per plant, or (P, B, n_x) per-plant
    scenario batches."""
    from tpu_gpad.stagewise import solve_stagewise_multi

    n_dev = mesh.shape[plant_axis]
    n_plants = x0.shape[0]
    if n_plants % n_dev:
        raise ValueError(
            f"plant count {n_plants} not divisible by mesh axis {n_dev}"
        )

    def local_solve(data_local, x0_local) -> SolveResult:
        return solve_stagewise_multi(data_local, x0_local, config=config)

    pa = plant_axis
    shmapped = jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(
            _stagewise_stacked_specs(data, pa),
            P(pa, *([None] * (x0.ndim - 1))),
        ),
        out_specs=SolveResult(
            u=P(pa), z=P(pa), y=P(pa), iterations=P(pa),
            residual=P(pa), gap=P(pa), converged=P(pa),
        ),
        check_vma=False,
    )
    return shmapped(data, x0)
