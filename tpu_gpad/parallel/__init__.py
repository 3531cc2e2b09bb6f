"""Multi-device scaling (the layer the reference lacks entirely — SURVEY.md
section 2's parallelism checklist). Scenario batches shard over a device
mesh (data parallelism); very large single instances can additionally shard
the dual constraint dimension m (tensor parallelism) with one psum per
iteration. Communication is XLA collectives over ICI — there is no custom
comm layer to build."""

from tpu_gpad.parallel.distrib import (
    make_mesh,
    data_specs,
    pad_dual_rows,
    solve_batch_sharded,
    solve_multi_sharded,
    solve_stagewise_multi_sharded,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "data_specs",
    "pad_dual_rows",
    "solve_batch_sharded",
    "solve_multi_sharded",
    "shard_batch",
]
