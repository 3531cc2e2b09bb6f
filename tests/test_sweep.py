"""Chunked scenario sweep with checkpoint/resume."""

import json

import numpy as np

import tpu_gpad
from tpu_gpad import problems
from tpu_gpad.solver import SolverConfig, solve_batch
from tpu_gpad.sweep import run_sweep


def _setup():
    qp = tpu_gpad.condense(problems.battery(n_cells=3, horizon=6))
    data = tpu_gpad.dualize(qp, iterations=60, paired="auto")
    rng = np.random.default_rng(11)
    X0 = rng.uniform(-0.4, 0.4, size=(50, 3)).astype(np.float32)
    return data, X0


def test_sweep_matches_direct_solve():
    data, X0 = _setup()
    cfg = SolverConfig(iterations=60)
    out = run_sweep(data, X0, cfg, chunk_size=16)
    ref = solve_batch(data, X0, config=cfg)
    np.testing.assert_allclose(out.U, np.asarray(ref.u), atol=1e-6)
    assert out.chunks_done == 4


def test_sweep_resume(tmp_path):
    data, X0 = _setup()
    cfg = SolverConfig(iterations=60)
    ck = tmp_path / "sweep.npz"

    calls = []

    def counting_solve(d, x, c):
        calls.append(x.shape[0])
        return solve_batch(d, x, config=c)

    full = run_sweep(data, X0, cfg, chunk_size=16, checkpoint=ck,
                     solve_fn=counting_solve)
    assert len(calls) == 4
    # simulate preemption after 2 chunks: rewind the meta file
    meta = json.loads(ck.with_suffix(".meta.json").read_text())
    meta["chunks_done"] = 2
    ck.with_suffix(".meta.json").write_text(json.dumps(meta))
    calls.clear()
    resumed = run_sweep(data, X0, cfg, chunk_size=16, checkpoint=ck,
                        solve_fn=counting_solve)
    assert len(calls) == 2  # only the unfinished chunks re-ran
    np.testing.assert_allclose(resumed.U, full.U, atol=1e-6)


def test_sweep_checkpoint_invalidated_on_shape_change(tmp_path):
    data, X0 = _setup()
    cfg = SolverConfig(iterations=60)
    ck = tmp_path / "sweep.npz"
    run_sweep(data, X0, cfg, chunk_size=16, checkpoint=ck)
    calls = []

    def counting_solve(d, x, c):
        calls.append(x.shape[0])
        return solve_batch(d, x, config=c)

    # different chunking: checkpoint must not be reused
    run_sweep(data, X0, cfg, chunk_size=25, checkpoint=ck, solve_fn=counting_solve)
    assert len(calls) == 2


def test_sweep_checkpoint_invalidated_on_config_change(tmp_path):
    data, X0 = _setup()
    ck = tmp_path / "sweep.npz"
    run_sweep(data, X0, SolverConfig(iterations=60), chunk_size=16, checkpoint=ck)
    calls = []

    def counting_solve(d, x, c):
        calls.append(x.shape[0])
        return solve_batch(d, x, config=c)

    # different iteration budget: stale rows must NOT be reused
    run_sweep(data, X0, SolverConfig(iterations=30), chunk_size=16,
              checkpoint=ck, solve_fn=counting_solve)
    assert len(calls) == 4


def test_sweep_checkpoint_invalidated_on_scenario_change(tmp_path):
    """Different X0 contents with identical shapes must not reuse results."""
    data, X0 = _setup()
    ck = tmp_path / "sweep.npz"
    cfg = SolverConfig(iterations=60)
    first = run_sweep(data, X0, cfg, chunk_size=16, checkpoint=ck)
    X0b = X0 + 0.01
    second = run_sweep(data, X0b, cfg, chunk_size=16, checkpoint=ck)
    assert np.abs(second.U - first.U).max() > 1e-6
