"""Convergence traces (per-iteration residual/gap)."""

import numpy as np

import tpu_gpad
from tpu_gpad import problems
from tpu_gpad.analysis import convergence_trace, plot_convergence
from tpu_gpad.solver import SolverConfig, solve_batch


def _setup():
    qp = tpu_gpad.condense(problems.battery(n_cells=3, horizon=6))
    data = tpu_gpad.dualize(qp, iterations=150, paired="auto")
    rng = np.random.default_rng(4)
    X0 = rng.uniform(-0.4, 0.4, size=(3, 3)).astype(np.float32)
    return qp, data, X0


def test_trace_matches_solver_and_decreases():
    qp, data, X0 = _setup()
    cfg = SolverConfig(iterations=150)
    tr = convergence_trace(data, X0, cfg)
    assert tr.residual.shape == (150, 3)
    # final u agrees with the production solver (same math)
    ref = solve_batch(data, X0, config=cfg)
    np.testing.assert_allclose(tr.u, np.asarray(ref.u), atol=1e-6)
    # residual at the end is far below its early peak
    assert tr.residual[-1].max() < 0.05 * tr.residual[:10].max()


def test_trace_restart_converges_faster():
    qp, data, X0 = _setup()
    plain = convergence_trace(data, X0, SolverConfig(iterations=150))
    fast = convergence_trace(
        data, X0, SolverConfig(iterations=150, restart=True)
    )
    assert fast.residual[-1].max() < plain.residual[-1].max()


def test_trace_matches_oracle_history():
    from tpu_gpad.solver.reference import gpad_solve_qp

    qp, data, X0 = _setup()
    tr = convergence_trace(data, X0[:1], SolverConfig(iterations=100))
    orc = gpad_solve_qp(qp, X0[0], iterations=100, history=True)
    np.testing.assert_allclose(
        tr.residual[:, 0], orc.residual_history, atol=1e-5
    )


def test_plot_smoke(tmp_path):
    qp, data, X0 = _setup()
    tr = convergence_trace(data, X0, SolverConfig(iterations=50))
    out = tmp_path / "conv.png"
    fig = plot_convergence(tr, path=str(out))
    if fig is not None:
        assert out.exists()


def test_trace_rejects_overlong_budget():
    import pytest

    qp, data, X0 = _setup()
    with pytest.raises(ValueError, match="schedule"):
        convergence_trace(data, X0, SolverConfig(iterations=500))
