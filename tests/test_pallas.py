"""Fused Pallas kernel parity vs the XLA engine and the NumPy oracle.

On CPU the kernel runs in Pallas interpret mode (same program, interpreted),
which is the in-repo oracle strategy from SURVEY.md section 4."""

import numpy as np
import pytest

import tpu_gpad
from tpu_gpad import problems
from tpu_gpad.solver import SolverConfig, solve_batch
from tpu_gpad.solver.reference import gpad_solve_qp

from conftest import backend_tol


@pytest.fixture(scope="module")
def battery_data():
    qp = tpu_gpad.condense(problems.battery(n_cells=3, horizon=10))
    data = tpu_gpad.dualize(qp, iterations=100)
    return qp, data


def _x0_batch(n, n_x, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.4, 0.4, size=(n, n_x)).astype(np.float32)


def test_pallas_matches_xla(battery_data):
    qp, data = battery_data
    X0 = _x0_batch(12, qp.n_x)
    r_xla = solve_batch(data, X0, config=SolverConfig(iterations=60, engine="xla"))
    r_pl = solve_batch(data, X0, config=SolverConfig(iterations=60, engine="pallas"))
    np.testing.assert_allclose(np.asarray(r_pl.z), np.asarray(r_xla.z), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_pl.y), np.asarray(r_xla.y), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(r_pl.residual), np.asarray(r_xla.residual), atol=2e-5
    )


def test_pallas_matches_oracle_u(battery_data):
    qp, data = battery_data
    X0 = _x0_batch(4, qp.n_x, seed=3)
    res = solve_batch(data, X0, config=SolverConfig(iterations=100, engine="pallas"))
    for i in range(X0.shape[0]):
        ref = gpad_solve_qp(qp, X0[i].astype(np.float64), iterations=100)
        np.testing.assert_allclose(
            np.asarray(res.u[i]), ref.u, atol=backend_tol(1e-4, 2e-3)
        )


def test_pallas_single_and_odd_batch(battery_data):
    """Batch sizes that don't divide the tile exercise the zero padding."""
    qp, data = battery_data
    X0 = _x0_batch(5, qp.n_x, seed=9)
    r5 = solve_batch(data, X0, config=SolverConfig(iterations=40, engine="pallas"))
    r1 = tpu_gpad.solve(data, X0[2], config=SolverConfig(iterations=40, engine="pallas"))
    # On TPU, different batch shapes compile to different programs whose
    # 1-ulp differences amplify through the nonsmooth 40-iteration
    # trajectory (relu boundary flips) -- hence the loose device tolerance.
    np.testing.assert_allclose(
        np.asarray(r1.u[0]), np.asarray(r5.u[2]), atol=backend_tol(1e-6, 5e-3)
    )


def test_pallas_eps_mode_falls_back(battery_data):
    qp, data = battery_data
    X0 = _x0_batch(3, qp.n_x, seed=5)
    cfg = SolverConfig(mode="eps", eps_g=1e-3, eps_V=1e-3, check_every=10, engine="pallas")
    res = solve_batch(data, X0, config=cfg)
    assert bool(np.all(np.asarray(res.converged)))


def test_pallas_high_precision_bf16x3(battery_data, battery_data_paired):
    """precision='high' (3-pass fp32, bf16x3): Mosaic has no HIGH lowering,
    so the kernels run the pre-split hi/lo emulation — 2x the 'highest'
    MXU rate (measured 63 vs 31 TFLOPs, v5e) at near-fp32 accuracy. Every
    kernel form must agree with the XLA engine's native HIGH pass."""
    for qp, data in (battery_data, battery_data_paired):
        X0 = _x0_batch(6, qp.n_x, seed=43)
        for form in ("auto", "mvp"):
            r_pl = solve_batch(
                data, X0,
                config=SolverConfig(
                    iterations=60, engine="pallas", precision="high", form=form
                ),
            )
            r_xla = solve_batch(
                data, X0,
                config=SolverConfig(
                    iterations=60, engine="xla", precision="high", form=form
                ),
            )
            np.testing.assert_allclose(
                np.asarray(r_pl.u), np.asarray(r_xla.u), atol=1e-4
            )
            # bf16x3 stays close to true fp32 through 60 iterations
            r_hi = solve_batch(
                data, X0, config=SolverConfig(iterations=60, engine="xla")
            )
            np.testing.assert_allclose(
                np.asarray(r_pl.u), np.asarray(r_hi.u), atol=5e-4
            )


def test_pallas_bf16_operands(battery_data):
    qp, data = battery_data
    X0 = _x0_batch(4, qp.n_x, seed=11)
    r32 = solve_batch(data, X0, config=SolverConfig(iterations=60, engine="pallas"))
    rb = solve_batch(
        data, X0, config=SolverConfig(iterations=60, engine="pallas", matmul_dtype="bfloat16")
    )
    # bf16 matmuls: looser tolerance but same solution neighborhood
    np.testing.assert_allclose(np.asarray(rb.u), np.asarray(r32.u), atol=5e-2)


@pytest.fixture(scope="module")
def battery_data_paired():
    qp = tpu_gpad.condense(problems.battery(n_cells=3, horizon=10))
    data = tpu_gpad.dualize(qp, iterations=100, paired=True)
    return qp, data


def test_pallas_dual_matches_xla_dual(battery_data_paired):
    """The scenario-minor fused dual kernel vs the XLA dual-form loop."""
    qp, data = battery_data_paired
    X0 = _x0_batch(12, qp.n_x)
    r_xla = solve_batch(
        data, X0, config=SolverConfig(iterations=60, engine="xla", form="dual")
    )
    r_pl = solve_batch(
        data, X0, config=SolverConfig(iterations=60, engine="pallas", form="dual")
    )
    np.testing.assert_allclose(np.asarray(r_pl.z), np.asarray(r_xla.z), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_pl.y), np.asarray(r_xla.y), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(r_pl.residual), np.asarray(r_xla.residual), atol=2e-5
    )


def test_pallas_dual_matches_oracle_u(battery_data_paired):
    qp, data = battery_data_paired
    X0 = _x0_batch(4, qp.n_x, seed=3)
    res = solve_batch(data, X0, config=SolverConfig(iterations=100, engine="pallas"))
    for i in range(X0.shape[0]):
        ref = gpad_solve_qp(qp, X0[i].astype(np.float64), iterations=100)
        np.testing.assert_allclose(
            np.asarray(res.u[i]), ref.u, atol=backend_tol(1e-4, 2e-3)
        )


def test_pallas_dual_odd_batch(battery_data_paired):
    qp, data = battery_data_paired
    X0 = _x0_batch(7, qp.n_x, seed=9)
    r7 = solve_batch(data, X0, config=SolverConfig(iterations=40, engine="pallas"))
    r1 = tpu_gpad.solve(data, X0[4], config=SolverConfig(iterations=40, engine="pallas"))
    np.testing.assert_allclose(
        np.asarray(r1.u[0]), np.asarray(r7.u[4]), atol=backend_tol(1e-6, 5e-3)
    )


def test_pallas_dual_warm_start(battery_data_paired):
    """y0 warm start through the dual kernel matches the XLA engine's."""
    qp, data = battery_data_paired
    X0 = _x0_batch(6, qp.n_x, seed=21)
    cfg_pl = SolverConfig(iterations=50, engine="pallas", form="dual")
    cfg_xla = SolverConfig(iterations=50, engine="xla", form="dual")
    r1 = solve_batch(data, X0, config=cfg_xla)
    w_pl = solve_batch(data, X0, config=cfg_pl, y0=r1.y)
    w_xla = solve_batch(data, X0, config=cfg_xla, y0=r1.y)
    np.testing.assert_allclose(np.asarray(w_pl.u), np.asarray(w_xla.u), atol=2e-5)
    # warm != cold (the seed actually flows into the kernel)
    cold = solve_batch(data, X0, config=cfg_pl)
    assert np.abs(np.asarray(w_pl.y) - np.asarray(cold.y)).max() > 1e-6


def test_pallas_eps_dual_chunked(battery_data_paired):
    """The chunked eps-mode kernel agrees with the XLA Algorithm-1 loop."""
    qp, data = battery_data_paired
    X0 = _x0_batch(6, qp.n_x, seed=13)
    kw = dict(mode="eps", eps_g=1e-4, eps_V=1e-4, check_every=10, iterations=100)
    r_xla = solve_batch(data, X0, config=SolverConfig(engine="xla", **kw))
    r_pl = solve_batch(data, X0, config=SolverConfig(engine="pallas", **kw))
    assert np.array_equal(np.asarray(r_pl.converged), np.asarray(r_xla.converged))
    # iteration counts may differ by one check window at residual ~ eps
    # boundaries (different rounding between the mvp and dual algebra)
    assert (
        np.abs(np.asarray(r_pl.iterations) - np.asarray(r_xla.iterations)).max()
        <= 10
    )
    np.testing.assert_allclose(
        np.asarray(r_pl.u), np.asarray(r_xla.u), atol=2e-4
    )
    # converged scenarios deliver eps-optimal points: feasibility within eps_g
    conv = np.asarray(r_pl.converged)
    assert np.asarray(r_pl.residual)[conv].max() <= 1e-4 + 1e-6
    assert conv.any()


def test_pallas_eps_dual_nondivisible_budget(battery_data_paired):
    """iterations % check_every != 0: the pallas path runs a final partial
    chunk and checks at the budget end; the XLA loop checks there too."""
    qp, data = battery_data_paired
    X0 = _x0_batch(6, qp.n_x, seed=29)
    kw = dict(mode="eps", eps_g=1e-4, eps_V=1e-4, check_every=30, iterations=95)
    r_xla = solve_batch(data, X0, config=SolverConfig(engine="xla", **kw))
    r_pl = solve_batch(data, X0, config=SolverConfig(engine="pallas", **kw))
    assert np.array_equal(np.asarray(r_pl.converged), np.asarray(r_xla.converged))
    np.testing.assert_array_equal(
        np.asarray(r_pl.iterations), np.asarray(r_xla.iterations)
    )
    np.testing.assert_allclose(np.asarray(r_pl.u), np.asarray(r_xla.u), atol=2e-4)
    # scenarios converging only inside the final 5-iteration window are
    # captured (the tight tolerance makes the last window do real work)
    assert np.asarray(r_pl.converged).any()


def test_pallas_eps_dual_warm_start(battery_data_paired):
    qp, data = battery_data_paired
    X0 = _x0_batch(4, qp.n_x, seed=17)
    kw = dict(mode="eps", eps_g=1e-4, eps_V=1e-4, check_every=10, iterations=100)
    r1 = solve_batch(data, X0, config=SolverConfig(engine="pallas", **kw))
    r2 = solve_batch(data, X0, config=SolverConfig(engine="pallas", **kw), y0=r1.y)
    # warm-started from a converged dual, every scenario passes on the
    # first check window
    assert np.asarray(r2.iterations).max() <= 10


def test_fits_vmem_guard():
    from tpu_gpad.solver import kernels

    qp = tpu_gpad.condense(problems.battery(n_cells=3, horizon=10))
    data = tpu_gpad.dualize(qp, iterations=10)
    assert kernels.fits_vmem(data)


def test_pallas_warm_start_broadcastable_shapes(battery_data_paired):
    """All documented y0 shapes work through the fused kernels: (2, m_h),
    (1, 2, m_h), (B, 2, m_h), and multi-dim batches."""
    qp, data = battery_data_paired
    X0 = _x0_batch(4, qp.n_x, seed=23)
    cfg = SolverConfig(iterations=40, engine="pallas")
    r0 = solve_batch(data, X0, config=cfg)
    y_one = np.asarray(r0.y[0])          # (2, m_h)
    for y0 in (y_one, y_one[None], np.asarray(r0.y)):
        r = solve_batch(data, X0, config=cfg, y0=y0)
        assert np.all(np.isfinite(np.asarray(r.u)))
    # eps mode, multi-dim batch with full-batch y0
    Xm = X0.reshape(2, 2, qp.n_x)
    kw = dict(mode="eps", eps_g=1e-3, eps_V=1e-3, check_every=10, iterations=100)
    rm = solve_batch(data, Xm, config=SolverConfig(engine="pallas", **kw))
    r2 = solve_batch(data, Xm, config=SolverConfig(engine="pallas", **kw),
                     y0=rm.y)
    # warm-started from an eps-accurate dual: converges within a couple of
    # check windows (the captured y is eps-optimal, not the fixed point)
    assert bool(np.all(np.asarray(r2.converged)))
    assert np.asarray(r2.iterations).max() <= 2 * 10
    # eps mode with a single shared (2, m_h) warm start
    r3 = solve_batch(data, Xm, config=SolverConfig(engine="pallas", **kw),
                     y0=y_one)
    assert np.all(np.isfinite(np.asarray(r3.u)))


def test_pallas_dense_warm_start(battery_data):
    """The dense (non-paired) kernel takes y0 directly — the path dataset-
    loaded problems and their closed loops use."""
    qp, data = battery_data
    X0 = _x0_batch(5, qp.n_x, seed=31)
    cfg_pl = SolverConfig(iterations=50, engine="pallas")
    cfg_xla = SolverConfig(iterations=50, engine="xla")
    r1 = solve_batch(data, X0, config=cfg_xla)
    w_pl = solve_batch(data, X0, config=cfg_pl, y0=r1.y)
    w_xla = solve_batch(data, X0, config=cfg_xla, y0=r1.y)
    np.testing.assert_allclose(
        np.asarray(w_pl.u), np.asarray(w_xla.u),
        atol=backend_tol(2e-5, 5e-3),
    )
    # shared single-dual warm start broadcasts
    r2 = solve_batch(data, X0, config=cfg_pl, y0=r1.y[0])
    assert np.all(np.isfinite(np.asarray(r2.u)))
    cold = solve_batch(data, X0, config=cfg_pl)
    assert np.abs(np.asarray(w_pl.y) - np.asarray(cold.y)).max() > 1e-6


def test_pallas_paired_mvp_warm_start(battery_data_paired):
    """The paired-mvp kernel (form='mvp' forced) takes y0 too."""
    qp, data = battery_data_paired
    X0 = _x0_batch(4, qp.n_x, seed=41)
    cfg_pl = SolverConfig(iterations=50, engine="pallas", form="mvp")
    cfg_xla = SolverConfig(iterations=50, engine="xla", form="mvp")
    r1 = solve_batch(data, X0, config=cfg_xla)
    w_pl = solve_batch(data, X0, config=cfg_pl, y0=r1.y)
    w_xla = solve_batch(data, X0, config=cfg_xla, y0=r1.y)
    np.testing.assert_allclose(
        np.asarray(w_pl.u), np.asarray(w_xla.u),
        atol=backend_tol(2e-5, 5e-3),
    )
    cold = solve_batch(data, X0, config=cfg_pl)
    assert np.abs(np.asarray(w_pl.y) - np.asarray(cold.y)).max() > 1e-6
