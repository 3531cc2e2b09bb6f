"""SolverConfig(diagnostics=False): residual-free serving mode.

The fused kernels drop their w/zhat diagnostic outputs (fewer HBM-written,
double-buffered blocks) and SolveResult.residual/gap come back NaN; the
iterates u/z/y must be bit-identical to the diagnostics=True solve on every
engine and kernel form."""

import numpy as np
import pytest

import tpu_gpad
from tpu_gpad import problems
from tpu_gpad.solver import SolverConfig, solve_batch


@pytest.fixture(scope="module")
def qp():
    return tpu_gpad.condense(problems.battery(n_cells=3, horizon=10))


@pytest.fixture(scope="module")
def data_paired(qp):
    return tpu_gpad.dualize(qp, iterations=100, paired=True)


@pytest.fixture(scope="module")
def data_dense(qp):
    return tpu_gpad.dualize(qp, iterations=100, paired=False)


def _x0(n, n_x, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.4, 0.4, size=(n, n_x)).astype(np.float32)


def _check_pair(data, qp, base_cfg):
    import dataclasses

    X0 = _x0(6, qp.n_x, seed=4)
    full = solve_batch(data, X0, config=base_cfg)
    lite = solve_batch(
        data, X0, config=dataclasses.replace(base_cfg, diagnostics=False)
    )
    np.testing.assert_array_equal(np.asarray(lite.u), np.asarray(full.u))
    np.testing.assert_array_equal(np.asarray(lite.z), np.asarray(full.z))
    np.testing.assert_array_equal(np.asarray(lite.y), np.asarray(full.y))
    assert np.isnan(np.asarray(lite.residual)).all()
    assert np.isnan(np.asarray(lite.gap)).all()
    assert np.asarray(lite.converged).all()
    assert not np.isnan(np.asarray(full.residual)).any()


@pytest.mark.parametrize("engine", ["xla", "pallas"])
def test_diagnostics_off_dual_form(data_paired, qp, engine):
    _check_pair(
        data_paired, qp,
        SolverConfig(iterations=60, engine=engine, form="dual"),
    )


@pytest.mark.parametrize("engine", ["xla", "pallas"])
def test_diagnostics_off_paired_mvp(data_paired, qp, engine):
    _check_pair(
        data_paired, qp,
        SolverConfig(iterations=60, engine=engine, form="mvp", flat="off"),
    )


@pytest.mark.parametrize("engine", ["xla", "pallas"])
def test_diagnostics_off_flat(data_paired, qp, engine):
    if data_paired.n_struct is None:
        pytest.skip("battery stack has no identity block")
    _check_pair(
        data_paired, qp,
        SolverConfig(iterations=60, engine=engine, form="mvp", flat="on"),
    )


@pytest.mark.parametrize("engine", ["xla", "pallas"])
def test_diagnostics_off_dense(data_dense, qp, engine):
    _check_pair(
        data_dense, qp, SolverConfig(iterations=60, engine=engine)
    )


def test_diagnostics_off_restart_dual(data_paired, qp):
    _check_pair(
        data_paired, qp,
        SolverConfig(iterations=60, engine="pallas", form="dual", restart=True),
    )


def test_diagnostics_off_warm_start_roundtrip(data_paired, qp):
    """The y from a diagnostics-off solve warm-starts the next one."""
    import dataclasses

    X0 = _x0(3, qp.n_x, seed=7)
    lite_cfg = SolverConfig(iterations=40, engine="pallas", diagnostics=False)
    full_cfg = dataclasses.replace(lite_cfg, diagnostics=True)
    first = solve_batch(data_paired, X0, config=lite_cfg)
    # warm-starting from the diagnostics-off y must be indistinguishable
    # from warm-starting from the full solve's y
    again_lite = solve_batch(data_paired, X0, config=lite_cfg, y0=first.y)
    again_full = solve_batch(
        data_paired, X0, config=full_cfg,
        y0=solve_batch(data_paired, X0, config=full_cfg).y,
    )
    np.testing.assert_array_equal(
        np.asarray(again_lite.u), np.asarray(again_full.u)
    )


def test_diagnostics_off_eps_raises(data_paired, qp):
    with pytest.raises(ValueError, match="diagnostics=False"):
        solve_batch(
            data_paired,
            _x0(2, qp.n_x),
            config=SolverConfig(mode="eps", iterations=100, diagnostics=False),
        )


def test_diagnostics_off_tiled(qp):
    """The VMEM-oversized route (tiled dual kernel) honors the flag too."""
    from tpu_gpad.solver import kernels

    qp_big = tpu_gpad.condense(problems.battery(n_cells=3, horizon=10))
    data = tpu_gpad.dualize(qp_big, iterations=50, paired=True)
    X0 = _x0(2, qp_big.n_x, seed=1)
    g_P, p_D = tpu_gpad.solver.core.affine_params(data, X0)
    z, y, w, zhat = kernels.gpad_pallas_fixed_dual_tiled(
        data, g_P, p_D, iterations=50, interpret=True, row_tile=8,
        diagnostics=False,
    )
    assert w is None and zhat is None
    z2, y2, _, _ = kernels.gpad_pallas_fixed_dual_tiled(
        data, g_P, p_D, iterations=50, interpret=True, row_tile=8,
    )
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
