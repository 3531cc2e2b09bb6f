"""HBM-streamed tiled dual kernel: parity vs the XLA engine and routing.

The tiled kernel exists for problems whose dual Hessian/state exceed the
whole-VMEM kernels' budget — the reference's flagship 30x30 dataset shape
(m=3660, ``build/step3/4/input.txt``) being the motivating case. Tests run
it on tiny problems with a forced small ``row_tile`` so the multi-chunk
grid, ping-pong state, and restart accumulation are all exercised in
interpret mode on CPU; the real-shape run happens on the chip
(TPU_GPAD_TEST_ON_TPU=1 + tests/test_reference_shape.py).
"""

import numpy as np
import pytest

import jax

import tpu_gpad
from tpu_gpad import problems
from conftest import backend_tol
from tpu_gpad.solver import SolverConfig, solve_batch
from tpu_gpad.solver import kernels
from tpu_gpad.solver.core import affine_params, resolve_engine


@pytest.fixture(scope="module")
def battery_paired():
    qp = tpu_gpad.condense(problems.battery(n_cells=3, horizon=10))
    data = tpu_gpad.dualize(qp, iterations=100, paired=True)
    return qp, data


def _x0_batch(n, n_x, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.4, 0.4, size=(n, n_x)).astype(np.float32)


INTERPRET = jax.default_backend() != "tpu"


def _run_tiled(data, X0, iterations, row_tile, y0=None, restart=False):
    g_P, p_D = affine_params(data, X0)
    return kernels.gpad_pallas_fixed_dual_tiled(
        data, g_P, p_D, y0,
        iterations=iterations, interpret=INTERPRET,
        restart=restart, row_tile=row_tile,
    )


@pytest.mark.parametrize("row_tile", [8, 16])
def test_tiled_matches_xla_dual(battery_paired, row_tile):
    """Multi-chunk grids (m_half=70 -> R=10 and R=5) match the XLA dual."""
    qp, data = battery_paired
    X0 = _x0_batch(6, qp.n_x)
    z, y, w, zhat = _run_tiled(data, X0, 60, row_tile)
    r_xla = solve_batch(
        data, X0, config=SolverConfig(iterations=60, engine="xla", form="dual")
    )
    np.testing.assert_allclose(np.asarray(z), np.asarray(r_xla.z), atol=2e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(r_xla.y), atol=2e-5)


def test_tiled_high_precision(battery_paired):
    """bf16x3 through the tiled kernel (stacked hi/lo D chunks)."""
    qp, data = battery_paired
    X0 = _x0_batch(4, qp.n_x, seed=3)
    g_P, p_D = affine_params(data, X0)
    z, y, w, zhat = kernels.gpad_pallas_fixed_dual_tiled(
        data, g_P, p_D, None,
        iterations=60, interpret=INTERPRET, row_tile=16, precision="high",
    )
    r_xla = solve_batch(
        data, X0,
        config=SolverConfig(
            iterations=60, engine="xla", form="dual", precision="high"
        ),
    )
    # TPU: the kernel's manual bf16x3 vs XLA's HIGH lowering round
    # differently; 60 iterations of relu-boundary divergence
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(r_xla.z), atol=backend_tol(1e-4, 5e-3))
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(r_xla.y), atol=backend_tol(1e-4, 5e-3))


def test_tiled_single_chunk_edge(battery_paired):
    """row_tile >= S collapses the row grid to R=1 (degenerate edge)."""
    qp, data = battery_paired
    X0 = _x0_batch(3, qp.n_x, seed=2)
    z, y, w, zhat = _run_tiled(data, X0, 40, row_tile=128)
    r_xla = solve_batch(
        data, X0, config=SolverConfig(iterations=40, engine="xla", form="dual")
    )
    np.testing.assert_allclose(np.asarray(z), np.asarray(r_xla.z), atol=2e-5)


def test_tiled_warm_start(battery_paired):
    qp, data = battery_paired
    X0 = _x0_batch(4, qp.n_x, seed=7)
    cold = solve_batch(
        data, X0, config=SolverConfig(iterations=60, engine="xla", form="dual")
    )
    z, y, w, zhat = _run_tiled(data, X0, 30, row_tile=16, y0=cold.y)
    r_xla = solve_batch(
        data, X0,
        config=SolverConfig(iterations=30, engine="xla", form="dual"),
        y0=cold.y,
    )
    np.testing.assert_allclose(np.asarray(z), np.asarray(r_xla.z), atol=2e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(r_xla.y), atol=2e-5)
    # the warm start actually flowed in
    zc, yc, *_ = _run_tiled(data, X0, 30, row_tile=16)
    assert np.abs(np.asarray(y) - np.asarray(yc)).max() > 1e-6


def test_tiled_restart_matches_core(battery_paired):
    """Adaptive restart: the chunk-accumulated restart test + per-lane
    momentum recursion reproduce core._restart_update exactly."""
    qp, data = battery_paired
    X0 = _x0_batch(5, qp.n_x, seed=11)
    z, y, w, zhat = _run_tiled(data, X0, 80, row_tile=16, restart=True)
    r_xla = solve_batch(
        data, X0,
        config=SolverConfig(
            iterations=80, engine="xla", form="dual", restart=True
        ),
    )
    np.testing.assert_allclose(np.asarray(z), np.asarray(r_xla.z), atol=2e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(r_xla.y), atol=2e-5)


def test_tiled_routing_when_vmem_declines(battery_paired, monkeypatch):
    """When the whole-VMEM dual kernel declines, engine='pallas' routes to
    the tiled kernel (fixed mode) and the tiled chunk builder (eps mode)."""
    qp, data = battery_paired
    X0 = _x0_batch(4, qp.n_x, seed=13)
    monkeypatch.setattr(kernels, "dual_fits_vmem", lambda d, chunked=False, diagnostics=True: False)
    monkeypatch.setattr(
        kernels, "pick_lane_tile",
        lambda B, S, n_arrays=26, extra_per_lane=0, mats=0: None,
    )
    r_pl = solve_batch(
        data, X0, config=SolverConfig(iterations=60, engine="pallas", form="dual")
    )
    r_xla = solve_batch(
        data, X0, config=SolverConfig(iterations=60, engine="xla", form="dual")
    )
    np.testing.assert_allclose(np.asarray(r_pl.u), np.asarray(r_xla.u), atol=2e-5)

    kw = dict(mode="eps", eps_g=1e-4, eps_V=1e-4, check_every=10, iterations=100)
    e_pl = solve_batch(data, X0, config=SolverConfig(engine="pallas", **kw))
    e_xla = solve_batch(data, X0, config=SolverConfig(engine="xla", **kw))
    assert np.array_equal(np.asarray(e_pl.converged), np.asarray(e_xla.converged))
    np.testing.assert_allclose(np.asarray(e_pl.u), np.asarray(e_xla.u), atol=2e-4)


def test_tiled_eps_restart_routing(battery_paired, monkeypatch):
    """eps + restart through the tiled chunk builder converges like XLA."""
    qp, data = battery_paired
    X0 = _x0_batch(4, qp.n_x, seed=17)
    monkeypatch.setattr(kernels, "dual_fits_vmem", lambda d, chunked=False, diagnostics=True: False)
    monkeypatch.setattr(
        kernels, "pick_lane_tile",
        lambda B, S, n_arrays=26, extra_per_lane=0, mats=0: None,
    )
    kw = dict(mode="eps", eps_g=1e-5, eps_V=1e-5, check_every=10,
              iterations=200, restart=True)
    e_pl = solve_batch(data, X0, config=SolverConfig(engine="pallas", **kw))
    assert bool(np.all(np.asarray(e_pl.converged)))
    e_xla = solve_batch(data, X0, config=SolverConfig(engine="xla", **kw))
    np.testing.assert_allclose(np.asarray(e_pl.u), np.asarray(e_xla.u), atol=2e-4)


def test_pick_tiled_tiles_covers_flagship():
    """The tile chooser admits the reference's 30x30 shape (m_half=1830)
    and the mass-spring N=100 shape (m_half=1200) within the VMEM budget."""
    for m_half in (1830, 1200):
        picked = kernels.pick_tiled_tiles(m_half)
        assert picked is not None
        B_t, T_r, S = picked
        assert S % T_r == 0 and S >= m_half
        scratch = 4 * kernels.TILED_ARRAYS * S * B_t
        assert scratch + 2 * 4 * T_r * S <= kernels._VMEM_BUDGET
    # far beyond any bundled problem the chooser declines
    assert kernels.pick_tiled_tiles(6000) is None
