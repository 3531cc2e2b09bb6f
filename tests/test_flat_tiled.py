"""HBM-streamed flat (mvp-form) kernel: parity vs the XLA engine + routing.

The flat tiled kernel exists for VMEM-oversized flat stacks — the
reference's flagship 30x30 shape (m=3660; ``build/step3/4/input.txt``),
where the flat mvp iteration does ~25% fewer flops than the dual form the
tiled dual kernel runs (round-2 VERDICT item 3). Tests run it on tiny
problems with a forced small ``tile`` so the two-phase multi-chunk grid
(streamed step-2 accumulation, streamed step-4 row projection, free box
rows) is exercised in interpret mode on CPU; the real-shape run happens on
the chip (TPU_GPAD_TEST_ON_TPU=1 + tests/test_reference_shape.py).
"""

import numpy as np
import pytest

import jax

import tpu_gpad
from tpu_gpad import problems
from conftest import backend_tol
from tpu_gpad.solver import SolverConfig, solve_batch
from tpu_gpad.solver import kernels
from tpu_gpad.solver.core import affine_params

INTERPRET = jax.default_backend() != "tpu"
# tiny tiles exercise the multi-chunk grid but only LOWER in interpret
# mode (Mosaic lane-block rule: streamed chunks must be 128-multiples on
# hardware — the dispatcher refuses small tiles there); on the chip the
# same tests run at the lane-legal width
SMALL = 8 if INTERPRET else 128
MID = 16 if INTERPRET else 128


@pytest.fixture(scope="module")
def battery_flat():
    qp = tpu_gpad.condense(problems.battery(n_cells=3, horizon=10))
    data = tpu_gpad.dualize(qp, iterations=100, paired=True)
    assert data.n_struct and data.n_struct > 0
    return qp, data


def _x0_batch(n, n_x, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.4, 0.4, size=(n, n_x)).astype(np.float32)


def _run(data, X0, iterations, tile, y0=None, diagnostics=True, **kw):
    g_P, p_D = affine_params(data, X0)
    return kernels.gpad_pallas_fixed_flat_tiled(
        data, g_P, p_D, y0,
        iterations=iterations, interpret=INTERPRET, tile=tile,
        diagnostics=diagnostics, **kw,
    )


def _xla_flat(data, X0, iterations, y0=None, **kw):
    return solve_batch(
        data, X0,
        config=SolverConfig(
            iterations=iterations, engine="xla", form="mvp", flat="on", **kw
        ),
        y0=y0,
    )


@pytest.mark.parametrize("tile", [SMALL, MID])
def test_flat_tiled_matches_xla(battery_flat, tile):
    """Multi-chunk grids (n_s=40, n_z=30 -> R_A/R_B of 9/5 and 5/3) match
    the XLA mvp+flat path."""
    qp, data = battery_flat
    X0 = _x0_batch(6, qp.n_x)
    z, y, w, zhat = _run(data, X0, 60, tile)
    ref = _xla_flat(data, X0, 60)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref.z), atol=2e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref.y), atol=2e-5)


def test_flat_tiled_residuals_via_dispatch(battery_flat, monkeypatch):
    """engine='pallas' routes VMEM-oversized flat stacks to the streamed
    kernel (flat_fits_vmem monkeypatched False) and the recovered
    residual/gap match the XLA engine."""
    qp, data = battery_flat
    X0 = _x0_batch(5, qp.n_x, seed=1)
    monkeypatch.setattr(
        kernels, "flat_fits_vmem", lambda d, diagnostics=True: False
    )
    calls = []
    orig = kernels.gpad_pallas_fixed_flat_tiled

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(kernels, "gpad_pallas_fixed_flat_tiled", spy)
    r_pl = solve_batch(
        data, X0,
        config=SolverConfig(iterations=60, engine="pallas", form="mvp"),
    )
    assert calls, "dispatch did not use the streamed flat kernel"
    ref = _xla_flat(data, X0, 60)
    np.testing.assert_allclose(np.asarray(r_pl.u), np.asarray(ref.u), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(r_pl.residual), np.asarray(ref.residual), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(r_pl.gap), np.asarray(ref.gap), rtol=1e-4, atol=2e-5
    )


def test_flat_tiled_high_precision(battery_flat):
    """bf16x3 through the streamed kernel (stacked hi/lo operand chunks)."""
    qp, data = battery_flat
    X0 = _x0_batch(4, qp.n_x, seed=3)
    z, y, w, zhat = _run(data, X0, 60, tile=MID, precision="high")
    ref = _xla_flat(data, X0, 60, precision="high")
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(ref.z), atol=backend_tol(1e-4, 5e-3))
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref.y), atol=backend_tol(1e-4, 5e-3))


def test_flat_tiled_single_chunk_edge(battery_flat):
    """tile >= the padded sizes collapses both phases to one chunk each."""
    qp, data = battery_flat
    X0 = _x0_batch(3, qp.n_x, seed=2)
    z, y, w, zhat = _run(data, X0, 40, tile=128)
    ref = _xla_flat(data, X0, 40)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref.z), atol=2e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref.y), atol=2e-5)


def test_flat_tiled_warm_start(battery_flat):
    qp, data = battery_flat
    X0 = _x0_batch(4, qp.n_x, seed=7)
    cold = _xla_flat(data, X0, 60)
    z, y, w, zhat = _run(data, X0, 30, tile=MID, y0=cold.y)
    ref = _xla_flat(data, X0, 30, y0=cold.y)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref.z), atol=2e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref.y), atol=2e-5)
    # the warm start actually flowed in
    zc, yc, *_ = _run(data, X0, 30, tile=MID)
    assert np.abs(np.asarray(y) - np.asarray(yc)).max() > 1e-6


def test_flat_tiled_serving_mode_bit_identical(battery_flat):
    """diagnostics=False drops w/zhat but u/z/y are bit-identical."""
    qp, data = battery_flat
    X0 = _x0_batch(4, qp.n_x, seed=5)
    z1, y1, w1, zh1 = _run(data, X0, 50, tile=MID)
    z0, y0_, w0, zh0 = _run(data, X0, 50, tile=MID, diagnostics=False)
    assert w0 is None and zh0 is None
    np.testing.assert_array_equal(np.asarray(z0), np.asarray(z1))
    np.testing.assert_array_equal(np.asarray(y0_), np.asarray(y1))


def test_pick_flat_tiled_tiles_covers_flagship():
    """The tile chooser admits the reference's 30x30 shape
    (m_half=1830, n_z=900, n_struct=930) within the VMEM budget."""
    picked = kernels.pick_flat_tiled_tiles(1830, 900, 930)
    assert picked is not None
    B_t, T, S_s, S_z, S_hf = picked
    assert S_s % T == 0 and S_hf % T == 0 and S_s >= 930 and S_z >= 900
    scratch = 4 * (
        kernels.FLAT_TILED_DUAL_ARRAYS * S_hf
        + kernels.FLAT_TILED_PRIMAL_ARRAYS * S_z
    ) * B_t
    assert scratch + 2 * 4 * S_z * T * 2 <= kernels._VMEM_BUDGET
    # far beyond any bundled problem the chooser declines
    assert kernels.pick_flat_tiled_tiles(60000, 30000, 30000) is None
