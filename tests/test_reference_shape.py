"""Full-solver parity at the reference's flagship dataset shape.

The largest committed fixture and the ``inputs_manysets`` datasets use
n_u=30, N=30, m=3660 (``build/step3/4/input.txt`` header; SURVEY.md C9).
The fused kernels decline this size (VMEM) and the XLA engine takes it.
"""

import numpy as np

import tpu_gpad

from conftest import backend_tol
from tpu_gpad import problems
from tpu_gpad.solver import SolverConfig, solve_batch
from tpu_gpad.solver.reference import gpad_solve_qp


def test_reference_shape_dims_and_parity():
    problem = problems.battery(n_cells=30, horizon=30)
    qp = tpu_gpad.condense(problem)
    assert qp.n_z == 900
    assert qp.m == 4 * 30 * 30 + 2 * 30  # == 3660, the reference's law

    data = tpu_gpad.dualize(qp, iterations=60, paired="auto")
    rng = np.random.default_rng(5)
    X0 = rng.uniform(-0.3, 0.3, size=(2, 30)).astype(np.float32)
    res = solve_batch(data, X0, config=SolverConfig(iterations=60))
    for i in range(2):
        ref = gpad_solve_qp(qp, X0[i].astype(np.float64), iterations=60)
        np.testing.assert_allclose(
            np.asarray(res.u[i]), ref.u, atol=backend_tol(1e-4, 5e-3)
        )


def test_reference_shape_routing():
    """Routing at the reference's flagship shape (m_half=1830), all
    chip-measured (docs/DESIGN.md section 8):

    - fixed + auto on TPU -> form 'mvp' with the flat step-4 cut on the
      XLA engine (47.5k/81.8k solves/s at highest/high — the fastest path);
    - form='dual' forced -> the HBM-streamed tiled Pallas kernel (the
      whole-VMEM kernel's guard still declines this size);
    - eps mode -> the XLA mvp+flat loop (measured 9.9k vs the tiled chunk
      kernel's 8.6k at eps=1e-4 restart); the tiled chunk kernel serves
      flat-less oversized duals and forced form='dual'."""
    import jax

    from tpu_gpad.solver import kernels
    from tpu_gpad.solver.core import resolve_engine, resolve_form

    on_tpu = jax.default_backend() == "tpu"
    qp = tpu_gpad.condense(problems.battery(n_cells=30, horizon=30))
    data = tpu_gpad.dualize(qp, iterations=10, paired="auto")
    assert data.n_struct == data.m_half - data.n_z
    # the whole-VMEM dual kernel's guard still rejects m_half=1830 ...
    assert kernels.pick_lane_tile(256, kernels._round_up(data.m_half, 8)) is None
    assert not kernels.dual_fits_vmem(data)
    # ... the tiled kernel admits it
    assert kernels.dual_tiled_fits(data)

    cfg = SolverConfig(iterations=10)
    assert resolve_form(data, cfg) == ("mvp" if on_tpu else "dual")
    assert resolve_engine(data, cfg) == "xla"  # flat-mvp runs on XLA
    cfg_dual = SolverConfig(iterations=10, form="dual")
    assert resolve_engine(data, cfg_dual) == ("pallas" if on_tpu else "xla")
    cfg_eps = SolverConfig(mode="eps", iterations=100, check_every=10)
    assert resolve_engine(data, cfg_eps) == "xla"
    cfg_eps_nf = SolverConfig(
        mode="eps", iterations=100, check_every=10, flat="off"
    )
    assert resolve_engine(data, cfg_eps_nf) == ("pallas" if on_tpu else "xla")
