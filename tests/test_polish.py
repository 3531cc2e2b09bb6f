"""Active-set polish: fp32 device solves refined to machine precision."""

import numpy as np
import pytest

import tpu_gpad
from tpu_gpad import problems
from tpu_gpad.solver import SolverConfig, solve_batch
from tpu_gpad.solver.qp import polish, polish_batch, solve_condensed_qp


@pytest.fixture(scope="module")
def setup():
    qp = tpu_gpad.condense(problems.battery(n_cells=3, horizon=10))
    data = tpu_gpad.dualize(qp, iterations=120, paired="auto")
    rng = np.random.default_rng(7)
    X0 = rng.uniform(-0.4, 0.4, size=(6, 3)).astype(np.float32)
    return qp, data, X0


def test_polish_reaches_machine_precision(setup):
    qp, data, X0 = setup
    res = solve_batch(data, X0, config=SolverConfig(iterations=120, restart=True))
    Z, statuses = polish_batch(qp, X0, np.asarray(res.z))
    assert all(s == "optimal" for s in statuses)
    for i in range(X0.shape[0]):
        exact = solve_condensed_qp(qp, X0[i]).z
        assert np.abs(Z[i] - exact).max() < 1e-9, i


def test_polish_handles_coupled_equality_pairs(setup):
    """The battery K z <= 0 / -K z <= 0 pair must not make the KKT
    system singular."""
    qp, data, X0 = setup
    res = tpu_gpad.solve(data, X0[0], config=SolverConfig(iterations=120))
    sol = polish(qp, X0[0], np.asarray(res.z[0]))
    assert sol.status == "optimal"
    # charge-conservation holds exactly after the polish
    u = sol.z[: qp.n_u]
    assert abs(u.sum()) < 1e-10


def test_polish_from_poor_start_falls_back_but_is_exact(setup):
    """Even a garbage z input yields the exact optimum (via refinement or
    the full active-set fallback)."""
    qp, _, X0 = setup
    z_bad = np.zeros(qp.n_z)
    sol = polish(qp, X0[1], z_bad)
    exact = solve_condensed_qp(qp, X0[1]).z
    assert np.abs(sol.z - exact).max() < 1e-8


def test_polish_random_plant():
    problem = problems.random_lti(n_x=4, n_u=2, horizon=6, seed=3, coupled=True)
    qp = tpu_gpad.condense(problem)
    data = tpu_gpad.dualize(qp, iterations=200, paired="auto")
    rng = np.random.default_rng(9)
    X0 = rng.uniform(-0.8, 0.8, size=(4, 4)).astype(np.float32)
    res = solve_batch(data, X0, config=SolverConfig(iterations=200, restart=True))
    for i in range(4):
        ref = solve_condensed_qp(qp, X0[i])
        if ref.status != "optimal":
            continue
        sol = polish(qp, X0[i], np.asarray(res.z[i]))
        assert np.abs(sol.z - ref.z).max() < 1e-8, i
