"""Ground-truth QP solvers, and GPAD-vs-exact parity (the quadprog check of
gpad.m:88-89, here enabled and automated)."""

import numpy as np
import pytest

import tpu_gpad
from tpu_gpad import problems
from tpu_gpad.solver import SolverConfig
from tpu_gpad.solver.qp import solve_condensed_qp, solve_qp_exact, solve_qp_admm


def _random_qp(n=8, m=20, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    H = A @ A.T + n * np.eye(n)
    f = rng.normal(size=n)
    G = rng.normal(size=(m, n))
    b = rng.uniform(0.5, 2.0, size=m)  # z=0 strictly feasible
    return H, f, G, b


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_active_set_agrees_with_admm(seed):
    H, f, G, b = _random_qp(seed=seed)
    s1 = solve_qp_exact(H, f, G, b)
    s2 = solve_qp_admm(H, f, G, b)
    assert s1.status == "optimal"
    np.testing.assert_allclose(s1.z, s2.z, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 5])
def test_active_set_kkt_conditions(seed):
    H, f, G, b = _random_qp(seed=seed)
    s = solve_qp_exact(H, f, G, b)
    # stationarity
    grad = H @ s.z + f + G.T @ s.lam
    assert np.abs(grad).max() < 1e-8
    # primal feasibility + complementary slackness
    slack = G @ s.z - b
    assert slack.max() < 1e-8
    assert np.abs(s.lam * slack).max() < 1e-8


def test_gpad_matches_exact_battery():
    """End-to-end: device GPAD u* vs active-set ground truth within 1e-4
    (BASELINE.md north-star tolerance)."""
    qp = tpu_gpad.condense(problems.battery(n_cells=3, horizon=10))
    data = tpu_gpad.dualize(qp, iterations=800)
    x0 = problems.battery_default_x0(3, seed=1).astype(np.float32)
    exact = solve_condensed_qp(qp, x0)
    assert exact.status == "optimal"
    res = tpu_gpad.solve(data, x0, config=SolverConfig(iterations=800))
    np.testing.assert_allclose(np.asarray(res.u[0]), exact.z[: qp.n_u], atol=1e-4)


def test_gpad_matches_exact_double_integrator():
    qp = tpu_gpad.condense(problems.double_integrator(horizon=10))
    data = tpu_gpad.dualize(qp, iterations=600)
    x0 = np.array([1.0, 0.0], dtype=np.float32)
    exact = solve_condensed_qp(qp, x0)
    res = tpu_gpad.solve(data, x0, config=SolverConfig(iterations=600))
    np.testing.assert_allclose(np.asarray(res.u[0]), exact.z[: qp.n_u], atol=2e-4)
