"""Terminal cost Q_N (DARE/LQR-consistent horizons)."""

import dataclasses

import numpy as np

import tpu_gpad
from tpu_gpad import problems
from tpu_gpad.condense import dare_terminal_weight
from tpu_gpad.solver import SolverConfig
from tpu_gpad.solver.qp import solve_condensed_qp


def _lqr_gain(A, B, Q, R):
    from scipy.linalg import solve_discrete_are

    P = solve_discrete_are(A, B, Q, R)
    return np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)


def test_dare_terminal_matches_unconstrained_lqr():
    """With Q_N = DARE solution and inactive constraints, the MPC first
    move equals the infinite-horizon LQR feedback for ANY horizon."""
    base = problems.double_integrator(horizon=3, x_limit=1e6, u_limit=1e6)
    P = dare_terminal_weight(base)
    prob = dataclasses.replace(base, Q_terminal=P)
    qp = tpu_gpad.condense(prob)
    K = _lqr_gain(prob.A, prob.B, np.asarray(prob.Q, float),
                  np.asarray(prob.R, float))
    for x0 in (np.array([0.3, -0.1]), np.array([-0.5, 0.2])):
        sol = solve_condensed_qp(qp, x0)
        u_lqr = -(K @ x0)
        np.testing.assert_allclose(sol.z[: qp.n_u], u_lqr, atol=1e-8)


def test_terminal_weight_flows_through_solver():
    base = problems.double_integrator(horizon=6)
    prob = dataclasses.replace(base, Q_terminal=dare_terminal_weight(base))
    qp = tpu_gpad.condense(prob)
    data = tpu_gpad.dualize(qp, iterations=200, paired="auto")
    x0 = np.array([3.0, -0.5], dtype=np.float32)
    res = tpu_gpad.solve(data, x0, config=SolverConfig(iterations=200, restart=True))
    exact = solve_condensed_qp(qp, x0.astype(np.float64))
    np.testing.assert_allclose(np.asarray(res.u[0]), exact.z[: qp.n_u], atol=5e-4)
    # and it differs from the non-terminal QP (the weight has an effect)
    qp0 = tpu_gpad.condense(base)
    assert np.abs(qp.H - qp0.H).max() > 1e-6
