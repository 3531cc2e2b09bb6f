"""Setpoint tracking: parameter p = [x0; r] — beyond the reference's
regulation-only scope (gpad.m drives SoC spreads to zero)."""

import numpy as np
import pytest

import tpu_gpad
from tpu_gpad import problems
from tpu_gpad.solver import SolverConfig
from tpu_gpad.solver.qp import solve_condensed_qp


def test_tracking_with_zero_ref_reduces_to_regulation():
    problem = problems.double_integrator(horizon=6)
    qp_reg = tpu_gpad.condense(problem)
    qp_trk = tpu_gpad.condense(problem, tracking=True)
    assert qp_trk.n_x == 2 * problem.n_x
    x0 = np.array([3.0, -0.5])
    p = np.concatenate([x0, np.zeros(2)])
    z_reg = solve_condensed_qp(qp_reg, x0).z
    z_trk = solve_condensed_qp(qp_trk, p).z
    np.testing.assert_allclose(z_trk, z_reg, atol=1e-10)


def test_tracking_controller_converges_to_setpoint():
    """Closed loop drives the double integrator to a nonzero position
    setpoint (a steady state with u = 0)."""
    problem = problems.double_integrator(horizon=10)
    ctrl = tpu_gpad.Controller(
        problem, tracking=True,
        config=SolverConfig(iterations=80, restart=True),
    )
    r = np.array([2.0, 0.0], dtype=np.float32)
    x = np.array([-3.0, 0.0])
    for _ in range(40):
        u = ctrl.step(x.astype(np.float32), x_ref=r)
        x = problem.A @ x + problem.B @ u.astype(np.float64)
    assert np.abs(x - r.astype(np.float64)).max() < 1e-2, x


def test_tracking_gpad_matches_exact():
    problem = problems.double_integrator(horizon=6)
    qp = tpu_gpad.condense(problem, tracking=True)
    data = tpu_gpad.dualize(qp, iterations=300, paired="auto")
    rng = np.random.default_rng(0)
    P = np.concatenate(
        [rng.uniform(-3, 3, (5, 2)), rng.uniform(-1, 1, (5, 2))], axis=1
    ).astype(np.float32)
    res = tpu_gpad.solve_batch(
        data, P, config=SolverConfig(iterations=300, restart=True)
    )
    for i in range(5):
        sol = solve_condensed_qp(qp, P[i])
        if sol.status != "optimal":
            continue
        np.testing.assert_allclose(
            np.asarray(res.u[i]), sol.z[: qp.n_u], atol=5e-4
        )


def test_tracking_composes_with_soft_state():
    problem = problems.double_integrator(horizon=5)
    qp = tpu_gpad.condense(problem, tracking=True, soft_state=1e3)
    assert qp.n_x == 4  # [x0; r]
    assert qp.name.endswith("_track_soft")
    p = np.array([20.0, 0.0, 0.0, 0.0])  # x0 outside the hard box
    sol = solve_condensed_qp(qp, p)
    assert sol.status == "optimal"


def test_non_tracking_controller_rejects_ref():
    problem = problems.double_integrator(horizon=4)
    ctrl = tpu_gpad.Controller(problem, iterations=20)
    with pytest.raises(ValueError, match="tracking"):
        ctrl.step(np.zeros(2, dtype=np.float32), x_ref=np.ones(2))


def test_simulate_tracking_batch():
    """The jitted batch simulator tracks per-scenario setpoints."""
    problem = problems.double_integrator(horizon=10)
    X0 = np.array([[-3.0, 0.0], [1.0, 0.5]], dtype=np.float32)
    R = np.array([[2.0, 0.0], [-1.0, 0.0]], dtype=np.float32)
    res = tpu_gpad.simulate(
        problem, X0, n_steps=40, x_ref=R,
        config=SolverConfig(iterations=80, restart=True), warm_start=True,
    )
    X = np.asarray(res.X)
    assert np.abs(X[-1] - R).max() < 2e-2, X[-1]


def test_controller_batched_states_shared_ref():
    problem = problems.double_integrator(horizon=6)
    ctrl = tpu_gpad.Controller(problem, tracking=True, iterations=40)
    X = np.zeros((3, 2), dtype=np.float32)
    U = ctrl.step(X, x_ref=np.array([1.0, 0.0], dtype=np.float32))
    assert U.shape == (3, 1)
