"""Input rate (slew) limits: du_min <= u_k - u_{k-1} <= du_max with
u_{-1} = the previously applied move entering as a QP parameter —
actuator protection the reference lacks (gpad.m:84-85 has amplitude
boxes only)."""

import dataclasses

import numpy as np
import pytest

import tpu_gpad
from tpu_gpad import problems
from tpu_gpad.solver import SolverConfig
from tpu_gpad.solver.qp import solve_condensed_qp


def _rate_problem(horizon=6, du=0.3):
    problem = problems.double_integrator(horizon=horizon)
    return dataclasses.replace(
        problem,
        du_max=np.full(problem.n_u, du),
        du_min=np.full(problem.n_u, -du),
    )


def test_rate_condense_shapes_and_pairing():
    problem = _rate_problem()
    qp = tpu_gpad.condense(problem)
    assert qp.n_x == problem.n_x + problem.n_u  # p = [x0; u_prev]
    assert qp.name.endswith("_rate")
    # both-sided rate rows pair exactly, and the input-box identity block
    # is still detected for the flat layout
    data = tpu_gpad.dualize(qp, iterations=50, paired="auto")
    assert data.paired
    assert data.n_struct is not None


def test_rate_limits_bind_in_exact_solution():
    problem = _rate_problem(horizon=8, du=0.2)
    qp = tpu_gpad.condense(problem)
    # far-away state: unconstrained MPC would slam the input; rate rows bind
    p = np.concatenate([[4.0, 0.0], np.zeros(problem.n_u)])
    sol = solve_condensed_qp(qp, p)
    assert sol.status == "optimal"
    U = sol.z.reshape(problem.horizon, problem.n_u)
    dU = np.diff(np.concatenate([np.zeros((1, problem.n_u)), U]), axis=0)
    assert np.abs(dU).max() <= 0.2 + 1e-8
    # the limit actually binds (the unconstrained first move would exceed it)
    assert np.abs(dU).max() > 0.2 - 1e-6


def test_rate_gpad_matches_exact():
    problem = _rate_problem(horizon=6)
    qp = tpu_gpad.condense(problem)
    data = tpu_gpad.dualize(qp, iterations=1000, paired="auto")
    rng = np.random.default_rng(3)
    P = np.concatenate(
        [rng.uniform(-3, 3, (5, 2)), rng.uniform(-0.3, 0.3, (5, 1))], axis=1
    ).astype(np.float32)
    res = tpu_gpad.solve_batch(
        data, P, config=SolverConfig(iterations=1000, restart=True)
    )
    for i in range(5):
        sol = solve_condensed_qp(qp, P[i])
        if sol.status != "optimal":
            continue
        np.testing.assert_allclose(
            np.asarray(res.u[i]), sol.z[: qp.n_u], atol=5e-4
        )


def test_controller_threads_u_prev():
    problem = _rate_problem(horizon=10, du=0.25)
    ctrl = tpu_gpad.Controller(
        problem, config=SolverConfig(iterations=400, restart=True)
    )
    assert ctrl.rate
    x = np.array([3.0, 0.0])
    u_prev = np.zeros(problem.n_u)
    for _ in range(25):
        u = ctrl.step(x.astype(np.float32))
        assert np.abs(u - u_prev).max() <= 0.25 + 5e-3, (u, u_prev)
        x = problem.A @ x + problem.B @ u.astype(np.float64)
        u_prev = u.astype(np.float64)
    assert np.abs(x).max() < 5e-2, x  # still stabilizes


def test_controller_reset_seeds_u_prev():
    problem = _rate_problem(horizon=8, du=0.1)
    # rate duals converge slower than plain boxes (the differencing rows
    # worsen the dual conditioning): this instance needs ~1k iterations
    ctrl = tpu_gpad.Controller(
        problem, config=SolverConfig(iterations=1000, restart=True)
    )
    ctrl.reset(u_prev=np.array([0.5], dtype=np.float32))
    u = ctrl.step(np.array([1.0, 0.0], dtype=np.float32))
    # next move must stay within du of the seeded actuator position
    # (exact optimum is the lower rate edge 0.4)
    assert np.abs(u - 0.5).max() <= 0.1 + 5e-3, u


def test_controller_rate_batch_change_raises():
    """Silently zeroing u_prev on a batch-size change would let the next
    move violate the physical slew limit with no signal (round-2 ADVICE);
    an ambiguous change must raise, a single stored move must broadcast."""
    problem = _rate_problem(horizon=8, du=0.25)
    ctrl = tpu_gpad.Controller(
        problem, config=SolverConfig(iterations=200, restart=True)
    )
    X2 = np.array([[1.0, 0.0], [0.5, 0.2]], dtype=np.float32)
    ctrl.step(X2)  # stored u_prev now has batch 2
    with pytest.raises(ValueError, match="batch size changed"):
        ctrl.step(np.array([1.0, 0.0], dtype=np.float32))
    # a single stored move broadcasts to a larger batch (same actuator)
    ctrl.reset()
    u1 = ctrl.step(np.array([3.0, 0.0], dtype=np.float32))
    X3 = np.array([[3.0, 0.0], [3.0, 0.0], [3.0, 0.0]], dtype=np.float32)
    u3 = ctrl.step(X3)
    assert np.abs(u3 - u1).max() <= 0.25 + 5e-3  # limited vs the real move


def test_simulate_rate_batch():
    problem = _rate_problem(horizon=10, du=0.25)
    X0 = np.array([[3.0, 0.0], [-2.0, 0.5]], dtype=np.float32)
    res = tpu_gpad.simulate(
        problem, X0, n_steps=30,
        config=SolverConfig(iterations=400, restart=True), warm_start=True,
    )
    U = np.asarray(res.U)  # (T, B, n_u)
    dU = np.diff(np.concatenate([np.zeros((1, 2, 1)), U]), axis=0)
    assert np.abs(dU).max() <= 0.25 + 5e-3
    assert np.abs(np.asarray(res.X)[-1]).max() < 5e-2


def test_one_sided_rate_falls_back_to_dense():
    problem = problems.double_integrator(horizon=5)
    problem = dataclasses.replace(
        problem, du_max=np.full(problem.n_u, 0.3)
    )
    qp = tpu_gpad.condense(problem)
    data = tpu_gpad.dualize(qp, iterations=1000, paired="auto")
    assert not data.paired  # no +/- pairing for one-sided rate rows
    p = np.concatenate([[2.0, 0.0], np.zeros(problem.n_u)]).astype(np.float32)
    res = tpu_gpad.solve_batch(
        data, p[None], config=SolverConfig(iterations=1000, restart=True)
    )
    sol = solve_condensed_qp(qp, p)
    np.testing.assert_allclose(np.asarray(res.u[0]), sol.z[: qp.n_u], atol=5e-4)


def test_rate_composes_with_tracking():
    problem = _rate_problem(horizon=6)
    qp = tpu_gpad.condense(problem, tracking=True)
    assert qp.n_x == 2 * problem.n_x + problem.n_u  # [x0; r; u_prev]
    p = np.concatenate([[1.0, 0.0], [2.0, 0.0], [0.0]])
    sol = solve_condensed_qp(qp, p)
    assert sol.status == "optimal"


def test_rate_composes_with_move_blocking():
    problem = _rate_problem(horizon=8)
    qp = tpu_gpad.condense(problem, control_horizon=3)
    p = np.concatenate([[2.0, 0.0], np.zeros(problem.n_u)])
    sol = solve_condensed_qp(qp, p)
    assert sol.status == "optimal"
    # held moves are identical, so their rate rows are inert zero rows
    U = sol.z.reshape(3, problem.n_u)
    dU = np.diff(np.concatenate([np.zeros((1, problem.n_u)), U]), axis=0)
    assert np.abs(dU).max() <= 0.3 + 1e-8
