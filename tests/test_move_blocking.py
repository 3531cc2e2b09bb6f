"""Move blocking (control horizon M < prediction horizon N)."""

import numpy as np
import pytest

import tpu_gpad
from tpu_gpad import problems
from tpu_gpad.solver import SolverConfig
from tpu_gpad.solver.qp import solve_condensed_qp
from tpu_gpad.condense import blocking_matrix


def test_blocking_matrix_shape_and_hold_last():
    Bm = blocking_matrix(2, 5, 2)
    assert Bm.shape == (10, 4)
    z_b = np.arange(4.0)
    z = Bm @ z_b
    np.testing.assert_array_equal(z[:2], z_b[:2])   # move 0 free
    for k in range(1, 5):                            # moves 1..4 hold move 1
        np.testing.assert_array_equal(z[2 * k : 2 * k + 2], z_b[2:])


def test_full_control_horizon_is_identity():
    problem = problems.battery(n_cells=3, horizon=6)
    qp_a = tpu_gpad.condense(problem)
    qp_b = tpu_gpad.condense(problem, control_horizon=6)
    np.testing.assert_allclose(qp_a.H, qp_b.H)
    np.testing.assert_allclose(qp_a.G, qp_b.G)


def test_blocked_solution_cost_ordering():
    """Blocking restricts the feasible set: the blocked optimum costs at
    least as much as the full optimum, and both are exactly optimal for
    their own QPs; GPAD agrees with the exact blocked solution."""
    problem = problems.double_integrator(horizon=12)
    qp_full = tpu_gpad.condense(problem)
    qp_blk = tpu_gpad.condense(problem, control_horizon=4)
    assert qp_blk.n_z == 4

    x0 = np.array([3.0, -0.5])

    def cost(qp, z):
        f = qp.F.T @ x0 + qp.g
        return 0.5 * z @ qp.H @ z + f @ z

    s_full = solve_condensed_qp(qp_full, x0)
    s_blk = solve_condensed_qp(qp_blk, x0)
    assert s_full.status == s_blk.status == "optimal"
    # compare in the FULL space: lift the blocked z
    Bm = blocking_matrix(1, 12, 4)
    z_lift = Bm @ s_blk.z
    assert cost(qp_full, z_lift) >= cost(qp_full, s_full.z) - 1e-10

    data = tpu_gpad.dualize(qp_blk, iterations=300, paired="auto")
    res = tpu_gpad.solve(
        data, x0.astype(np.float32),
        config=SolverConfig(iterations=300, restart=True),
    )
    np.testing.assert_allclose(
        np.asarray(res.u[0]), s_blk.z[: qp_blk.n_u], atol=5e-4
    )


def test_blocked_closed_loop_still_balances():
    problem = problems.battery(n_cells=3, horizon=8)
    ctrl = tpu_gpad.Controller(
        problem, config=SolverConfig(iterations=60, restart=True)
    )
    # a blocked controller via the data= hook
    qp_blk = tpu_gpad.condense(problem, control_horizon=2)
    data_blk = tpu_gpad.dualize(qp_blk, iterations=60, paired="auto")
    ctrl_blk = tpu_gpad.Controller(
        problem, data=data_blk, config=SolverConfig(iterations=60, restart=True)
    )
    x_a = x_b = np.asarray(problems.battery_default_x0(3, seed=1), np.float64)
    for _ in range(30):
        ua = ctrl.step(x_a.astype(np.float32))
        ub = ctrl_blk.step(x_b.astype(np.float32))
        x_a = problem.A @ x_a + problem.B @ ua.astype(np.float64)
        x_b = problem.A @ x_b + problem.B @ ub.astype(np.float64)
    # both reduce the SoC spread; blocking barely hurts this slow plant
    assert np.ptp(x_b) < np.ptp(problems.battery_default_x0(3, seed=1))
    assert np.ptp(x_b) < np.ptp(x_a) * 1.5


def test_bad_control_horizon_rejected():
    problem = problems.battery(n_cells=3, horizon=4)
    with pytest.raises(ValueError, match="control horizon"):
        tpu_gpad.condense(problem, control_horizon=0)
    with pytest.raises(ValueError, match="control horizon"):
        tpu_gpad.condense(problem, control_horizon=9)


def test_blocked_data_plus_polish_rejected():
    problem = problems.battery(n_cells=3, horizon=8)
    qp_blk = tpu_gpad.condense(problem, control_horizon=2)
    data_blk = tpu_gpad.dualize(qp_blk, iterations=60, paired="auto")
    with pytest.raises(ValueError, match="polish"):
        tpu_gpad.Controller(problem, data=data_blk, polish=True)
