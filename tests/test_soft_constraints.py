"""Soft state constraints (slack-penalized) — beyond the reference's scope.

Production MPC needs the QP to stay feasible for any measured state; the
reference's hard state boxes make the battery QP infeasible for |x0| > 0.5.
``condense(problem, soft_state=w)`` keeps the same parametric QP class, so
the full stack (dualize, engines, restart, polish) runs unchanged.
"""

import numpy as np
import pytest

import tpu_gpad
from tpu_gpad import problems
from tpu_gpad.solver import SolverConfig, solve_batch
from tpu_gpad.solver.qp import solve_condensed_qp


@pytest.fixture(scope="module")
def soft_setup():
    problem = problems.battery(n_cells=3, horizon=6)
    qp = tpu_gpad.condense(problem, soft_state=1e3)
    data = tpu_gpad.dualize(qp, iterations=300, paired="auto")
    return problem, qp, data


def test_soft_matches_hard_when_inactive(soft_setup):
    """Interior states: slacks stay ~0 and u* equals the hard solution."""
    problem, qp_s, data_s = soft_setup
    qp_h = tpu_gpad.condense(problem)
    data_h = tpu_gpad.dualize(qp_h, iterations=300, paired="auto")
    x0 = np.asarray([0.1, -0.05, -0.05], dtype=np.float32)
    cfg = SolverConfig(iterations=300, restart=True)
    u_s = np.asarray(tpu_gpad.solve(data_s, x0, config=cfg).u[0])
    u_h = np.asarray(tpu_gpad.solve(data_h, x0, config=cfg).u[0])
    np.testing.assert_allclose(u_s, u_h, atol=1e-4)


def test_soft_stays_feasible_beyond_hard_bounds(soft_setup):
    """x0 outside the SoC box: hard QP infeasible, soft QP solves fine."""
    problem, qp_s, data_s = soft_setup
    x0 = np.asarray([0.7, -0.6, 0.1], dtype=np.float32)  # |x| > 0.5 box
    qp_h = tpu_gpad.condense(problem)
    hard = solve_condensed_qp(qp_h, x0)
    assert hard.status != "optimal"  # hard problem is infeasible here
    res = tpu_gpad.solve(data_s, x0, config=SolverConfig(iterations=300, restart=True))
    u = np.asarray(res.u[0])
    assert np.all(np.isfinite(u))
    # soft exact solution agrees (the slack penalty worsens conditioning, so
    # the raw 300-iteration device solve is ~1e-3; polish closes the rest)
    exact = solve_condensed_qp(qp_s, x0)
    assert exact.status == "optimal"
    np.testing.assert_allclose(u, exact.z[: qp_s.n_u], atol=5e-3)
    sol_p = tpu_gpad.polish(qp_s, x0, np.asarray(res.z[0]))
    np.testing.assert_allclose(sol_p.z, exact.z, atol=1e-8)
    # the slack tail is actually used (states must violate the box)
    n_z_hard = problem.n_u * problem.horizon
    slacks = exact.z[n_z_hard:]
    assert slacks.max() > 1e-3
    assert slacks.min() > -1e-9  # s >= 0 respected


def test_soft_penalty_weight_controls_violation(soft_setup):
    """Heavier penalty => (weakly) less total slack. The battery dynamics
    cap how fast SoC can re-enter the box (u saturates at the current
    limit for every weight), so the effect shows in the accumulated slack,
    not its peak."""
    problem, _, _ = soft_setup
    x0 = np.asarray([0.52, -0.51, 0.1])
    n_z_hard = problem.n_u * problem.horizon
    sums = []
    for w in (1e0, 1e4):
        qp_w = tpu_gpad.condense(problem, soft_state=w)
        sol = solve_condensed_qp(qp_w, x0)
        assert sol.status == "optimal"
        sums.append(sol.z[n_z_hard:].sum())
    assert sums[1] < sums[0]


def test_soft_rejects_bad_args():
    problem = problems.battery(n_cells=3, horizon=4)
    with pytest.raises(ValueError, match="positive"):
        tpu_gpad.condense(problem, soft_state=-1.0)
    import dataclasses

    no_box = dataclasses.replace(problem, x_min=None, x_max=None)
    with pytest.raises(ValueError, match="state box"):
        tpu_gpad.condense(no_box, soft_state=1.0)


def test_soft_through_full_stack_with_polish(soft_setup):
    problem, qp_s, data_s = soft_setup
    rng = np.random.default_rng(2)
    X0 = rng.uniform(-0.7, 0.7, size=(4, 3)).astype(np.float32)
    res = solve_batch(data_s, X0, config=SolverConfig(iterations=300, restart=True))
    Z, statuses = tpu_gpad.polish_batch(qp_s, X0, np.asarray(res.z))
    assert all(s == "optimal" for s in statuses)
    for i in range(4):
        exact = solve_condensed_qp(qp_s, X0[i]).z
        assert np.abs(Z[i] - exact).max() < 1e-8
