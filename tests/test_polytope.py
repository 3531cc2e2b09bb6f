"""General polytopic constraints H_x x_k <= h_x / H_u u_k <= h_u."""

import numpy as np
import pytest

import tpu_gpad
from tpu_gpad import problems
from tpu_gpad.solver import SolverConfig
from tpu_gpad.solver.qp import solve_qp_exact


def _with(problem, **kw):
    import dataclasses

    return dataclasses.replace(problem, **kw)


def test_state_polytope_binds():
    """x1 + x2 <= c cuts the corner the box alone would allow."""
    # expensive braking (R=20): the unconstrained regulator coasts past
    # the cut, the constrained one must brake early to respect it
    base = problems.double_integrator(horizon=6, x_limit=20.0, u_limit=2.0,
                                      qu_weight=20.0)
    prob = _with(base, H_x=np.array([[1.0, 1.0]]), h_x=np.array([3.0]))
    qp = tpu_gpad.condense(prob)
    x0 = np.array([0.0, 2.8])  # moving fast: position + velocity wants > 3
    sol = solve_qp_exact(qp.H, qp.F.T @ x0 + qp.g, qp.G, qp.b0 + qp.E @ x0)
    # verify via explicit rollout: every predicted stage satisfies the cut
    x = x0.copy()
    for k in range(6):
        x = prob.A @ x + prob.B[:, 0] * sol.z[k]
        assert x[0] + x[1] <= 3.0 + 1e-7, k
    # and it actually binds at some stage (the unconstrained plan exceeds)
    qp0 = tpu_gpad.condense(base)
    sol0 = solve_qp_exact(qp0.H, qp0.F.T @ x0 + qp0.g, qp0.G, qp0.b0 + qp0.E @ x0)
    x = x0.copy()
    peak = -np.inf
    for k in range(6):
        x = prob.A @ x + prob.B[:, 0] * sol0.z[k]
        peak = max(peak, x[0] + x[1])
    assert peak > 3.0


def test_state_polytope_parameter_map():
    """The E-map carries -Hbar T: changing x0 shifts the RHS correctly."""
    base = problems.double_integrator(horizon=4)
    prob = _with(base, H_x=np.array([[1.0, 0.5]]), h_x=np.array([2.0]))
    qp = tpu_gpad.condense(prob)
    qp0 = tpu_gpad.condense(base)
    q = 1  # polytope rows per stage
    rows = slice(qp0.m, qp0.m + 4 * q)  # appended after the base stack
    T, S = tpu_gpad.condense.__globals__["prediction_matrices"](
        prob.A, prob.B, 4
    )
    Hbar = np.kron(np.eye(4), prob.H_x)
    np.testing.assert_allclose(qp.G[rows], Hbar @ S)
    np.testing.assert_allclose(qp.E[rows], -Hbar @ T)
    np.testing.assert_allclose(qp.b0[rows], 2.0)


def test_input_polytope_and_per_stage_rhs():
    """H_u = [1, 1] budget on the two balancing currents, tighter early."""
    base = problems.battery(n_cells=2, horizon=4)
    h_u = np.array([[0.1], [0.1], [0.4], [0.4]])
    prob = _with(base, H_u=np.array([[1.0, 1.0]]), h_u=h_u)
    qp = tpu_gpad.condense(prob)
    x0 = np.array([0.4, -0.4])
    sol = solve_qp_exact(qp.H, qp.F.T @ x0 + qp.g, qp.G, qp.b0 + qp.E @ x0)
    U = sol.z.reshape(4, 2)
    sums = U.sum(axis=1)
    assert (sums[:2] <= 0.1 + 1e-8).all()
    assert (sums[2:] <= 0.4 + 1e-8).all()


def test_polytope_gpad_matches_exact():
    # R=20 keeps u0 interior (saturated moves sit on the fp32 degenerate
    # directions, docs/DESIGN.md section 7)
    base = problems.double_integrator(horizon=6, x_limit=20.0, u_limit=2.0,
                                      qu_weight=20.0)
    prob = _with(base, H_x=np.array([[1.0, 1.0]]), h_x=np.array([3.0]))
    qp = tpu_gpad.condense(prob)
    data = tpu_gpad.dualize(qp, iterations=3000)
    assert not data.paired  # one-sided rows: dense dual layout
    x0 = np.array([0.0, 2.8], dtype=np.float32)
    res = tpu_gpad.solve_to_accuracy(data, x0, tol=1e-7, max_iterations=3000)
    assert np.asarray(res.converged).all()
    exact = solve_qp_exact(
        qp.H, qp.F.T @ x0.astype(np.float64) + qp.g,
        qp.G, qp.b0 + qp.E @ x0.astype(np.float64),
    )
    # fp32 fixed point lands within ~2e-3 on the binding cut; the
    # active-set polish recovers the exact optimum (docs/DESIGN.md §7)
    np.testing.assert_allclose(np.asarray(res.u[0]), exact.z[:1], atol=5e-3)
    pol = tpu_gpad.polish(qp, x0.astype(np.float64), np.asarray(res.z[0]))
    np.testing.assert_allclose(pol.z[:1], exact.z[:1], atol=1e-9)


def test_polytope_validation():
    base = problems.double_integrator(horizon=4)
    with pytest.raises(ValueError, match="together"):
        tpu_gpad.condense(_with(base, H_x=np.eye(2)))
    with pytest.raises(ValueError, match="H_x must be"):
        tpu_gpad.condense(_with(base, H_x=np.eye(3), h_x=np.ones(3)))
    with pytest.raises(ValueError, match="h_u must be"):
        tpu_gpad.condense(
            _with(base, H_u=np.ones((1, 1)), h_u=np.ones((3, 1)))
        )


def test_polytope_composes_with_affine_offset():
    """Known dynamics offset c shifts the polytope RHS by Hbar s_off."""
    base = problems.double_integrator(horizon=3)
    c = np.array([0.05, -0.02])
    prob = _with(base, H_x=np.array([[1.0, 1.0]]), h_x=np.array([2.0]), c=c)
    qp = tpu_gpad.condense(prob)
    x0 = np.array([0.1, 0.2])
    sol = solve_qp_exact(qp.H, qp.F.T @ x0 + qp.g, qp.G, qp.b0 + qp.E @ x0)
    x = x0.copy()
    for k in range(3):
        x = prob.A @ x + prob.B[:, 0] * sol.z[k] + c
        assert x[0] + x[1] <= 2.0 + 1e-7
