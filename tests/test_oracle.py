"""NumPy-oracle correctness: KKT optimality of the GPAD solution and
agreement with an independent QP solver (scipy SLSQP) — the role MATLAB
``quadprog`` plays in the reference (gpad.m:89, commented)."""

import numpy as np
import pytest
from scipy.optimize import minimize

from tpu_gpad import problems
from tpu_gpad.condense import condense
from tpu_gpad.problems.battery import default_x0
from tpu_gpad.solver.reference import gpad_solve_qp


def scipy_qp(qp, x0):
    f = qp.F.T @ x0 + qp.g
    b = qp.b0 + qp.E @ x0
    fun = lambda z: 0.5 * z @ qp.H @ z + f @ z
    jac = lambda z: qp.H @ z + f
    cons = [{"type": "ineq", "fun": lambda z: b - qp.G @ z, "jac": lambda z: -qp.G}]
    res = minimize(fun, np.zeros(qp.n_z), jac=jac, constraints=cons, method="SLSQP",
                   options={"maxiter": 500, "ftol": 1e-12})
    assert res.success, res.message
    return res.x


def kkt_check(qp, x0, z, y, tol_stat=1e-3, tol_feas=1e-4, tol_comp=1e-3):
    """Stationarity H z + f + G' y = 0, primal/dual feasibility,
    complementary slackness."""
    f = qp.F.T @ x0 + qp.g
    b = qp.b0 + qp.E @ x0
    stat = np.abs(qp.H @ z + f + qp.G.T @ y).max()
    feas = np.maximum(qp.G @ z - b, 0.0).max()
    comp = np.abs(y * (qp.G @ z - b)).max()
    assert y.min() >= 0.0
    assert stat < tol_stat, f"stationarity {stat}"
    assert feas < tol_feas, f"feasibility {feas}"
    assert comp < tol_comp, f"complementarity {comp}"


def test_battery_oracle_kkt_and_scipy():
    prob = problems.battery(n_cells=3, horizon=4)
    qp = condense(prob)
    x0 = default_x0(3, seed=7)
    res = gpad_solve_qp(qp, x0, iterations=3000)
    kkt_check(qp, x0, res.z.astype(np.float64), res.y.astype(np.float64))
    z_ref = scipy_qp(qp, x0)
    np.testing.assert_allclose(res.u, z_ref[:3], atol=1e-4)


def test_double_integrator_oracle_vs_scipy():
    qp = condense(problems.double_integrator(horizon=8))
    x0 = np.array([5.0, -1.0])
    res = gpad_solve_qp(qp, x0, iterations=4000)
    z_ref = scipy_qp(qp, x0)
    np.testing.assert_allclose(res.z, z_ref, atol=2e-4)


def test_eps_termination_stops_early():
    qp = condense(problems.battery(n_cells=3, horizon=4))
    x0 = default_x0(3, seed=3)
    res = gpad_solve_qp(qp, x0, iterations=20000, eps_g=1e-5, eps_V=1e-5, check_every=10)
    assert res.iterations < 20000
    assert res.residual <= 1.2e-5


def test_reference_lipschitz_slows_convergence():
    """The MATLAB ||H||_F^2 constant takes far more iterations to the same
    residual than the spectral constant (SURVEY.md 'hard parts')."""
    qp = condense(problems.battery(n_cells=3, horizon=4))
    x0 = default_x0(3, seed=5)
    res_good = gpad_solve_qp(qp, x0, iterations=5000, eps_g=1e-4, eps_V=1e-4)
    res_ref = gpad_solve_qp(qp, x0, iterations=5000, lipschitz="reference",
                            eps_g=1e-4, eps_V=1e-4)
    assert res_good.iterations < res_ref.iterations


def test_schedule_variants_both_converge():
    qp = condense(problems.battery(n_cells=3, horizon=4))
    x0 = default_x0(3, seed=11)
    r1 = gpad_solve_qp(qp, x0, iterations=2000, schedule="paper")
    r2 = gpad_solve_qp(qp, x0, iterations=2000, schedule="reference")
    np.testing.assert_allclose(r1.u, r2.u, atol=1e-4)


def test_oracle_residual_history():
    import tpu_gpad
    from tpu_gpad import problems
    from tpu_gpad.solver.reference import gpad_solve_qp

    qp = tpu_gpad.condense(problems.battery(n_cells=3, horizon=6))
    x0 = problems.battery_default_x0(3, seed=1)
    r = gpad_solve_qp(qp, x0, iterations=120, history=True)
    h = r.residual_history
    assert h is not None and h.shape == (120,)
    # converging: the tail is far below the head, and the last entry
    # matches the reported residual
    assert h[-1] <= h[:10].max()
    np.testing.assert_allclose(h[-1], r.residual, rtol=1e-6)
    # restart converges much faster at the same budget
    rr = gpad_solve_qp(qp, x0, iterations=120, history=True, restart=True)
    assert rr.residual_history[-1] <= max(h[-1], 1e-12)
