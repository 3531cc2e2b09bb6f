"""Certified iteration bounds: the budget must actually deliver the target
tolerances on sampled parameters (validity check of the eq. (11)/(13)-style
formulas in tpu_gpad.bounds)."""

import numpy as np
import pytest

import tpu_gpad
from tpu_gpad import problems
from tpu_gpad.bounds import certify, certified_budget, dual_norm_bound
from tpu_gpad.condense import lipschitz_constant
from tpu_gpad.solver.reference import gpad_solve_qp


def test_budget_monotonicity():
    assert certified_budget(10.0, 5.0, 1e-3, 1e-3) >= certified_budget(10.0, 5.0, 1e-2, 1e-2)
    assert certified_budget(10.0, 5.0, 1e-3, 1e-3) <= certified_budget(100.0, 5.0, 1e-3, 1e-3)


def test_certified_budget_achieves_tolerances():
    prob = problems.battery(n_cells=3, horizon=6)
    qp = tpu_gpad.condense(prob)
    p_lim = 0.3
    eps_g, eps_V = 1e-2, 1e-2
    N_nu, dn, L = certify(
        qp,
        -p_lim * np.ones(3),
        p_lim * np.ones(3),
        eps_g=eps_g,
        eps_V=eps_V,
        n_samples=40,
    )
    assert dn.delta >= dn.delta_observed
    assert N_nu > 0
    # run GPAD for exactly the certified budget on fresh samples; the
    # epsilon test must pass at or before N_nu for every sample
    rng = np.random.default_rng(99)
    for _ in range(10):
        p = rng.uniform(-p_lim, p_lim, size=3)
        res = gpad_solve_qp(
            qp, p, iterations=N_nu, eps_g=eps_g, eps_V=eps_V, check_every=1
        )
        assert res.iterations <= N_nu
        assert res.residual <= eps_g * (1 + 1e-6), res.residual


def test_dual_norm_bound_vertex_dominates_interior():
    qp = tpu_gpad.condense(problems.battery(n_cells=3, horizon=6))
    dn = dual_norm_bound(qp, -0.2 * np.ones(3), 0.2 * np.ones(3), n_samples=30, safety=1.0)
    # the argmax parameter should be (close to) a vertex of the box
    assert np.abs(np.abs(dn.argmax_p) - 0.2).max() < 1e-9


def test_milp_bound_exact_on_grid():
    """The eq.-(16) MILP equals the brute-force grid max of ||y*(p)||_1
    (vertices included) on the double integrator."""
    import itertools

    from tpu_gpad.bounds import dual_norm_bound_milp
    from tpu_gpad.solver.qp import solve_condensed_qp

    qp = tpu_gpad.condense(problems.double_integrator(horizon=3))
    lo, hi = np.array([-5.0, -2.0]), np.array([5.0, 2.0])
    m = dual_norm_bound_milp(qp, lo, hi)
    grid = [np.linspace(l, h, 5) for l, h in zip(lo, hi)]
    best = 0.0
    for p in itertools.product(*grid):
        sol = solve_condensed_qp(qp, np.asarray(p))
        if sol.status == "optimal":
            best = max(best, float(np.abs(sol.lam).sum()))
    assert m.delta >= best - 1e-6
    assert m.delta <= best + 1e-6  # max attained on the (vertex-incl.) grid


def test_milp_bound_dominates_sampled_and_certifies():
    from tpu_gpad.bounds import certify, dual_norm_bound

    qp = tpu_gpad.condense(problems.battery(n_cells=3, horizon=4))
    lo, hi = np.full(3, -0.4), np.full(3, 0.4)
    sampled = dual_norm_bound(qp, lo, hi, n_samples=100)
    n_nu, dn, L = certify(qp, lo, hi, eps_g=1e-3, eps_V=1e-3, method="milp")
    assert dn.delta >= sampled.delta_observed - 1e-6  # 1-norm >= 2-norm
    assert n_nu > 0 and L > 0


def test_milp_bound_requires_bounded_z():
    import dataclasses

    from tpu_gpad.bounds import dual_norm_bound_milp

    problem = problems.battery(n_cells=3, horizon=4)
    no_u_box = dataclasses.replace(problem, u_min=None, u_max=None)
    qp = tpu_gpad.condense(no_u_box)
    with pytest.raises(ValueError, match="finite bounds"):
        dual_norm_bound_milp(qp, np.full(3, -0.4), np.full(3, 0.4))
