"""Property tests for the implicit-differentiation module on random
constrained plants.

Each case: a random stable LTI plant (with or without couplings / rate
limits / tracking), a batch of random parameters, the converged GPAD
solve, and the sensitivity vs a float64 exact-QP central difference —
skipping parameters whose active set flips inside the FD stencil
(genuine nondifferentiability, detected via the oracle's active sets).
"""

import numpy as np
import pytest

import tpu_gpad
from tpu_gpad import diff, problems
from tpu_gpad.solver import SolverConfig, solve_batch
from tpu_gpad.solver.qp import solve_condensed_qp

H_FD = 1e-5


def _fd_column(qp, p, j, h=H_FD):
    e = np.zeros(p.size)
    e[j] = h
    sols = []
    for pp in (p + e, p - e):
        sol = solve_condensed_qp(qp, pp)
        if sol.status != "optimal":
            return None, None
        sols.append(sol)
    same_active = np.array_equal(sols[0].active, sols[1].active)
    return (sols[0].z[: qp.n_u] - sols[1].z[: qp.n_u]) / (2 * h), same_active


@pytest.mark.parametrize(
    "seed,kw,tracking",
    [
        (0, dict(n_x=4, n_u=2, horizon=6), False),
        (1, dict(n_x=3, n_u=2, horizon=5, coupled=True), False),
        (2, dict(n_x=3, n_u=1, horizon=7), True),
    ],
    ids=["boxes", "coupled", "tracking"],
)
def test_gain_matches_exact_qp_fd_random(seed, kw, tracking):
    problem = problems.random_lti(seed=seed, **kw)
    qp = tpu_gpad.condense(problem, tracking=tracking)
    data = tpu_gpad.dualize(qp, iterations=400, paired="auto")
    n_p = qp.F.shape[0]
    rng = np.random.default_rng(seed + 50)
    P = rng.uniform(-0.6, 0.6, size=(8, n_p)).astype(np.float32)
    res = solve_batch(
        data, P, config=SolverConfig(iterations=400, restart=True,
                                     engine="xla")
    )
    K_u, _ = diff.sensitivity(data, res.y)
    checked = 0
    for i in range(P.shape[0]):
        base = solve_condensed_qp(qp, np.asarray(P[i], np.float64))
        if base.status != "optimal":
            continue
        # weakly active rows make the derivative one-sided; skip those
        lam_active = base.lam[base.lam > 1e-9]
        if lam_active.size and lam_active.min() < 1e-5:
            continue
        for j in range(n_p):
            fd, clean = _fd_column(qp, np.asarray(P[i], np.float64), j)
            if fd is None or not clean:
                continue  # active set flips inside the stencil
            err = np.abs(np.asarray(K_u[i][:, j]) - fd).max()
            scale = 1.0 + np.abs(fd).max()
            assert err / scale < 5e-3, (seed, i, j, err, fd)
            checked += 1
    assert checked >= 3 * n_p  # non-vacuous across the batch


def test_gain_zero_where_fully_saturated():
    """All moves pinned at their box: the local gain must be exactly 0."""
    problem = problems.double_integrator(horizon=4, u_limit=0.2)
    qp = tpu_gpad.condense(problem)
    data = tpu_gpad.dualize(qp, iterations=300, paired="auto")
    P = np.array([[2.5, 0.8]], np.float32)  # feasible, bang-bang saturated
    res = solve_batch(
        data, P, config=SolverConfig(iterations=300, restart=True,
                                     engine="xla")
    )
    assert float(np.asarray(res.residual)[0]) < 2e-6  # feasible
    assert np.abs(np.asarray(res.u[0])).min() > 0.2 - 1e-5  # fp32-converged
    K_u, _ = diff.sensitivity(data, res.y)
    np.testing.assert_allclose(np.asarray(K_u[0]), 0.0, atol=1e-6)
