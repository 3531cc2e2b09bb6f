import numpy as np
import pytest

from tpu_gpad import problems
from tpu_gpad.condense import condense, prediction_matrices, lipschitz_constant


def test_battery_constraint_count():
    """m = 4 n_u N + 2 N, the reference's scaling law (abstract p.2; fixture
    step3/4 header: n_u=30, N=30 -> m=3660)."""
    for n, N in [(3, 4), (4, 3), (10, 15), (30, 30), (15, 10)]:
        qp = condense(problems.battery(n_cells=n, horizon=N))
        assert qp.m == 4 * n * N + 2 * N
        assert qp.n_z == n * N


def test_prediction_matrices_identity_plant():
    """Battery plant has A=I so T stacks identities and S is block-lower-
    triangular with constant block B (gpad.m:50-63)."""
    prob = problems.battery(n_cells=2, horizon=3)
    T, S = prediction_matrices(prob.A, prob.B, 3)
    n = 2
    for i in range(3):
        np.testing.assert_allclose(T[i * n : (i + 1) * n], np.eye(n))
        for j in range(3):
            blk = S[i * n : (i + 1) * n, j * n : (j + 1) * n]
            expect = prob.B if j <= i else np.zeros((n, n))
            np.testing.assert_allclose(blk, expect)


def test_prediction_recursion_random_plant(rng):
    n_x, n_u, N = 3, 2, 5
    A = rng.normal(size=(n_x, n_x)) * 0.5
    B = rng.normal(size=(n_x, n_u))
    T, S = prediction_matrices(A, B, N)
    x0 = rng.normal(size=n_x)
    z = rng.normal(size=n_u * N)
    xs = T @ x0 + S @ z
    # brute-force rollout
    x = x0
    for k in range(N):
        x = A @ x + B @ z[k * n_u : (k + 1) * n_u]
        np.testing.assert_allclose(xs[k * n_x : (k + 1) * n_x], x, atol=1e-10)


def test_hessian_spd():
    for prob in [problems.battery(3, 4), problems.double_integrator(10), problems.mass_spring(2, 6)]:
        qp = condense(prob)
        eig = np.linalg.eigvalsh(qp.H)
        assert eig[0] > 0, prob.name
        np.testing.assert_allclose(qp.H, qp.H.T)


def test_constraint_stack_matches_reference_layout():
    """Row order and x0-dependence match gpad.m:84-85."""
    prob = problems.battery(n_cells=2, horizon=2)
    qp = condense(prob)
    T, S = prediction_matrices(prob.A, prob.B, 2)
    n_z = 4
    np.testing.assert_allclose(qp.G[:n_z], S)
    np.testing.assert_allclose(qp.G[n_z : 2 * n_z], -S)
    np.testing.assert_allclose(qp.G[2 * n_z : 3 * n_z], np.eye(n_z))
    np.testing.assert_allclose(qp.G[3 * n_z : 4 * n_z], -np.eye(n_z))
    # coupling rows: sum over each stage's inputs
    K = qp.G[4 * n_z : 4 * n_z + 2]
    np.testing.assert_allclose(K, [[1, 1, 0, 0], [0, 0, 1, 1]])
    np.testing.assert_allclose(qp.G[4 * n_z + 2 :], -K)
    # b(x0) = b0 + E x0: state rows depend on x0 via -T / +T
    np.testing.assert_allclose(qp.E[:n_z], -T)
    np.testing.assert_allclose(qp.E[n_z : 2 * n_z], T)
    np.testing.assert_allclose(qp.E[2 * n_z :], 0.0)


def test_lipschitz_ordering():
    qp = condense(problems.battery(3, 4))
    l_spec = lipschitz_constant(qp, "spectral_dual")
    l_fro = lipschitz_constant(qp, "fro_dual")
    l_ref = lipschitz_constant(qp, "reference")
    assert 0 < l_spec <= l_fro + 1e-9
    # the reference mode reproduces MATLAB's ||H||_F^2 (acceldualgrad.m:11)
    np.testing.assert_allclose(l_ref, np.linalg.norm(qp.H, "fro") ** 2)
    with pytest.raises(ValueError):
        lipschitz_constant(qp, "bogus")
