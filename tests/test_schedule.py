import numpy as np

from tpu_gpad.schedule import momentum_schedule


def test_theta_recursion():
    theta, beta = momentum_schedule(50, "paper")
    assert theta[0] == 1.0
    assert beta[0] == 0.0
    golden = (np.sqrt(5.0) - 1.0) / 2.0  # theta_1 = (sqrt(1+4)-1)/2
    assert abs(theta[1] - golden) < 1e-6
    # theta is strictly decreasing toward 0, O(2/k)
    assert np.all(np.diff(theta) < 0)
    assert theta[-1] < 2.0 / 40


def test_beta_relation():
    theta, beta = momentum_schedule(20, "paper")
    for k in range(1, 20):
        assert abs(beta[k] - theta[k] * (1.0 / theta[k - 1] - 1.0)) < 1e-6


def test_reference_variant_is_lagged():
    theta_p, beta_p = momentum_schedule(20, "paper")
    theta_r, beta_r = momentum_schedule(20, "reference")
    np.testing.assert_allclose(theta_p, theta_r)
    assert beta_r[0] == 0.0
    np.testing.assert_allclose(beta_r[1:], beta_p[:-1])


def test_matlab_trajectory():
    """Replays acceldualgrad.m:55-64 register shifting and compares."""
    n = 12
    th_vm1, th_v, beta_v = 1.0, 1.0, 0.0
    matlab_theta, matlab_beta = [], []
    for _ in range(n):
        matlab_theta.append(th_v)
        matlab_beta.append(beta_v)
        th_vp1 = (np.sqrt(th_v**4 + 4 * th_v**2) - th_v**2) / 2
        beta_v = th_v * (1.0 / th_vm1 - 1.0)
        th_vm1, th_v = th_v, th_vp1
    theta, beta = momentum_schedule(n, "reference")
    np.testing.assert_allclose(theta, matlab_theta, rtol=1e-6)
    np.testing.assert_allclose(beta, matlab_beta, rtol=1e-5, atol=1e-7)
