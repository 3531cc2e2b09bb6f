"""Moving-horizon estimation: Kalman equivalence, constrained wins,
batched windows.

The load-bearing check is the steady-state Kalman equivalence: with
inactive bounds, the window QP + filtering arrival cost must reproduce
the steady-state Kalman filter exactly (linear-Gaussian MAP = least
squares). Then the constrained cases do what the filter cannot.
"""

import numpy as np

from conftest import backend_tol
import pytest

from tpu_gpad.estimator import kalman_gain
from tpu_gpad.mhe import MovingHorizonEstimator, mhe_qp
from tpu_gpad.solver.qp import solve_condensed_qp

A = np.array([[1.0, 0.1], [0.0, 0.97]])
B = np.array([[0.005], [0.1]])
C = np.array([[1.0, 0.0]])
W = np.diag([1e-4, 4e-3])
V = np.array([[1e-2]])


def _simulate(steps, seed, w_clip=None):
    rng = np.random.default_rng(seed)
    xs, ys, us = [], [], []
    x = np.array([0.5, 0.0])
    for k in range(steps):
        ys.append(C @ x + rng.normal(0, np.sqrt(V[0, 0]), 1))
        xs.append(x.copy())
        u = np.array([0.4 * np.sin(0.11 * k)])
        us.append(u)
        w = rng.multivariate_normal(np.zeros(2), W)
        if w_clip is not None:
            w = np.clip(w, -w_clip, w_clip)
        x = A @ x + B @ u + w
    return np.array(xs), np.array(ys), np.array(us)


def _ss_kf(ys, us, x0):
    """Plain steady-state Kalman filter (predictor-DARE gain)."""
    Lf = kalman_gain(A, C, W, V)
    xh = np.asarray(x0, np.float64).copy()
    out = []
    for k, y in enumerate(ys):
        if k > 0:
            xh = A @ xh + B @ us[k - 1]
        xh = xh + Lf @ (y - C @ xh)
        out.append(xh.copy())
    return np.array(out)


def test_matches_steady_state_kalman_when_unconstrained():
    """Loose bounds never bind -> MHE == steady-state KF to fp tolerance,
    including while the buffer is filling (the shadow-KF phase)."""
    xs, ys, us = _simulate(40, seed=0)
    kf = _ss_kf(ys, us, x0=np.zeros(2))
    est = MovingHorizonEstimator(
        A, B, C, window=6, W=W, V=V,
        w_min=np.full(2, -1e3), w_max=np.full(2, 1e3),
        x0=np.zeros(2), iterations=300,
    )
    errs = []
    for k in range(len(ys)):
        xh = est.update(ys[k], us[k - 1] if k > 0 else None)
        errs.append(np.abs(xh - kf[k]).max())
    assert max(errs[:5]) < 1e-9  # buffer-filling phase IS the KF
    assert max(errs) < 5e-4  # window QP phase: fp32 GPAD vs f64 KF


def test_matches_exact_qp():
    """The streaming solve agrees with the f64 active-set QP."""
    xs, ys, us = _simulate(12, seed=3)
    est = MovingHorizonEstimator(
        A, B, C, window=6, W=W, V=V,
        w_min=np.full(2, -0.05), w_max=np.full(2, 0.05),
        x0=np.zeros(2), iterations=300,
    )
    for k in range(len(ys)):
        xh = est.update(ys[k], us[k - 1] if k > 0 else None)
    st = est.structure
    p = np.concatenate(
        [est.x_bar, np.stack(est._ys).ravel(), np.stack(est._us).ravel()]
    )
    sol = solve_condensed_qp(st.qp, p)
    assert sol.status == "optimal"
    X = st.M @ sol.z + st.N_u @ np.stack(est._us).ravel()
    np.testing.assert_allclose(xh, X[-2:], atol=2e-4)


def test_constrained_beats_kalman_under_bounded_noise():
    """The true model is (near-)exact — w bounded by a tiny known limit —
    but both estimators assume the same inflated W. The MHE's hard bound
    turns the window into constrained batch smoothing and beats the
    bound-blind Kalman filter decisively."""
    clip = np.array([1e-5, 1e-5])
    xs, ys, us = _simulate(60, seed=7, w_clip=clip)
    kf = _ss_kf(ys, us, x0=np.zeros(2))
    est = MovingHorizonEstimator(
        A, B, C, window=8, W=W, V=V,
        w_min=-clip, w_max=clip,
        x0=np.zeros(2), iterations=300,
    )
    mhe = np.array([
        est.update(ys[k], us[k - 1] if k > 0 else None)
        for k in range(len(ys))
    ])
    burn = 10
    rmse_kf = np.sqrt(((kf[burn:] - xs[burn:]) ** 2).mean())
    rmse_mhe = np.sqrt(((mhe[burn:] - xs[burn:]) ** 2).mean())
    assert rmse_mhe < rmse_kf, (rmse_mhe, rmse_kf)
    # the bounds actually bound something (non-vacuous)
    y_dual = np.asarray(est.last_result.y)
    assert y_dual.max() > 1e-6


def test_state_bounds_respected():
    """Known x >= 0 (e.g. a concentration): the MHE estimate never goes
    negative where the Kalman filter's does."""
    # truth parked at the origin (a physical lower bound): measurements
    # are pure noise, so the filter's position estimate dips negative
    rng = np.random.default_rng(11)
    steps = 50
    xs = np.zeros((steps, 2))
    ys = rng.normal(0, np.sqrt(V[0, 0]), (steps, 1))
    us = np.zeros((steps, 1))
    kf = _ss_kf(ys, us, x0=np.zeros(2))
    est = MovingHorizonEstimator(
        A, B, C, window=6, W=W, V=V,
        x_min=np.array([0.0, -10.0]), x_max=np.array([10.0, 10.0]),
        w_min=np.full(2, -1.0), w_max=np.full(2, 1.0),
        x0=np.zeros(2), iterations=300,
    )
    mhe = np.array([
        est.update(ys[k], us[k - 1] if k > 0 else None)
        for k in range(len(ys))
    ])
    assert (kf[6:, 0] < -1e-4).any()  # the filter violates the known bound
    assert mhe[6:, 0].min() > -1e-4  # the MHE estimate honors it


def test_batched_windows_match_streaming():
    """solve_window on B stacked windows == B sequential solves."""
    est = MovingHorizonEstimator(
        A, B, C, window=5, W=W, V=V,
        w_min=np.full(2, -0.05), w_max=np.full(2, 0.05),
        x0=np.zeros(2), iterations=300,
    )
    rngs = [0, 5, 9, 13]
    xbars, Ys, Us = [], [], []
    for seed in rngs:
        _, ys, us = _simulate(5, seed=seed)
        xbars.append(np.random.default_rng(seed).normal(0, 0.1, 2))
        Ys.append(ys)
        Us.append(us[:4])
    x_hat, _ = est.solve_window(
        np.stack(xbars), np.stack(Ys), np.stack(Us)
    )
    for i in range(len(rngs)):
        xi, _ = est.solve_window(
            np.stack(xbars)[i : i + 1], np.stack(Ys)[i : i + 1],
            np.stack(Us)[i : i + 1],
        )
        # chip: batch-4 vs batch-1 solves are different fp32 programs
        # (reduction orders differ) and diverge ~1e-3 at 300 restart
        # iterations (relu boundaries) — the standard backend_tol case
        np.testing.assert_allclose(
            np.asarray(x_hat)[i], np.asarray(xi)[0],
            atol=backend_tol(1e-5, 5e-3)
        )


def test_stagewise_engine_matches_condensed():
    """engine='stagewise' solves the SAME MAP problem through the O(T)
    stage-wise engine (pre-stage change of variables + runtime q_lin/c)
    and must agree with the condensed window solve (VERDICT r04 item 2)."""
    kw = dict(
        W=W, V=V, w_min=np.full(2, -0.05), w_max=np.full(2, 0.05),
        x0=np.zeros(2), iterations=600,
    )
    est_c = MovingHorizonEstimator(A, B, C, window=6, engine="condensed",
                                   **kw)
    est_s = MovingHorizonEstimator(A, B, C, window=6, engine="stagewise",
                                   **kw)
    assert est_s.engine == "stagewise"
    xbars, Ys, Us = [], [], []
    for seed in (0, 5, 9):
        _, ys, us = _simulate(6, seed=seed)
        xbars.append(np.random.default_rng(seed).normal(0, 0.1, 2))
        Ys.append(ys)
        Us.append(us[:5])
    xc, rc = est_c.solve_window(np.stack(xbars), np.stack(Ys), np.stack(Us))
    xs_, rs = est_s.solve_window(np.stack(xbars), np.stack(Ys), np.stack(Us))
    np.testing.assert_allclose(
        np.asarray(xs_), np.asarray(xc), atol=backend_tol(5e-4, 2e-3)
    )
    # streaming interface rides the same engine (incl. warm starts)
    _, ys, us = _simulate(16, seed=3)
    est_c2 = MovingHorizonEstimator(A, B, C, window=6, engine="condensed",
                                    **kw)
    est_s2 = MovingHorizonEstimator(A, B, C, window=6, engine="stagewise",
                                    **kw)
    for k in range(len(ys)):
        xh_c = est_c2.update(ys[k], us[k - 1] if k > 0 else None)
        xh_s = est_s2.update(ys[k], us[k - 1] if k > 0 else None)
        np.testing.assert_allclose(
            xh_s, xh_c, atol=backend_tol(1e-3, 5e-3)
        )


def test_stagewise_long_window_kalman_equivalence():
    """A T=60 window (condensation-hostile: the condensed MHE QP would be
    (120, 120) operands with 1440 rows here, and O(T^2) beyond) solved
    stage-wise with inactive bounds == steady-state KF."""
    T = 60
    xs, ys, us = _simulate(T, seed=1)
    kf = _ss_kf(ys, us, x0=np.zeros(2))
    est = MovingHorizonEstimator(
        A, B, C, window=T, W=W, V=V,
        w_min=np.full(2, -1e3), w_max=np.full(2, 1e3),
        x0=np.zeros(2), iterations=1500, engine="stagewise",
    )
    x_hat, res = est.solve_window(
        np.zeros((1, 2)), ys[None], us[:-1][None]
    )
    assert np.all(np.asarray(res.residual) < 1e-3)
    np.testing.assert_allclose(
        np.asarray(x_hat)[0], kf[-1], atol=backend_tol(2e-3, 5e-3)
    )


def test_mhe_auto_routes_by_memory_backstop():
    """MHE auto routing is the O(T^2 n_x^2) MEMORY backstop only: the
    MPC throughput crossover does not transfer to small-state MHE
    (chip-measured 0.048x at T=180 n_x=2 — MHE_STAGEWISE.json), so a
    long window with tiny state stays condensed, and only walls of
    condensed operands route stage-wise."""
    # T=180, n_x=2: condensed operands ~4 MB — condensed stays
    est = MovingHorizonEstimator(
        A, B, C, window=180, W=W, V=V,
        w_min=np.full(2, -1.0), w_max=np.full(2, 1.0), iterations=10,
    )
    assert est.engine == "condensed"
    # T=1500, n_x=2: ~290 MB projected -> stage-wise
    est2 = MovingHorizonEstimator(
        A, B, C, window=1500, W=W, V=V,
        w_min=np.full(2, -1.0), w_max=np.full(2, 1.0), iterations=10,
    )
    assert est2.engine == "stagewise"
    est3 = MovingHorizonEstimator(
        A, B, C, window=5, W=W, V=V,
        w_min=np.full(2, -1.0), w_max=np.full(2, 1.0), iterations=10,
    )
    assert est3.engine == "condensed"


def test_validation():
    with pytest.raises(ValueError, match="Kalman"):
        mhe_qp(A, B, C, 5, np.eye(2), W, V)
    with pytest.raises(ValueError, match="window"):
        mhe_qp(A, B, C, 1, np.eye(2), W, V, w_max=np.ones(2))
    est = MovingHorizonEstimator(
        A, B, C, window=4, W=W, V=V, w_max=np.ones(2), w_min=-np.ones(2)
    )
    est.update(np.zeros(1))
    with pytest.raises(ValueError, match="u_prev"):
        est.update(np.zeros(1))


def test_measurement_influence_via_diff():
    """Cross-module composition: diff.sensitivity on the MHE window QP
    gives the estimate's influence function dx_hat/d[xbar; Y; U] —
    checked against finite differences of the batched window solve."""
    from tpu_gpad import diff

    est = MovingHorizonEstimator(
        A, B, C, window=5, W=W, V=V,
        w_min=np.full(2, -0.02), w_max=np.full(2, 0.02),
        x0=np.zeros(2), iterations=300,
    )
    rng = np.random.default_rng(4)
    xbar = rng.normal(0, 0.1, (1, 2))
    Y = rng.normal(0, 0.1, (1, 5, 1))
    U = rng.normal(0, 0.3, (1, 4, 1))
    x_hat, res = est.solve_window(xbar, Y, U)
    st = est.structure
    _, K_z = diff.sensitivity(est.data, res.y)
    # x_hat = M_last z* + N_last U; U occupies the trailing p entries
    M_last = st.M[-st.n_x:]
    dxhat_dp = np.asarray(M_last @ np.asarray(K_z[0]))
    n_p = est.data.gP_map.shape[0]
    dxhat_dp[:, n_p - 4:] += st.N_u[-st.n_x:]
    # FD over one measurement coordinate and the arrival state
    for j, (dx, dY, dU) in enumerate([
        (np.array([[1e-4, 0.0]]), 0.0, 0.0),
        (0.0, 1e-4, 0.0),
    ]):
        if j == 0:
            xp, _ = est.solve_window(xbar + dx, Y, U)
            xm, _ = est.solve_window(xbar - dx, Y, U)
            col = dxhat_dp[:, 0]
            h = 1e-4
        else:
            e = np.zeros_like(Y)
            e[0, 2, 0] = 1e-4  # middle measurement
            xp, _ = est.solve_window(xbar, Y + e, U)
            xm, _ = est.solve_window(xbar, Y - e, U)
            col = dxhat_dp[:, 2 + 2]  # p = [xbar(2); y_0..y_4; u...]
            h = 1e-4
        fd = (np.asarray(xp[0]) - np.asarray(xm[0])) / (2 * h)
        np.testing.assert_allclose(col, fd, atol=5e-3)


def test_sharded_fleet_windows():
    """MHE fleet estimation scales over the mesh: solve_window's QP runs
    through solve_batch_sharded with window parity vs the local solve."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tpu_gpad.parallel import solve_batch_sharded

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices (virtual CPU mesh)")
    est = MovingHorizonEstimator(
        A, B, C, window=5, W=W, V=V,
        w_min=np.full(2, -0.05), w_max=np.full(2, 0.05),
        x0=np.zeros(2), iterations=300,
    )
    rng = np.random.default_rng(9)
    Bn = 16
    xbar = rng.normal(0, 0.1, (Bn, 2)).astype(np.float32)
    Y = rng.normal(0, 0.1, (Bn, 5, 1)).astype(np.float32)
    U = rng.normal(0, 0.3, (Bn, 4, 1)).astype(np.float32)
    x_local, res_local = est.solve_window(xbar, Y, U)
    p = jnp.concatenate(
        [jnp.asarray(xbar), jnp.asarray(Y).reshape(Bn, -1),
         jnp.asarray(U).reshape(Bn, -1)], axis=1)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    res_sh = solve_batch_sharded(est.data, p, est.config, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(res_sh.z), np.asarray(res_local.z), atol=1e-5
    )
