"""Per-stage reference preview (trajectory tracking) and input-reference
targets: p = [x0; r_1..r_N; u_ref?] — beyond the reference's
regulation-only scope (gpad.m drives SoC spreads to zero)."""

import numpy as np
import pytest

import tpu_gpad
from tpu_gpad import problems
from tpu_gpad.condense import prediction_matrices
from tpu_gpad.solver import SolverConfig
from tpu_gpad.solver.qp import solve_condensed_qp, solve_qp_exact


def test_preview_with_constant_refs_reduces_to_tracking():
    problem = problems.double_integrator(horizon=6)
    qp_t = tpu_gpad.condense(problem, tracking=True)
    qp_p = tpu_gpad.condense(problem, tracking="preview")
    assert qp_p.n_x == problem.n_x * (problem.horizon + 1)
    assert qp_p.name.endswith("_preview")
    x0 = np.array([3.0, -0.5])
    r = np.array([1.0, 0.2])
    z_t = solve_condensed_qp(qp_t, np.concatenate([x0, r])).z
    z_p = solve_condensed_qp(
        qp_p, np.concatenate([x0, np.tile(r, problem.horizon)])
    ).z
    np.testing.assert_allclose(z_p, z_t, atol=1e-10)


def test_preview_linear_term_matches_hand_built_qp():
    """The condensed linear cost for arbitrary per-stage refs equals the
    hand-expanded S' Qbar (T x0 - rbar), checked through the same exact
    active-set solver (constraints active in some trials)."""
    problem = problems.double_integrator(horizon=6)
    n_x, N = problem.n_x, problem.horizon
    qp_p = tpu_gpad.condense(problem, tracking="preview")
    T, S = prediction_matrices(problem.A, problem.B, N)
    Qbar = np.kron(np.eye(N), problem.Q)
    Rbar = np.kron(np.eye(N), problem.R)
    H = S.T @ Qbar @ S + Rbar
    rng = np.random.default_rng(1)
    for _ in range(5):
        x0 = rng.uniform(-3, 3, n_x)
        rbar = rng.uniform(-1, 1, n_x * N)
        p = np.concatenate([x0, rbar])
        sol = solve_condensed_qp(qp_p, p)
        f = S.T @ Qbar @ (T @ x0 - rbar)
        sol2 = solve_qp_exact(H, f, qp_p.G, qp_p.b0 + qp_p.E @ p)
        assert sol.status == sol2.status == "optimal"
        np.testing.assert_allclose(sol.z, sol2.z, atol=1e-8)


def test_preview_gpad_matches_exact():
    problem = problems.double_integrator(horizon=5)
    qp = tpu_gpad.condense(problem, tracking="preview")
    data = tpu_gpad.dualize(qp, iterations=300, paired="auto")
    rng = np.random.default_rng(2)
    B = 4
    P = np.concatenate(
        [
            rng.uniform(-3, 3, (B, problem.n_x)),
            rng.uniform(-1, 1, (B, problem.n_x * problem.horizon)),
        ],
        axis=1,
    ).astype(np.float32)
    res = tpu_gpad.solve_batch(
        data, P, config=SolverConfig(iterations=300, restart=True)
    )
    for i in range(B):
        sol = solve_condensed_qp(qp, P[i])
        if sol.status != "optimal":
            continue
        np.testing.assert_allclose(
            np.asarray(res.u[i]), sol.z[: qp.n_u], atol=5e-4
        )


def test_input_reference_shifts_steady_state_input():
    """With an input target u_r inside the (unconstrained-at-optimum)
    region, the optimizer's stationary point moves toward u_r."""
    problem = problems.double_integrator(horizon=6)
    n_x, n_u, N = problem.n_x, problem.n_u, problem.horizon
    qp = tpu_gpad.condense(problem, tracking=True, input_reference=True)
    assert qp.n_x == 2 * n_x + n_u
    assert "_uref" in qp.name
    T, S = prediction_matrices(problem.A, problem.B, N)
    Qbar = np.kron(np.eye(N), problem.Q)
    Rbar = np.kron(np.eye(N), problem.R)
    H = S.T @ Qbar @ S + Rbar
    x0 = np.array([0.5, 0.0])
    r = np.zeros(n_x)
    u_r = np.array([0.3])
    p = np.concatenate([x0, r, u_r])
    sol = solve_condensed_qp(qp, p)
    f = S.T @ Qbar @ T @ x0 - np.tile(problem.R @ u_r, N)
    sol2 = solve_qp_exact(H, f, qp.G, qp.b0 + qp.E @ p)
    assert sol.status == sol2.status == "optimal"
    np.testing.assert_allclose(sol.z, sol2.z, atol=1e-8)


def test_input_reference_requires_tracking():
    problem = problems.double_integrator(horizon=4)
    with pytest.raises(ValueError, match="tracking"):
        tpu_gpad.condense(problem, input_reference=True)
    with pytest.raises(ValueError, match="tracking"):
        tpu_gpad.condense(problem, tracking="previeww")


def test_preview_controller_tracks_moving_reference():
    """A controller that previews a ramp leads the reference; one that only
    sees the current setpoint lags it. Preview must give strictly smaller
    tracking error on a position ramp."""
    problem = problems.double_integrator(horizon=10)
    N, n_x = problem.horizon, problem.n_x
    T_sim = 60
    # position ramp 0 -> 3 over the run; velocity ref = slope
    slope = 3.0 / T_sim
    traj = np.stack(
        [slope * np.arange(T_sim + N + 1), np.full(T_sim + N + 1, slope)],
        axis=1,
    ).astype(np.float32)
    cfg = SolverConfig(iterations=80, restart=True)
    ctrl_prev = tpu_gpad.Controller(problem, tracking="preview", config=cfg)
    ctrl_track = tpu_gpad.Controller(problem, tracking=True, config=cfg)
    err_prev = err_track = 0.0
    xp = xt = np.zeros(n_x)
    for t in range(T_sim):
        up = ctrl_prev.step(
            xp.astype(np.float32), x_ref=traj[t + 1 : t + 1 + N]
        )
        ut = ctrl_track.step(xt.astype(np.float32), x_ref=traj[t])
        xp = problem.A @ xp + problem.B @ up.astype(np.float64)
        xt = problem.A @ xt + problem.B @ ut.astype(np.float64)
        err_prev += (xp[0] - traj[t + 1, 0]) ** 2
        err_track += (xt[0] - traj[t + 1, 0]) ** 2
    assert err_prev < 0.5 * err_track, (err_prev, err_track)


def test_simulate_preview_trajectory():
    """The jitted batch simulator follows a sinusoid reference with a
    receding preview window, holding the last row past trajectory end."""
    problem = problems.double_integrator(horizon=10)
    T_sim = 80
    ts = np.arange(T_sim + problem.horizon + 1, dtype=np.float64)
    pos = 1.5 * np.sin(2 * np.pi * ts / 60.0)
    vel = np.gradient(pos)
    traj = np.stack([pos, vel], axis=1).astype(np.float32)
    res = tpu_gpad.simulate(
        problem,
        np.zeros((1, 2), dtype=np.float32),
        n_steps=T_sim,
        x_ref=traj,
        preview=True,
        config=SolverConfig(iterations=80, restart=True),
        warm_start=True,
    )
    X = np.asarray(res.X)[:, 0, :]
    # steady tracking after the initial transient
    err = np.abs(X[20:T_sim, 0] - pos[20:T_sim])
    assert err.max() < 5e-2, err.max()


def test_simulate_preview_short_trajectory_holds_last():
    """x_ref shorter than the run: held at its final row (converges to a
    constant-setpoint endgame)."""
    problem = problems.double_integrator(horizon=8)
    traj = np.array([[2.0, 0.0]], dtype=np.float32)  # single row
    res = tpu_gpad.simulate(
        problem,
        np.zeros(2, dtype=np.float32),
        n_steps=50,
        x_ref=traj,
        preview=True,
        config=SolverConfig(iterations=80, restart=True),
    )
    X = np.asarray(res.X)[:, 0, :]
    assert np.abs(X[-1] - np.array([2.0, 0.0])).max() < 2e-2


def test_preview_controller_batched():
    problem = problems.double_integrator(horizon=5)
    ctrl = tpu_gpad.Controller(problem, tracking="preview", iterations=40)
    X = np.zeros((3, 2), dtype=np.float32)
    refs = np.zeros((3, 5, 2), dtype=np.float32)
    refs[:, :, 0] = np.array([1.0, -1.0, 0.5])[:, None]
    U = ctrl.step(X, x_ref=refs)
    assert U.shape == (3, 1)
    assert U[0, 0] > 0 and U[1, 0] < 0
