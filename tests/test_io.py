import numpy as np

import jax.numpy as jnp

from tpu_gpad import problems
from tpu_gpad.condense import condense, dualize, lipschitz_constant
from tpu_gpad.io import (
    SolverDataset,
    read_solver_dataset,
    write_solver_dataset,
    save_gpad_data,
    load_gpad_data,
)
from tpu_gpad.problems.battery import default_x0
from tpu_gpad.schedule import momentum_schedule
from tpu_gpad.solver.reference import gpad_solve


def make_dataset(n=3, N=4, iters=100):
    qp = condense(problems.battery(n_cells=n, horizon=N))
    x0 = default_x0(n, seed=1)
    L = lipschitz_constant(qp)
    f = qp.F.T @ x0
    b = qp.b0 + qp.E @ x0
    theta, beta = momentum_schedule(iters)
    return qp, x0, SolverDataset(
        n_u=n, N=N, m=qp.m, num_iterations=iters, L=L,
        M_G=np.linalg.solve(qp.H, qp.G.T).astype(np.float32),
        g_P=np.linalg.solve(qp.H, f).astype(np.float32),
        G_L=(qp.G / L).astype(np.float32),
        p_D=(-b / L).astype(np.float32),
        theta=theta, beta=beta,
    )


def test_solver_dataset_roundtrip(tmp_path):
    """Write in the reference main.cu:29-67 format (pre-negated M_G), read
    back, and check the solve is unchanged."""
    _, _, ds = make_dataset()
    path = tmp_path / "input_1.txt"
    write_solver_dataset(path, ds, negated_mg=True)
    back = read_solver_dataset(path, negated_mg=True)
    assert (back.n_u, back.N, back.m, back.num_iterations) == (ds.n_u, ds.N, ds.m, ds.num_iterations)
    np.testing.assert_allclose(back.M_G, ds.M_G, atol=1e-7)
    np.testing.assert_allclose(back.G_L, ds.G_L, atol=1e-7)
    r1 = gpad_solve(ds.M_G, ds.g_P, ds.G_L, ds.p_D, ds.n_u, iterations=100,
                    theta=ds.theta, beta=ds.beta)
    r2 = gpad_solve(back.M_G, back.g_P, back.G_L, back.p_D, back.n_u, iterations=100,
                    theta=back.theta, beta=back.beta)
    np.testing.assert_allclose(r1.u, r2.u, atol=1e-5)


def test_cuda_sign_convention(tmp_path):
    """A dataset read WITHOUT un-negating reproduces the CUDA kernel's
    zhat = +M_G w - g_P behavior (kernel_functions.cu:62)."""
    _, _, ds = make_dataset()
    path = tmp_path / "input_2.txt"
    write_solver_dataset(path, ds, negated_mg=True)
    raw = read_solver_dataset(path, negated_mg=False)  # file's literal contents
    r_canon = gpad_solve(ds.M_G, ds.g_P, ds.G_L, ds.p_D, ds.n_u, iterations=50,
                         theta=ds.theta, beta=ds.beta)
    r_cuda = gpad_solve(raw.M_G, raw.g_P, raw.G_L, raw.p_D, raw.n_u, iterations=50,
                        theta=raw.theta, beta=raw.beta, negated_mg=True)
    np.testing.assert_allclose(r_canon.u, r_cuda.u, atol=1e-5)


def test_gpad_data_npz_roundtrip(tmp_path):
    qp = condense(problems.battery(3, 4))
    data = dualize(qp, iterations=100)
    path = tmp_path / "battery.npz"
    save_gpad_data(path, data)
    back = load_gpad_data(path)
    assert back.n_u == data.n_u and back.horizon == data.horizon and back.name == data.name
    np.testing.assert_allclose(np.asarray(back.MG_T), np.asarray(data.MG_T))
    from tpu_gpad.solver import solve

    x0 = jnp.asarray(default_x0(3, seed=1), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(solve(back, x0).u), np.asarray(solve(data, x0).u), atol=1e-7
    )
