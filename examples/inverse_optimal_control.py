"""Inverse optimal control: recover the MPC's cost weights from
demonstrations, by gradient descent through condenser AND solver.

An expert controller (known dynamics, UNKNOWN stage cost Q) demonstrates
its first move at 32 random states — most of them actuator-saturated.
`diff.make_data_differentiable_solver` makes the whole pipeline

    q  ->  dualize_ltv_device(A, B, Q=diag(q), R)  ->  GPAD solve  ->  u*

one differentiable JAX program (the condenser takes traced weights; the
solve's backward pass is a single implicit-KKT adjoint), so plain Adam on
the imitation loss ||u(q) - u_expert||^2 identifies the weights. R is
held fixed — it pins the scale that makes Q identifiable (u* only sees
cost RATIOS).

Run:  python examples/inverse_optimal_control.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tpu_gpad import diff
    from tpu_gpad.device_condense import dualize_ltv_device
    from tpu_gpad.solver import SolverConfig

    n, nu, N = 2, 1, 8
    A = np.stack([np.array([[1.0, 0.1], [0.0, 0.95]])] * N)
    B = np.stack([np.array([[0.005], [0.1]])] * N)
    Aj = jnp.asarray(A, jnp.float32)
    Bj = jnp.asarray(B, jnp.float32)
    cj = jnp.zeros((N, n), jnp.float32)
    rng = np.random.default_rng(3)
    X0 = rng.uniform(-1.5, 1.5, (32, n)).astype(np.float32)
    P = jnp.asarray(np.concatenate([X0, np.zeros_like(X0)], axis=1))
    cfg = SolverConfig(iterations=250, restart=True, form="mvp")
    f = diff.make_data_differentiable_solver(cfg)

    def controller(q_diag):
        data = dualize_ltv_device(
            Aj, Bj, cj, jnp.diag(q_diag), 0.4 * np.eye(nu),
            np.full(nu, -0.5), np.full(nu, 0.5), iterations=300,
        )
        return f(data, P)

    q_true = jnp.asarray([3.0, 0.3], jnp.float32)
    u_expert = controller(q_true)
    n_sat = int((jnp.abs(u_expert) > 0.499).sum())
    print(f"expert demos: 32 states, {n_sat} saturated moves")

    def loss(log_q):
        return jnp.mean((controller(jnp.exp(log_q)) - u_expert) ** 2)

    val_grad = jax.jit(jax.value_and_grad(loss))
    log_q = jnp.zeros(2)  # start at Q = I
    opt = optax.adam(0.1)
    state = opt.init(log_q)
    for i in range(200):
        l, g = val_grad(log_q)
        updates, state = opt.update(g, state)
        log_q = optax.apply_updates(log_q, updates)
    q_rec = np.exp(np.asarray(log_q))
    final = float(loss(log_q))
    print(f"recovered Q diag: {q_rec.round(3)}   (true {np.asarray(q_true)})")
    print(f"imitation loss: {final:.2e}")
    rel = np.abs(q_rec - np.asarray(q_true)) / np.asarray(q_true)
    assert rel.max() < 0.1, rel
    assert final < 1e-4, final


if __name__ == "__main__":
    main()
