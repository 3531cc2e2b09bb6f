"""Differentiable MPC: gradient descent THROUGH the solver.

A finite-horizon tracking controller with a tight input budget
(double integrator, N=6, |u| <= 0.5) is asked to park at -1. Feeding
the target straight in as the reference misses by ~0.3: the quadratic
tracking cost trades terminal accuracy against input effort, and the
saturated actuator can't make it up inside the horizon. Classic fix:
shape the REFERENCE, not the controller.

``tpu_gpad.diff.make_differentiable_solver`` makes that an
optimization problem: u*(p) is differentiable via one implicit-KKT
adjoint solve per backward pass (never an unrolled iteration tape), so
Adam can tune the reference r against the true objective — the terminal
state of the rolled-out closed-form plan — straight through the
constrained solve. 200 steps later the same controller lands within
1e-3 of the target.

The second block checks the other `diff` surface: `feedback_gain`
(the exact piecewise-affine explicit-MPC gain of the current active
set) against finite differences of the solver itself.

Run:  python examples/differentiable_mpc.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    import tpu_gpad
    from tpu_gpad import diff, problems
    from tpu_gpad.solver import SolverConfig, solve_batch

    prob = problems.double_integrator(horizon=6, u_limit=0.5, qu_weight=2.0)
    qp = tpu_gpad.condense(prob, tracking=True)  # parameter p = [x0; r]
    data = tpu_gpad.dualize(qp, iterations=300, paired="auto")
    cfg = SolverConfig(iterations=200, restart=True)
    solve_traj = diff.make_differentiable_solver(
        data, cfg, full_trajectory=True
    )
    A = jnp.asarray(prob.A, jnp.float32)
    B = jnp.asarray(prob.B, jnp.float32)
    x0 = jnp.asarray([3.0, 0.0], jnp.float32)
    target = jnp.asarray([-1.0, 0.0], jnp.float32)

    def terminal_miss_sq(r):
        z = solve_traj(jnp.concatenate([x0, r])[None])[0]
        u_seq = z.reshape(prob.horizon, prob.n_u)
        x = x0
        for k in range(prob.horizon):
            x = A @ x + B @ u_seq[k]
        return jnp.sum((x - target) ** 2)

    val_grad = jax.jit(jax.value_and_grad(terminal_miss_sq))

    miss_naive = float(jnp.sqrt(val_grad(target)[0]))
    print(f"reference = target:      terminal miss {miss_naive:.3f}")

    opt = optax.adam(0.1)
    r = target
    state = opt.init(r)
    best, best_r = np.inf, r
    for _ in range(200):
        loss, grad = val_grad(r)
        if float(loss) < best:
            best, best_r = float(loss), r
        updates, state = opt.update(grad, state)
        r = optax.apply_updates(r, updates)
    miss_opt = float(np.sqrt(best))
    print(
        f"optimized reference:     terminal miss {miss_opt:.2e}"
        f"   (r = {np.asarray(best_r).round(3)})"
    )
    assert miss_naive > 0.25, miss_naive
    assert miss_opt < 1e-3, miss_opt

    # --- feedback_gain vs finite differences of the solver itself -------
    # (an unsaturated state: at saturation the local gain is exactly 0,
    # which is correct but uninformative to print)
    x_mild = jnp.asarray([0.3, 0.0], jnp.float32)
    p = jnp.concatenate([x_mild, target])[None]
    res = solve_batch(data, p, config=cfg)
    K = diff.feedback_gain(data, res)[0]  # (n_u, n_p): du0*/d[x0; r]
    h = 1e-3
    for j in range(2):  # the two x0 coordinates
        e = jnp.zeros_like(p).at[0, j].set(h)
        fd = (
            solve_batch(data, p + e, config=cfg).u[0]
            - solve_batch(data, p - e, config=cfg).u[0]
        ) / (2 * h)
        err = float(jnp.abs(fd - K[:, j]).max())
        assert err < 5e-3, (j, err)
    print(f"feedback gain du0/dx0 = {np.asarray(K[:, :2]).round(4)}  "
          "(matches solver finite differences)")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        for label, rr in (("r = target", target), ("r optimized", best_r)):
            z = solve_traj(jnp.concatenate([x0, rr])[None])[0]
            u_seq = np.asarray(z).reshape(prob.horizon, prob.n_u)
            xs = [np.asarray(x0)]
            for k in range(prob.horizon):
                xs.append(np.asarray(A) @ xs[-1] + np.asarray(B) @ u_seq[k])
            ax.plot([s[0] for s in xs], marker="o", label=label)
        ax.axhline(float(target[0]), ls="--", c="gray", label="target")
        ax.set_xlabel("step")
        ax.set_ylabel("position")
        ax.legend()
        fig.tight_layout()
        out = Path(__file__).resolve().parent.parent / (
            "docs/figures/differentiable_mpc.png"
        )
        fig.savefig(out, dpi=110)
        print(f"wrote {out}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
