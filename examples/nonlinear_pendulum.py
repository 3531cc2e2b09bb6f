"""Nonlinear MPC: pendulum swing to the upright equilibrium.

Successive-linearization NMPC (``tpu_gpad.nonlinear``) drives a damped,
torque-limited pendulum from 61 degrees below the top to the UPRIGHT
(unstable) equilibrium. Per sample the controller rolls its nominal plan
forward, linearizes the dynamics along it with ``jax.vmap(jax.jacfwd)``,
condenses the resulting affine-LTV QP and solves it with the GPAD
engines — an LTI controller linearized once at the start cannot do this
(its model thinks gravity is a constant spring).

Run:  python examples/nonlinear_pendulum.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    from tpu_gpad.nonlinear import NMPC, rk4, simulate_nonlinear
    from tpu_gpad.problems.pendulum import UPRIGHT, pendulum_dynamics

    dt = 0.05
    f = rk4(pendulum_dynamics(), dt=dt)
    ctrl = NMPC(
        f,
        n_x=2,
        n_u=1,
        horizon=25,
        Q=np.diag([10.0, 1.0]),
        R=np.diag([0.1]),
        u_min=np.array([-11.0]),
        u_max=np.array([11.0]),
        iterations=200,
        sqp_iters=2,
    )
    x0 = np.array([2.07, 0.0])
    X, U = simulate_nonlinear(f, ctrl, x0, n_steps=80, x_ref=UPRIGHT)

    print(f"start:   theta = {x0[0]:.3f} rad ({np.degrees(x0[0]):.0f} deg)")
    print(f"target:  theta = {np.pi:.3f} rad (upright, unstable)")
    print(f"final:   theta = {X[-1, 0]:.4f} rad, omega = {X[-1, 1]:.4f}")
    print(f"|u| max: {np.abs(U).max():.2f} (limit 11.0)")
    settle = next(
        (
            t
            for t in range(len(X))
            if np.all(np.abs(X[t:, 0] - np.pi) < 0.02)
        ),
        None,
    )
    print(f"settled within 0.02 rad at sample {settle} of {len(U)}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax0, ax1) = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
        t = np.arange(len(X)) * dt
        ax0.plot(t, X[:, 0], label="theta")
        ax0.axhline(np.pi, ls="--", c="gray", label="upright")
        ax0.set_ylabel("angle [rad]")
        ax0.legend()
        ax0.set_title("NMPC pendulum swing to upright")
        ax1.step(t[:-1], U[:, 0], where="post")
        ax1.axhline(11.0, ls="--", c="gray")
        ax1.axhline(-11.0, ls="--", c="gray")
        ax1.set_ylabel("torque")
        ax1.set_xlabel("time [s]")
        out = Path(__file__).resolve().parent.parent / "docs" / "figures"
        out.mkdir(parents=True, exist_ok=True)
        fig.savefig(out / "nmpc_pendulum.png", dpi=110, bbox_inches="tight")
        print(f"figure: {out / 'nmpc_pendulum.png'}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
