"""Tube MPC under additive disturbances: constraint tightening in action.

A double-integrator cart parks as close as it can to a position wall
while position disturbances |w| <= w_max shove it every step. Nominal
MPC tracks the setpoint against the raw box and the kicks shove it
through the wall; the tube-tightened controller (Chisci margins + LQR
ancillary gain, ``tpu_gpad.tube_tightened_problem``) tracks the same
setpoint against per-stage shrunken boxes, settles a tube-width short,
and keeps the TRUE state inside the original constraints for every
admissible disturbance sequence.

Run:  python examples/tube_mpc.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import tpu_gpad
    from tpu_gpad import problems

    wall = 3.0
    prob = problems.double_integrator(
        horizon=10, x_limit=wall, u_limit=1.0, qu_weight=0.05
    )
    w_max = np.array([0.12, 0.0])  # position disturbance box
    K = tpu_gpad.lqr_gain(prob)
    tight = tpu_gpad.tube_tightened_problem(prob, w_max, K=K)
    data_t = tpu_gpad.dualize(tpu_gpad.condense(tight, tracking=True),
                              iterations=2000, paired="auto")
    data_n = tpu_gpad.dualize(tpu_gpad.condense(prob, tracking=True),
                              iterations=2000, paired="auto")
    x_ref = np.array([2.95, 0.0], dtype=np.float32)  # park NEAR the wall
    print("tightened stage-10 position bound:",
          f"{tight.x_max[-1][0]:.3f} (raw {wall})")

    rng = np.random.default_rng(3)
    W = w_max * rng.choice([-1.0, 1.0], size=(40, 2))  # vertex disturbances

    def run(data):
        x = np.array([0.0, 0.0])
        worst, traj = -np.inf, [x[0]]
        for t in range(40):
            p = np.concatenate([x.astype(np.float32), x_ref])
            res = tpu_gpad.solve_to_accuracy(
                data, p, tol=1e-5, max_iterations=2000
            )
            if not np.asarray(res.converged).all():
                break  # QP infeasible: this controller lost the game
            u = float(np.asarray(res.u[0])[0])
            x = prob.A @ x + prob.B[:, 0] * u + W[t]
            worst = max(worst, np.abs(x).max())
            traj.append(x[0])
        return worst, traj

    worst_t, traj_t = run(data_t)
    worst_n, traj_n = run(data_n)
    print(f"worst |x| over 40 disturbed samples: tube {worst_t:.3f}, "
          f"nominal {worst_n:.3f} (box {wall})")
    assert worst_t <= wall + 1e-6, "tube controller busted the box"
    verdict = ("VIOLATED the box" if worst_n > wall + 1e-6
               else "stayed inside this draw")
    print(f"tube controller respected the box everywhere; nominal {verdict}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 4))
        ax.plot(traj_t, label="tube MPC (tightened boxes)", lw=2)
        ax.plot(traj_n, label="nominal MPC", lw=2, ls="--")
        ax.axhline(wall, c="crimson", ls=":", label=f"wall ({wall})")
        ax.axhline(-wall, c="crimson", ls=":")
        ax.set_xlabel("closed-loop sample")
        ax.set_ylabel("position")
        ax.set_title("Position disturbances |w| <= 0.12: tube vs nominal MPC")
        ax.legend(loc="lower right")
        out = Path(__file__).resolve().parent.parent / "docs" / "figures"
        out.mkdir(parents=True, exist_ok=True)
        fig.savefig(out / "tube_mpc.png", dpi=110, bbox_inches="tight")
        print(f"figure: {out / 'tube_mpc.png'}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
