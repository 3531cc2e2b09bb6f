"""Multi-scenario robust MPC: one shared move for an uncertain plant.

A double-integrator cart whose actuator gain is only known to within
[0.6, 1.4]x must park at position 9.2, one cart-length short of a wall at
10. Nominal MPC plans the approach assuming the nominal gain — its braking
plan rides the wall constraint, so when the true actuator is 40% WEAKER
the brakes underdeliver and the cart busts the wall. Scenario MPC
optimizes ONE first move whose predicted trajectories satisfy the wall
under EVERY gain realization (shared first move, per-scenario tails — the
non-anticipativity formulation), so it approaches at a speed the weakest
brakes can still stop.

Run:  python examples/robust_scenario_mpc.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import tpu_gpad
    from tpu_gpad import problems

    wall, target = 10.0, 9.2
    nominal = problems.double_integrator(
        horizon=12, x_limit=wall, u_limit=1.0, qu_weight=0.05
    )
    scales = [0.6, 1.0, 1.4]  # actuator gain realizations
    variants = tpu_gpad.scenario_problem_variants(
        nominal, B_list=[nominal.B * s for s in scales]
    )
    qp_rob = tpu_gpad.scenario_qp(
        [tpu_gpad.condense(p, tracking=True) for p in variants]
    )
    data_rob = tpu_gpad.dualize(qp_rob, iterations=4000, paired="auto")
    data_nom = tpu_gpad.dualize(
        tpu_gpad.condense(nominal, tracking=True), iterations=4000,
        paired="auto",
    )

    true_plant = variants[0]  # adversary: the WEAKEST actuator/brakes
    x_ref = np.array([target, 0.0])

    def run(data):
        x = np.array([0.0, 0.0])
        peak, traj = -np.inf, []
        for _ in range(40):
            p = np.concatenate([x, x_ref]).astype(np.float32)
            res = tpu_gpad.solve_to_accuracy(data, p, tol=1e-6,
                                             max_iterations=4000)
            u = float(np.asarray(res.u[0])[0])
            x = true_plant.A @ x + true_plant.B[:, 0] * u
            peak = max(peak, x[0])
            traj.append(x[0])
            if x[0] > wall + 0.5:  # busted: QP turns infeasible, stop here
                break
        return peak, traj

    peak_rob, traj_rob = run(data_rob)
    peak_nom, traj_nom = run(data_nom)

    print(f"{'t':>3} {'pos robust':>11} {'pos nominal':>12}")
    for t in range(0, max(len(traj_rob), len(traj_nom)), 4):
        pr = f"{traj_rob[t]:11.4f}" if t < len(traj_rob) else " " * 11
        pn = f"{traj_nom[t]:12.4f}" if t < len(traj_nom) else " " * 12
        print(f"{t:>3} {pr} {pn}")
    print(f"\nwall at {wall}, target {target}; "
          f"peak position: robust {peak_rob:.4f}, nominal {peak_nom:.4f}")
    assert peak_rob <= wall + 1e-2, "robust controller busted the wall"
    assert peak_nom > peak_rob, (
        "nominal should cut closer to the wall than robust"
    )
    verdict = "BUSTED the wall" if peak_nom > wall + 1e-2 else "cut it closer"
    print(f"robust braked in time for the weakest actuator; nominal {verdict}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 4))
        ax.plot(traj_rob, label="scenario MPC (robust)", lw=2)
        ax.plot(traj_nom, label="nominal MPC", lw=2, ls="--")
        ax.axhline(wall, c="crimson", ls=":", label=f"wall ({wall})")
        ax.axhline(target, c="gray", ls=":", label=f"target ({target})")
        ax.set_xlabel("closed-loop sample")
        ax.set_ylabel("position")
        ax.set_title(
            "Uncertain actuator (gain 0.6-1.4x): shared-first-move scenario "
            "MPC vs nominal"
        )
        ax.legend(loc="lower right")
        out = Path(__file__).resolve().parent.parent / "docs" / "figures"
        out.mkdir(parents=True, exist_ok=True)
        fig.savefig(out / "robust_scenario.png", dpi=110, bbox_inches="tight")
        print(f"figure: {out / 'robust_scenario.png'}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
