"""Battery balancing end-to-end: the reference project's flagship problem.

Reproduces the reference's workflow (``Code/MATLAB/gpad.m``): build the
series-cell balancing problem, run the closed loop, plot SoC/current
trajectories — then goes where the reference can't: solve 4096 randomized
initial-state scenarios in one batched call on the accelerator.

Run:  python examples/battery_balancing.py [--plot traj.png]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--plot", help="write trajectory plot to this png")
    parser.add_argument("--steps", type=int, default=500)
    args = parser.parse_args()

    import jax.numpy as jnp

    import tpu_gpad
    from tpu_gpad import problems
    from tpu_gpad.solver import SolverConfig
    from tpu_gpad.closed_loop import plot_closed_loop

    problem = problems.battery(n_cells=3, horizon=10)

    # --- one solve ---------------------------------------------------------
    qp = tpu_gpad.condense(problem)
    data = tpu_gpad.dualize(qp, iterations=100, paired="auto")
    x0 = problems.battery_default_x0(3, seed=0)
    res = tpu_gpad.solve(data, jnp.asarray(x0, dtype=jnp.float32))
    print(f"x0 = {x0}")
    print(f"u* = {np.asarray(res.u[0])}  (balancing currents, sum ~ 0)")

    # --- 4096 scenarios, one batched call ----------------------------------
    rng = np.random.default_rng(0)
    X0 = rng.uniform(-0.4, 0.4, size=(4096, 3)).astype(np.float32)
    batch = tpu_gpad.solve_batch(data, jnp.asarray(X0))
    print(f"batched: {batch.u.shape[0]} scenarios, "
          f"max residual {float(np.max(np.asarray(batch.residual))):.2e}")

    # --- closed loop (the gpad.m 1000-sample loop) --------------------------
    sim = tpu_gpad.simulate(
        problem, x0, n_steps=args.steps, iterations=60,
        config=SolverConfig(iterations=60, restart=True), warm_start=True,
    )
    X = np.asarray(sim.X)
    print(f"closed loop: SoC spread {np.ptp(X[0]):.3f} -> {np.ptp(X[-1]):.3f} "
          f"after {args.steps} samples")
    if args.plot:
        plot_closed_loop(sim, path=args.plot)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
