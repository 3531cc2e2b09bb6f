"""Serving-style embedded MPC: the stateful Controller interface.

One Controller per plant; each control period calls ``step(x)`` and applies
the returned move. Warm starting + adaptive restart make a 40-iteration
budget track the exact QP optimum.

Run:  python examples/embedded_controller.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import tpu_gpad
    from tpu_gpad import problems
    from tpu_gpad.solver import SolverConfig
    from tpu_gpad.solver.qp import solve_condensed_qp

    problem = problems.random_lti(n_x=3, n_u=2, horizon=8, seed=1, rho=0.9)
    qp = tpu_gpad.condense(problem)
    ctrl = tpu_gpad.Controller(
        problem, config=SolverConfig(iterations=40, restart=True)
    )

    x = np.array([2.0, -1.0, 1.5])
    print(f"{'t':>3} {'|x|':>8} {'u':>24} {'err vs exact QP':>16}")
    for t in range(15):
        u = ctrl.step(x.astype(np.float32))
        exact = solve_condensed_qp(qp, x).z[: qp.n_u]
        err = np.abs(u - exact).max()
        print(f"{t:>3} {np.linalg.norm(x):8.4f} {np.array2string(u, precision=3):>24} {err:16.2e}")
        x = problem.A @ x + problem.B @ u.astype(np.float64)


if __name__ == "__main__":
    main()
