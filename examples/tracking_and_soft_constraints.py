"""Production-MPC features beyond the reference: tracking + soft boxes.

A double-integrator cart must move to a setpoint; its measured state
starts OUTSIDE the hard position box (sensor glitch / disturbance), which
would make a hard-constrained QP infeasible. Soft state constraints keep
every solve well-posed and the tracking cost drives the cart to target.

Run:  python examples/tracking_and_soft_constraints.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import tpu_gpad
    from tpu_gpad import problems
    from tpu_gpad.solver import SolverConfig

    problem = problems.double_integrator(horizon=12, x_limit=5.0)
    ctrl = tpu_gpad.Controller(
        problem,
        tracking=True,
        soft_state=1e3,
        config=SolverConfig(iterations=80, restart=True),
        polish=True,  # exact optimum each step via the host KKT solve
    )
    target = np.array([3.0, 0.0], dtype=np.float32)
    x = np.array([7.0, 0.0])  # outside the |pos| <= 5 hard box!
    print(f"{'t':>3} {'pos':>8} {'vel':>8} {'u':>8}")
    for t in range(30):
        u = ctrl.step(x.astype(np.float32), x_ref=target)
        print(f"{t:>3} {x[0]:8.3f} {x[1]:8.3f} {u[0]:8.3f}")
        x = problem.A @ x + problem.B @ u.astype(np.float64)
    err = np.abs(x - target.astype(np.float64)).max()
    print(f"final |x - target| = {err:.2e}")
    assert err < 0.05


if __name__ == "__main__":
    main()
