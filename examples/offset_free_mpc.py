"""Offset-free MPC from output measurements (the estimator layer).

A double-integrator cart with an UNKNOWN constant actuator bias: the
plant applies ``u + d_true`` but the controller only sees the measured
position ``y = [1 0] x``. A certainty-equivalence tracking controller is
left with a permanent steady-state offset; the offset-free controller
(disturbance-augmented Kalman filter + steady-state target calculation +
disturbance-aware predictions) identifies the bias and lands exactly on
the setpoint.

Run:  python examples/offset_free_mpc.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import tpu_gpad
    from tpu_gpad import problems
    from tpu_gpad.solver import SolverConfig

    problem = problems.double_integrator(horizon=10)
    C = np.array([[1.0, 0.0]])  # only position is measured
    d_true = 0.08  # actuator bias the controller does not know about
    r = np.array([1.5])  # position setpoint
    cfg = SolverConfig(iterations=80, restart=True)

    off = tpu_gpad.OffsetFreeController(problem, C, disturbance="input", config=cfg)
    plain = tpu_gpad.Controller(problem, tracking=True, config=cfg)

    x_off = np.zeros(2)
    x_plain = np.zeros(2)
    print(f"{'t':>3} {'y_offset_free':>14} {'y_plain':>10} {'d_hat':>8}")
    for t in range(120):
        # offset-free: measurement in, move out
        u = off.step(C @ x_off, r)
        x_off = problem.A @ x_off + problem.B @ (u.astype(np.float64) + d_true)
        # certainty-equivalence baseline (even given the TRUE state)
        u2 = plain.step(
            x_plain.astype(np.float32), x_ref=np.array([r[0], 0.0], np.float32)
        )
        x_plain = problem.A @ x_plain + problem.B @ (u2.astype(np.float64) + d_true)
        if t % 15 == 0 or t == 119:
            print(
                f"{t:>3} {x_off[0]:14.5f} {x_plain[0]:10.5f} {off.d_hat[0]:8.5f}"
            )
    err_off = abs(x_off[0] - r[0])
    err_plain = abs(x_plain[0] - r[0])
    print(f"\nfinal offset: offset-free {err_off:.2e}, plain {err_plain:.2e}")
    print(f"identified disturbance d_hat = {off.d_hat[0]:.5f} (true {d_true})")
    assert err_off < 1e-3 and err_plain > 5e-3


if __name__ == "__main__":
    main()
