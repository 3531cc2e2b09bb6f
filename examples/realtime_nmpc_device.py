"""Real-time NMPC entirely on device: one call per trajectory.

The pendulum swing-up from ``nonlinear_pendulum.py``, three ways:

1. host-condensed NMPC (float64 condensation per sample — the baseline),
2. ``device_condense=True`` (each SQP pass is one fused device program),
3. ``simulate_nonlinear_device`` (the ENTIRE closed loop as one
   ``lax.scan`` device call).

All three land the pendulum on the upright equilibrium; the point is the
wall-clock ladder printed at the end.

Run:  python examples/realtime_nmpc_device.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax.numpy as jnp

    from tpu_gpad.nonlinear import (
        NMPC, rk4, simulate_nonlinear, simulate_nonlinear_device,
    )

    def f_cont(x, u):
        th, om = x
        return jnp.array([om, 9.81 * jnp.sin(th) - 0.1 * om + u[0]])

    def make(device):
        return NMPC(
            rk4(f_cont, 0.05), n_x=2, n_u=1, horizon=12,
            Q=np.diag([10.0, 1.0]), R=0.1 * np.eye(1),
            x_min=np.array([-10.0, -12.0]), x_max=np.array([10.0, 12.0]),
            u_min=np.array([-11.0]), u_max=np.array([11.0]),
            iterations=150, sqp_iters=1, device_condense=device,
        )

    ref = np.array([np.pi, 0.0], dtype=np.float32)
    x0 = np.array([2.2, 0.0], dtype=np.float32)
    n = 80
    rows = []

    # Build each controller ONCE and reuse it for the warm and timed runs:
    # rollout/linearize are jit-cached on the dynamics closure and the
    # device pass on the NMPC instance, so a fresh instance per run would
    # re-compile inside the timed region and measure compilation instead.
    host_c = make(False)
    dev_c = make(True)
    scan_c = make(True)
    for label, ctrl, runner in (
        ("host condensation", host_c, lambda c: simulate_nonlinear(
            c.f, c, x0, n, x_ref=ref)),
        ("device condensation", dev_c, lambda c: simulate_nonlinear(
            c.f, c, x0, n, x_ref=ref)),
        ("fused scan (one call)", scan_c, lambda c: simulate_nonlinear_device(
            c.f, c, x0, n, x_ref=ref)),
    ):
        runner(ctrl)  # compile/warm
        ctrl.reset()
        t0 = time.perf_counter()
        X, U = runner(ctrl)
        dt = time.perf_counter() - t0
        err = abs(X[-1, 0] - np.pi)
        rows.append((label, dt, err))
        assert err < 0.05, (label, err)

    print(f"{'path':>24} {'total':>9} {'per sample':>12} {'theta err':>10}")
    for label, dt, err in rows:
        print(f"{label:>24} {dt:8.2f}s {dt/n*1e3:9.1f} ms {err:10.4f}")
    print(f"\nspeedup over host condensation: "
          f"{rows[0][1]/rows[1][1]:.1f}x (per-sample device), "
          f"{rows[0][1]/rows[2][1]:.1f}x (fused scan)")


if __name__ == "__main__":
    main()
