"""Big-state long-window MHE A/B: does the backstop route actually pay?

MHE_STAGEWISE.json so far holds the small-state NEGATIVE ((n+p)=4,
T=180: condensed 21x — the reason MHE auto routes on the memory
backstop only). This tool adds the datapoint the backstop routes FOR:
an n_x=30 plant at T=150, where the projected condensed operands
(~2*(4*T*n)*(T*n)*4 bytes ~ 648 MB) are past the 256 MB
AUTO_STAGEWISE_ABOVE_MB rule, so `MovingHorizonEstimator(engine="auto")`
builds stage-wise. The open question this measures: the runtime
q_lin/c parameters (measurements / known inputs) ride the XLA scan
executors — the fused kernels decline runtime params — so the
stage-wise side here is the SLOWEST stage-wise executor. If condensed
(HBM-feasible at this size, just big) still wins, the backstop
threshold is mis-set and should move toward actual HBM/build
feasibility; if stage-wise wins, the gate is confirmed where it
routes. Either way the result is committed.

Run on the real chip:  python tools/bench_mhe_stagewise.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="MHE_STAGEWISE.json")
    ap.add_argument("--n-x", type=int, default=30)
    ap.add_argument("--n-u", type=int, default=8)
    ap.add_argument("--n-y", type=int, default=15)
    ap.add_argument("--window", type=int, default=150)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iterations", type=int, default=200)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="host smoke run (no artifact write)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu_gpad.mhe import MovingHorizonEstimator
    from tpu_gpad.solver import solve_batch
    from tpu_gpad.stagewise import AUTO_STAGEWISE_ABOVE_MB, solve_stagewise
    from tpu_gpad.utils import interleaved_ab

    n, p, q, T, B = args.n_x, args.n_u, args.n_y, args.window, args.batch
    rng = np.random.default_rng(7)
    A = rng.normal(0, 1.0, (n, n)) / np.sqrt(n)
    A *= 0.92 / max(abs(np.linalg.eigvals(A)))
    Bm = rng.normal(0, 0.3, (n, p))
    C = rng.normal(0, 1.0, (q, n)) / np.sqrt(n)
    kw = dict(
        W=np.eye(n) * 1e-2, V=np.eye(q) * 1e-2,
        x_min=-4.0 * np.ones(n), x_max=4.0 * np.ones(n),
        w_min=-0.4 * np.ones(n), w_max=0.4 * np.ones(n),
        iterations=args.iterations,
    )
    mb = 2 * (4 * T * n) * (T * n) * 4 / 1e6

    t0 = time.perf_counter()
    est_s = MovingHorizonEstimator(A, Bm, C, T, engine="stagewise", **kw)
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    est_c = MovingHorizonEstimator(A, Bm, C, T, engine="condensed", **kw)
    build_c = time.perf_counter() - t0
    auto_engine = (
        "stagewise" if mb > AUTO_STAGEWISE_ABOVE_MB else "condensed")

    # simulate B measurement windows from the true plant
    X = rng.uniform(-0.5, 0.5, (B, n))
    U = rng.uniform(-0.5, 0.5, (B, T - 1, p)).astype(np.float32)
    Ys = []
    x = X.copy()
    for k in range(T):
        Ys.append(x @ C.T + rng.normal(0, 0.05, (B, q)))
        if k < T - 1:
            w = np.clip(rng.normal(0, 0.05, (B, n)), -0.4, 0.4)
            x = x @ A.T + U[:, k] @ Bm.T + w
    Y = np.stack(Ys, axis=1).astype(np.float32)
    x_bar = (X + rng.normal(0, 0.1, (B, n))).astype(np.float32)

    # parity of the two window solves on a sub-batch (fp32 cross-engine)
    xh_s, _ = est_s.solve_window(x_bar[:8], Y[:8], U[:8])
    xh_c, _ = est_c.solve_window(x_bar[:8], Y[:8], U[:8])
    err = float(np.abs(np.asarray(xh_s) - np.asarray(xh_c)).max())
    scale = float(np.abs(np.asarray(xh_c)).max())

    # timed cores: the device window solves only (the host x_hat
    # recovery is shared bookkeeping), jitted once, operands as args
    st = est_s.structure
    q_lin = -jnp.einsum(
        "xy,bty->btx", jnp.asarray(st.CtVinv, jnp.float32),
        jnp.asarray(Y))
    cb = jnp.zeros((B, T, n), jnp.float32)
    cb = cb.at[:, 1:].set(jnp.einsum(
        "xz,btz->btx", jnp.asarray(st.B, jnp.float32), jnp.asarray(U)))
    xb = jnp.asarray(x_bar)
    j_s = jax.jit(lambda d, x0, ql, c: solve_stagewise(
        d, x0, q_lin=ql, c=c, config=est_s.config).z)
    pvec = jnp.concatenate(
        [xb, jnp.asarray(Y).reshape(B, -1), jnp.asarray(U).reshape(B, -1)],
        axis=1)
    j_c = jax.jit(lambda d, pv: solve_batch(d, pv, config=est_c.config).z)

    ab = interleaved_ab(
        lambda: j_s(st.data, xb, q_lin, cb),
        lambda: j_c(est_c.data, pvec),
        rounds=args.rounds, k_large=4, iqr_rel_target=0.1,
        autoscale_max_s=180.0,
    )
    row = {
        "what": "big-state long-window MHE: the memory-backstop route "
                "(auto=stagewise) A/B'd against the condensed window QP",
        "n_x": n, "n_u": p, "n_y": q, "window": T, "batch": B,
        "iterations": args.iterations,
        "projected_condensed_mb": mb,
        "backstop_mb": AUTO_STAGEWISE_ABOVE_MB,
        "auto_engine": auto_engine,
        "stagewise_executor": "xla (runtime q_lin/c declines the fused "
                              "kernels)",
        "x_hat_parity_err": err,
        "x_hat_scale": scale,
        "build_s": {"stagewise": build_s, "condensed": build_c},
        "condensed_n_z": int(est_c.structure.qp.H.shape[0]),
        "condensed_m": int(est_c.structure.qp.G.shape[0]),
        "stagewise_windows_per_sec": B / ab["t_a_median_s"],
        "condensed_windows_per_sec": B / ab["t_b_median_s"],
        "speedup_stagewise_over_condensed": ab["ratio_b_over_a_median"],
        "iqr": ab["ratio_b_over_a_iqr"],
        "rejected_rounds": ab["rejected_rounds"],
        "unstable": ab["unstable"],
    }
    print(json.dumps(row, indent=1), flush=True)

    if not args.cpu:
        out = (
            json.loads(Path(args.out).read_text())
            if Path(args.out).exists()
            else {}
        )
        out.setdefault("bigstate_rows", [])
        # migrate the original single-row field into the list once
        if "bigstate_row" in out:
            out["bigstate_rows"].append(out.pop("bigstate_row"))
        out["bigstate_rows"].append(row)
        Path(args.out).write_text(json.dumps(out, indent=1))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
