"""Round-5 stage-wise chip evidence (VERDICT r04 items 1 and 3).

Two measured sections, merged into STAGEWISE.json:

- ``warm_rows``: warm-started serving A/B — the fused kernel (v2: warm
  dual starts DMA'd into scratch) vs the XLA stage-wise path, at the
  kernel's auto-win shapes. Warm start = the dual of the previous sample
  in a simulated closed-loop fleet (x0 perturbed), the
  ``StagewiseController`` serving pattern.
- ``auto_rows``: the routing-table artifact — for each of the 9 committed
  ladder rows, the engine ``stagewise_preferred``/``auto_solver`` picks,
  A/B'd against the row's measured-best fixed choice. Auto must be within
  noise of best everywhere (ratio ~1 when auto == best by construction;
  a real penalty shows where routing is wrong).

Run on the real chip:  python tools/bench_stagewise_r5.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


# the committed 9-row ladder with each row's measured-best fixed engine
# (STAGEWISE.json round-4; "cond" = condensed engine, "sw" = stage-wise
# auto executor)
LADDER = [
    (8, 10, 1024, "cond"),
    (8, 60, 256, "cond"),
    (8, 120, 256, "cond"),
    (8, 240, 128, "sw"),
    (30, 200, 64, "sw"),
    (8, 60, 4096, "sw"),
    (8, 120, 4096, "sw"),
    (8, 240, 4096, "sw"),
    (30, 200, 1024, "sw"),
]

WARM_SHAPES = [(8, 60, 4096), (8, 120, 4096), (8, 10, 1024)]

# HBM-streamed kernel ladder: the big-state/long-horizon shapes where the
# whole-VMEM kernel cannot build (n30) or exceeds 16 tiles (n8 N240
# B4096), plus the latency-regime counterexample (B128, assoc-scan turf)
STREAM_SHAPES = [(30, 200, 64), (30, 200, 1024), (8, 240, 4096),
                 (8, 240, 128)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="STAGEWISE.json")
    ap.add_argument("--iterations", type=int, default=100)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--section",
                    choices=["warm", "warmstream", "auto", "stream", "cpu",
                             "smallstate", "all"],
                    default="all")
    args = ap.parse_args()

    import jax

    if args.section == "cpu":
        # host-only section: keep the axon backend out of it entirely
        # (build_stagewise's as_dev would otherwise wait on the tunnel)
        jax.config.update("jax_platforms", "cpu")

    out = (
        json.loads(Path(args.out).read_text())
        if Path(args.out).exists()
        else {"device": str(jax.devices()[0]), "rows": []}
    )

    if args.section == "smallstate":
        # OPEN measurement (tunnel outage cut the first attempt,
        # 2026-08-21): does the long-horizon crossover exist at tiny
        # per-stage state? The (n+p)=4 MHE datapoint says condensed by
        # 21x at T=180; these rows bound the double-integrator family.
        # stagewise_preferred currently gates its throughput branches at
        # n_x+n_u >= 10 — revise from these rows if they contradict it.
        out["smallstate_rows"] = []
        for N, batch in ((240, 1024), (400, 1024), (1000, 1024)):
            try:
                out["smallstate_rows"].append(
                    _smallstate_row(args, N, batch))
            except Exception as ex:
                out["smallstate_rows"].append(
                    {"N": N, "batch": batch,
                     "error": f"{type(ex).__name__}: {ex}"[:300]})
                print(f"smallstate ({N},{batch}) failed: {ex}", flush=True)
            Path(args.out).write_text(json.dumps(out, indent=1))

    if args.section in ("cpu", "all"):
        # host-only: the native C++ stage-wise baseline (the reference's
        # GPU-vs-CPU headline, reproduced for the O(N) engine)
        out["native_cpu_rows"] = []
        for n, N in ((8, 240), (30, 200)):
            try:
                out["native_cpu_rows"].append(_cpu_row(args, n, N))
            except Exception as ex:
                out["native_cpu_rows"].append(
                    {"n_cells": n, "N": N,
                     "error": f"{type(ex).__name__}: {ex}"[:300]})
        Path(args.out).write_text(json.dumps(out, indent=1))

    if args.section in ("stream", "all"):
        out["stream_rows"] = []
        for n, N, batch in STREAM_SHAPES:
            try:
                out["stream_rows"].append(_stream_row(args, n, N, batch))
            except Exception as ex:
                out["stream_rows"].append(
                    {"n_cells": n, "N": N, "batch": batch,
                     "error": f"{type(ex).__name__}: {ex}"[:300]})
                print(f"stream ({n},{N},{batch}) failed: {ex}", flush=True)
            Path(args.out).write_text(json.dumps(out, indent=1))

    if args.section in ("warmstream", "all"):
        # warm-started serving at the STREAM kernel's shapes: the
        # StagewiseController contract past the condensation wall
        # (n30 N200: the whole-VMEM kernel is unbuildable, auto routes
        # the streamed kernel; these rows are the chip evidence that
        # warm serving rides it and wins)
        out["warm_stream_rows"] = []
        for n, N, batch in ((30, 200, 1024), (30, 200, 64)):
            try:
                out["warm_stream_rows"].append(
                    _warm_row(args, n, N, batch, engine="stream"))
            except Exception as ex:
                out["warm_stream_rows"].append(
                    {"n_cells": n, "N": N, "batch": batch,
                     "error": f"{type(ex).__name__}: {ex}"[:300]})
                print(f"warmstream ({n},{N},{batch}) failed: {ex}",
                      flush=True)
            Path(args.out).write_text(json.dumps(out, indent=1))

    if args.section in ("warm", "all"):
        out["warm_rows"] = []
        for n, N, batch in WARM_SHAPES:
            try:
                out["warm_rows"].append(_warm_row(args, n, N, batch))
            except Exception as ex:
                out["warm_rows"].append(
                    {"n_cells": n, "N": N, "batch": batch,
                     "error": f"{type(ex).__name__}: {ex}"[:300]})
                print(f"warm ({n},{N},{batch}) failed: {ex}", flush=True)
            Path(args.out).write_text(json.dumps(out, indent=1))

    if args.section in ("auto", "all"):
        out["auto_rows"] = []
        for n, N, batch, best in LADDER:
            try:
                out["auto_rows"].append(_auto_row(args, n, N, batch, best))
            except Exception as ex:
                out["auto_rows"].append(
                    {"n_cells": n, "N": N, "batch": batch,
                     "error": f"{type(ex).__name__}: {ex}"[:300]})
                print(f"auto ({n},{N},{batch}) failed: {ex}", flush=True)
            Path(args.out).write_text(json.dumps(out, indent=1))

    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}")


def _smallstate_row(args, N, batch):
    import jax
    import jax.numpy as jnp

    import tpu_gpad
    from tpu_gpad import problems
    from tpu_gpad.solver import SolverConfig, solve_batch
    from tpu_gpad.stagewise import build_stagewise, solve_stagewise
    from tpu_gpad.utils import interleaved_ab

    prob = problems.double_integrator(horizon=N)
    data_s = build_stagewise(prob, iterations=args.iterations)
    data_c = tpu_gpad.dualize(
        tpu_gpad.condense(prob), iterations=args.iterations,
        paired="auto", L=float(data_s.L),
    )
    cfg = SolverConfig(iterations=args.iterations)
    rng = np.random.default_rng(0)
    X = jnp.asarray(
        rng.uniform(-0.5, 0.5, size=(batch, prob.n_x)).astype(np.float32))
    j_s = jax.jit(lambda d, x: solve_stagewise(d, x).u)
    j_c = jax.jit(lambda d, x: solve_batch(d, x, config=cfg).u)
    err = float(np.abs(
        np.asarray(j_s(data_s, X[:8])) - np.asarray(j_c(data_c, X[:8]))
    ).max())
    ab = interleaved_ab(
        lambda: j_s(data_s, X), lambda: j_c(data_c, X),
        rounds=args.rounds, k_large=8,
    )
    row = {
        "problem": "double_integrator", "N": N, "batch": batch,
        "n_plus_p": prob.n_x + prob.n_u,
        "u_parity_err": err,
        "stagewise_solves_per_sec": batch / ab["t_a_median_s"],
        "condensed_solves_per_sec": batch / ab["t_b_median_s"],
        "speedup_stagewise_over_condensed": ab["ratio_b_over_a_median"],
        "iqr": ab["ratio_b_over_a_iqr"],
        "rejected_rounds": ab["rejected_rounds"],
        "unstable": ab["unstable"],
    }
    print(json.dumps(row), flush=True)
    return row


def _cpu_row(args, n, N):
    from tpu_gpad import native, problems
    from tpu_gpad.stagewise import build_stagewise

    data = build_stagewise(problems.battery(n, N),
                           iterations=args.iterations)
    x0 = np.random.default_rng(0).uniform(
        -0.3, 0.3, size=n).astype(np.float32)
    native.solve_stagewise_fixed(data, x0, args.iterations)  # warm
    t0 = time.perf_counter()
    k = 0
    while time.perf_counter() - t0 < 2.0:
        native.solve_stagewise_fixed(data, x0, args.iterations)
        k += 1
    dt = (time.perf_counter() - t0) / k
    row = {
        "n_cells": n, "N": N, "iterations": args.iterations,
        "native_cpu_solves_per_sec": 1.0 / dt,
        "note": "single-thread C++ gpad_solve_stagewise_fixed; the "
                "per-chip speedup is stream/xla rows over this",
    }
    print(json.dumps(row), flush=True)
    return row


def _stream_row(args, n, N, batch):
    import jax
    import jax.numpy as jnp

    from tpu_gpad import problems
    from tpu_gpad.stagewise import build_stagewise, solve_stagewise
    from tpu_gpad.stagewise_stream import solve_stagewise_stream
    from tpu_gpad.utils import interleaved_ab

    prob = problems.battery(n, N)
    data = build_stagewise(prob, iterations=args.iterations)
    rng = np.random.default_rng(0)
    X0 = jnp.asarray(
        rng.uniform(-0.3, 0.3, size=(batch, n)).astype(np.float32))

    # baseline = the best pre-stream executor: XLA scan routing with the
    # whole-VMEM kernel allowed but the stream kernel EXCLUDED (scan is
    # resolved the round-4 way so the comparison isolates the new kernel)
    scan = (
        "associative"
        if (prob.n_x + prob.n_u <= 24 and batch < 1024)
        else "sequential"
    )
    j_base = jax.jit(lambda d, x: solve_stagewise(
        d, x, engine="xla", scan=scan).u)
    j_str = jax.jit(lambda d, x: solve_stagewise_stream(
        d, x, iterations=args.iterations)[0])
    err = float(np.abs(
        np.asarray(j_str(data, X0[:64])) - np.asarray(j_base(data, X0[:64]))
    ).max())
    assert err < 5e-4, (n, N, err)
    ab = interleaved_ab(
        lambda: j_str(data, X0),
        lambda: j_base(data, X0),
        rounds=args.rounds,
        k_large=10,
    )
    row = {
        "n_cells": n, "N": N, "batch": batch, "m": int(data.m),
        "u_err_stream_vs_xla": err,
        "baseline_scan": scan,
        "stream_solves_per_sec": batch / ab["t_a_median_s"],
        "xla_solves_per_sec": batch / ab["t_b_median_s"],
        # > 1 means the streamed kernel (A) beats the XLA scan executor
        "speedup_stream_over_xla_median": ab["ratio_b_over_a_median"],
        "iqr": ab["ratio_b_over_a_iqr"],
        "rejected_rounds": ab["rejected_rounds"],
        "unstable": ab["unstable"],
    }
    print(json.dumps(row), flush=True)
    return row


def _warm_row(args, n, N, batch, engine="pallas"):
    import jax
    import jax.numpy as jnp

    from tpu_gpad import problems
    from tpu_gpad.stagewise import build_stagewise, solve_stagewise
    from tpu_gpad.stagewise_kernel import stagewise_kernel_wins
    from tpu_gpad.utils import interleaved_ab

    prob = problems.battery(n, N)
    data = build_stagewise(prob, iterations=args.iterations)
    rng = np.random.default_rng(0)
    X_prev = jnp.asarray(
        rng.uniform(-0.3, 0.3, size=(batch, n)).astype(np.float32))
    X0 = X_prev + jnp.asarray(
        rng.normal(0, 0.01, size=(batch, n)).astype(np.float32))

    j_xla = jax.jit(lambda d, x, y: solve_stagewise(
        d, x, y0=y, engine="xla", scan="sequential").u)
    j_kern = jax.jit(lambda d, x, y: solve_stagewise(
        d, x, y0=y, engine=engine).u)
    # the warm dual: previous sample's solve (kernel side, cold)
    y_warm = solve_stagewise(data, X_prev, engine=engine).y

    u_k = np.asarray(j_kern(data, X0, y_warm))
    u_x = np.asarray(j_xla(data, X0, y_warm))
    err = float(np.abs(u_k - u_x).max())
    assert err < 5e-4, (n, N, err)

    ab = interleaved_ab(
        lambda: j_kern(data, X0, y_warm),
        lambda: j_xla(data, X0, y_warm),
        rounds=args.rounds,
        k_large=10,
    )
    row = {
        "n_cells": n, "N": N, "batch": batch,
        "mode": "warm-started serving (y0 = previous sample's dual)",
        "kernel": engine,
        "u_err_kernel_vs_xla": err,
        "kernel_warm_solves_per_sec": batch / ab["t_a_median_s"],
        "xla_warm_solves_per_sec": batch / ab["t_b_median_s"],
        # > 1 means the kernel (A) wins warm-started serving
        "speedup_kernel_over_xla_median": ab["ratio_b_over_a_median"],
        "iqr": ab["ratio_b_over_a_iqr"],
        "rejected_rounds": ab["rejected_rounds"],
        "unstable": ab["unstable"],
        # for engine="pallas": would auto pick the whole-VMEM kernel
        # here; for engine="stream": auto picks stream exactly when the
        # VMEM kernel does not win and scan routing would be sequential
        # (solve_stagewise's would_be_seq rule)
        "auto_routes_kernel": bool(
            stagewise_kernel_wins(N, batch, data)
            if engine == "pallas"
            else (
                not stagewise_kernel_wins(N, batch, data)
                and not (data.n_x + data.n_u <= 24 and batch < 1024)
            )
        ),
    }
    print(json.dumps(row), flush=True)
    return row


def _auto_row(args, n, N, batch, best):
    import jax
    import jax.numpy as jnp

    import tpu_gpad
    from tpu_gpad import problems
    from tpu_gpad.solver import SolverConfig, solve_batch
    from tpu_gpad.stagewise import (
        auto_solver,
        build_stagewise,
        solve_stagewise,
        stagewise_preferred,
    )
    from tpu_gpad.utils import interleaved_ab

    prob = problems.battery(n, N)
    prefer, reason = stagewise_preferred(prob, batch_hint=batch)
    auto_kind = "sw" if prefer else "cond"
    cfg = SolverConfig(iterations=args.iterations)
    rng = np.random.default_rng(0)
    X0 = jnp.asarray(
        rng.uniform(-0.3, 0.3, size=(batch, n)).astype(np.float32))

    data_s = build_stagewise(prob, iterations=args.iterations)
    j_sw = jax.jit(lambda d, x: solve_stagewise(d, x).u)
    arms = {"sw": lambda: j_sw(data_s, X0)}
    if auto_kind == "cond" or best == "cond":
        data_c = tpu_gpad.dualize(
            tpu_gpad.condense(prob), iterations=args.iterations,
            paired="auto", L=float(data_s.L),
        )
        j_c = jax.jit(lambda d, x: solve_batch(d, x, config=cfg).u)
        arms["cond"] = lambda: j_c(data_c, X0)

    t0 = time.perf_counter()
    ab = interleaved_ab(
        arms[auto_kind], arms[best], rounds=args.rounds, k_large=10,
    )
    row = {
        "n_cells": n, "N": N, "batch": batch,
        "auto_choice": auto_kind,
        "measured_best": best,
        "auto_matches_best": auto_kind == best,
        "routing_reason": reason,
        "auto_solves_per_sec": batch / ab["t_a_median_s"],
        "best_solves_per_sec": batch / ab["t_b_median_s"],
        # > 1 means auto's pick (A) is at least as fast as the row's
        # measured-best fixed choice (same engine -> ~1 by construction)
        "speedup_auto_over_best_median": ab["ratio_b_over_a_median"],
        "iqr": ab["ratio_b_over_a_iqr"],
        "rejected_rounds": ab["rejected_rounds"],
        "unstable": ab["unstable"],
        "wall_s": time.perf_counter() - t0,
    }
    # sanity: auto_solver's public entry agrees with stagewise_preferred
    _, _, kind = auto_solver(prob, iterations=10, batch_hint=batch)
    row["auto_solver_kind"] = kind
    assert (kind == "stagewise") == prefer
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    main()
