"""Condensed vs stage-wise GPAD across a horizon ladder (DESIGN.md §11).

The stage-wise solver trades the condensed engines' O(N^2)-per-iteration
MXU matmuls for O(N) work behind 2N sequential scan steps; this tool
measures where the crossover sits on the real chip and how the condensed
OFFLINE build cost (host float64, O(N^2) memory) grows alongside.

Both engines run the SAME dual dynamics: the stage-wise power-iteration L
is passed to ``dualize`` so every row is an apples-to-apples fixed-100-
iteration solve, u*-parity-checked per shape before timing. Ratios come
from ``utils.interleaved_ab`` (CLAUDE.md measurement rule: sequential
readings fabricate wins).

Writes STAGEWISE.json. Run on the real chip:  python tools/bench_stagewise.py
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
    ap.add_argument("--out", default="STAGEWISE.json")
    ap.add_argument("--iterations", type=int, default=100)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--shapes", default=None,
                    help="override ladder: 'n,N,B;n,N,B;...'")
    ap.add_argument("--merge", action="store_true",
                    help="append rows to an existing --out file")
    ap.add_argument("--replace-rows", action="store_true",
                    help="re-measure the ladder INTO an existing --out "
                         "file: reset 'rows' but keep every other "
                         "section (warm_rows/auto_rows/stream_rows/...)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import tpu_gpad
    from tpu_gpad import problems
    from tpu_gpad.solver import SolverConfig, solve_batch
    from tpu_gpad.solver.core import resolve_engine, resolve_form
    from tpu_gpad.stagewise import build_stagewise, solve_stagewise
    from tpu_gpad.utils import interleaved_ab

    # (n_cells, N, batch): short horizon (condensed home turf) -> long
    # horizons where the condensed operands blow past VMEM and the host
    # build cost becomes the story. The big-batch tail is where the
    # stage-wise engine's O(N) flops can show: at small batch its 2N
    # sequential scan steps are latency-bound no-ops, while the condensed
    # engine pays O(N^2) matmul flops at ANY batch.
    shapes = [(8, 10, 1024), (8, 60, 256), (8, 120, 256), (8, 240, 128),
              (30, 200, 64), (8, 60, 4096), (8, 120, 4096), (8, 240, 4096),
              (30, 200, 1024)]
    if args.quick:
        shapes = [(8, 10, 256), (8, 120, 128)]

    if args.shapes:
        shapes = [tuple(int(v) for v in s.split(","))
                  for s in args.shapes.split(";")]

    out = {
        "device": str(jax.devices()[0]),
        "iterations": args.iterations,
        "rounds": args.rounds,
        "rows": [],
    }
    if args.merge and Path(args.out).exists():
        out = json.loads(Path(args.out).read_text())
    elif args.replace_rows and Path(args.out).exists():
        out = json.loads(Path(args.out).read_text())
        out["rows"] = []
        out["iterations"] = args.iterations
        out["rounds"] = args.rounds

    for n, N, batch in shapes:
        try:
            _one_shape(out, args, n, N, batch)
        except Exception as ex:  # keep the ladder going past a bad shape
            out["rows"].append(
                {"n_cells": n, "N": N, "batch": batch,
                 "error": f"{type(ex).__name__}: {ex}"[:300]}
            )
            print(f"shape ({n},{N},{batch}) failed: {ex}", flush=True)
        Path(args.out).write_text(json.dumps(out, indent=1))

    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}")


def _auto_executor(data, N, batch) -> str:
    """Which executor solve_stagewise's auto routing takes on TPU
    (deterministic; recorded per row for transparency)."""
    from tpu_gpad.stagewise_kernel import (
        stagewise_kernel_compatible, stagewise_kernel_wins)
    from tpu_gpad.stagewise_stream import stagewise_stream_compatible

    if (stagewise_kernel_compatible(data)[0]
            and stagewise_kernel_wins(N, batch, data)):
        return "kernel"
    seq = not (data.n_x + data.n_u <= 24 and batch < 1024)
    if seq and stagewise_stream_compatible(data)[0]:
        return "stream"
    return "sequential" if seq else "associative"


def _one_shape(out, args, n, N, batch):
    import jax
    import jax.numpy as jnp

    import tpu_gpad
    from tpu_gpad import problems
    from tpu_gpad.solver import SolverConfig, solve_batch
    from tpu_gpad.solver.core import resolve_engine, resolve_form
    from tpu_gpad.stagewise import build_stagewise, solve_stagewise
    from tpu_gpad.utils import interleaved_ab

    prob = problems.battery(n, N)
    t0 = time.perf_counter()
    data_s = build_stagewise(prob, iterations=args.iterations)
    build_s = time.perf_counter() - t0
    L = float(data_s.L)

    t0 = time.perf_counter()
    qp = tpu_gpad.condense(prob)
    data_c = tpu_gpad.dualize(
        qp, iterations=args.iterations, paired="auto", L=L
    )
    build_c = time.perf_counter() - t0
    # stored fp32 bytes of the two condensed MVP operands, as-is;
    # full-stack equivalent doubles a paired build (the paired stack
    # stores half the rows of the +/- pair)
    operand_mb = (data_c.MG_T.size + data_c.GL_T.size) * 4 / 1e6
    operand_full_mb = operand_mb * (2 if data_c.paired else 1)

    cfg = SolverConfig(iterations=args.iterations)
    rng = np.random.default_rng(0)
    X0 = jnp.asarray(
        rng.uniform(-0.3, 0.3, size=(batch, n)).astype(np.float32)
    )

    from tpu_gpad.stagewise_kernel import (
        stagewise_kernel_compatible, stagewise_kernel_wins)

    # JIT every timed engine ONCE: an un-jitted solve_stagewise RETRACES
    # per call, and tracing a 2N-step scan costs more than executing it —
    # the round-4 session measured the same shape at 1.5k solves/s
    # un-jitted vs 10.9k jitted (the committed r4 big-batch row was
    # polluted by exactly this)
    # data passed as a jit ARGUMENT, never a closure: captured operands
    # become baked-in constants and the 585 MB n30 N200 condensed
    # matrices blow the tunnel's compile-request size limit (HTTP 413)
    j_auto = jax.jit(lambda d, x: solve_stagewise(d, x).u)
    j_xla = jax.jit(lambda d, x: solve_stagewise(
        d, x, engine="xla", scan="sequential").u)
    j_cond = jax.jit(lambda d, x: solve_batch(d, x, config=cfg).u)
    j_assoc = jax.jit(
        lambda d, x: solve_stagewise(
            d, x, engine="xla", scan="associative").u)
    f_auto = lambda x: j_auto(data_s, x)
    f_xla = lambda x: j_xla(data_s, x)
    f_cond = lambda x: j_cond(data_c, x)
    f_assoc = lambda x: j_assoc(data_s, x)
    kernel_ok = (stagewise_kernel_compatible(data_s)[0]
                 and jax.default_backend() == "tpu")
    if kernel_ok:
        j_kern = jax.jit(
            lambda d, x: solve_stagewise(d, x, engine="pallas").u)
        f_kern = lambda x: j_kern(data_s, x)
    else:
        f_kern = None

    # parity guard before timing anything
    uc = np.asarray(solve_batch(data_c, X0[:8], config=cfg).u)
    us = np.asarray(f_auto(X0[:8]))
    u_err = float(np.abs(uc - us).max())
    # chip cross-engine comparisons at fixed 100 iters diverge at relu
    # boundaries to ~e-3 (CLAUDE.md calibration, conftest.backend_tol)
    assert u_err < 5e-3, (n, N, u_err)
    u_kernel_err = None
    if kernel_ok:
        u_kernel_err = float(np.abs(
            np.asarray(f_kern(X0[:8])) - np.asarray(f_xla(X0[:8]))).max())
        assert u_kernel_err < 5e-4, (n, N, u_kernel_err)

    ab = interleaved_ab(
        lambda: f_auto(X0),
        lambda: f_cond(X0),
        rounds=args.rounds,
        k_large=10,
    )
    # second A/B: parallel-prefix sweeps vs lax.scan sweeps
    ab_assoc = interleaved_ab(
        lambda: f_assoc(X0),
        lambda: f_xla(X0),
        rounds=args.rounds,
        k_large=10,
    )
    # third A/B: the fused stage-wise kernel vs the XLA stage-wise path
    ab_kern = None
    if kernel_ok:
        ab_kern = interleaved_ab(
            lambda: f_kern(X0),
            lambda: f_xla(X0),
            rounds=args.rounds,
            k_large=10,
        )
        if ab_kern["rounds"] == 0:  # fully gated out: null fields, no NaN
            ab_kern = None
    row = {
        "n_cells": n,
        "N": N,
        "batch": batch,
        "m": int(data_s.m),
        "L": L,
        "u_parity_err": u_err,
        "stagewise_solves_per_sec": batch / ab["t_a_median_s"],
        "condensed_solves_per_sec": batch / ab["t_b_median_s"],
        # ratio > 1 means stage-wise (A) is faster
        "speedup_stagewise_over_condensed_median": ab[
            "ratio_b_over_a_median"
        ],
        "speedup_iqr": ab["ratio_b_over_a_iqr"],
        # IQR/median > 0.25: per-round ratios disagree too much to read
        # a modest difference off this row (bench.py's wide_variance rule;
        # r04 judge minor note)
        "wide_variance": bool(
            ab["ratio_b_over_a_iqr"]
            > 0.25 * abs(ab["ratio_b_over_a_median"])
        ),
        "per_round_ratios": ab["ratios"],
        "rejected_rounds": ab["rejected_rounds"],
        "unstable": ab["unstable"],
        "assoc_rejected_rounds": ab_assoc["rejected_rounds"],
        "assoc_unstable": ab_assoc["unstable"],
        "assoc_solves_per_sec": batch / ab_assoc["t_a_median_s"],
        # ratio > 1 means the associative sweeps are faster
        "speedup_assoc_over_seq_median": ab_assoc[
            "ratio_b_over_a_median"
        ],
        "assoc_iqr": ab_assoc["ratio_b_over_a_iqr"],
        "stagewise_auto_is_kernel": bool(
            kernel_ok and stagewise_kernel_wins(N, batch, data_s)),
        "stagewise_auto_executor_on_tpu": _auto_executor(data_s, N, batch),
        "kernel_u_err_vs_xla_sw": u_kernel_err,
        "kernel_solves_per_sec": (
            batch / ab_kern["t_a_median_s"] if ab_kern else None),
        "xla_sw_solves_per_sec": (
            batch / ab_kern["t_b_median_s"] if ab_kern else None),
        # ratio > 1 means the kernel (A) is faster than the XLA sw path
        "speedup_kernel_over_xla_sw_median": (
            ab_kern["ratio_b_over_a_median"] if ab_kern else None),
        "kernel_iqr": (
            ab_kern["ratio_b_over_a_iqr"] if ab_kern else None),
        "kernel_rejected_rounds": (
            ab_kern["rejected_rounds"] if ab_kern else None),
        "kernel_unstable": (ab_kern["unstable"] if ab_kern else None),
        "condensed_engine": resolve_engine(data_c, cfg),
        "condensed_form": resolve_form(data_c, cfg),
        "condensed_operand_mb": operand_mb,
        "condensed_operand_full_stack_mb": operand_full_mb,
        "stagewise_data_mb": sum(
            np.prod(a.shape) for a in (data_s.K, data_s.Hi, data_s.E,
                                       data_s.A_seq, data_s.B_seq)
        ) * 4 / 1e6,
        "condensed_build_s": build_c,
        "stagewise_build_s": build_s,
    }
    out["rows"].append(row)
    print(json.dumps(row), flush=True)
    Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
