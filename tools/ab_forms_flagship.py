"""Interleaved form comparison at the reference's flagship 30x30 shape.

Makes the form-routing rationale in docs/DESIGN.md section 8c/8d traceable
to a committed artifact (VERDICT round 2 item 2): at the VMEM-oversized
flagship shape (n_u=30, N=30, m=3660), measure — all interleaved against
the auto-routing winner (XLA mvp+flat) so tunnel drift cancels —

  * XLA dense mvp (``flat="off"``): what the 2*n_struct^2/iter flat flop
    cut is worth (the TPU form of the reference's flat kernels,
    ``kernel_functions.cu:74-109``);
  * the HBM-streamed tiled DUAL Pallas kernel (``form="dual"``): why form
    auto prefers mvp+flat over dual once the MXU is the bottleneck.

Writes AB_FORMS_30x30.json. Run on the real chip:
``python tools/ab_forms_flagship.py``.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="AB_FORMS_30x30.json")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iterations", type=int, default=100)
    ap.add_argument("--rounds", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import tpu_gpad
    from tpu_gpad import problems
    from tpu_gpad.solver import SolverConfig, solve_batch
    from tpu_gpad.solver.core import resolve_engine, resolve_form
    from tpu_gpad.solver.reference import gpad_solve_qp
    from tpu_gpad.utils import interleaved_ab, matmul_peak_tflops, solve_flops

    qp = tpu_gpad.condense(problems.battery(n_cells=30, horizon=30))
    data = tpu_gpad.dualize(qp, iterations=args.iterations, paired="auto")
    assert data.m == 3660, data.m
    rng = np.random.default_rng(0)
    X0 = jnp.asarray(
        rng.uniform(-0.4, 0.4, size=(args.batch, qp.n_x)).astype(np.float32))

    prec = "highest"
    cfg_flat = SolverConfig(iterations=args.iterations, engine="xla",
                            form="mvp", flat="on", precision=prec)
    cfg_dense = SolverConfig(iterations=args.iterations, engine="xla",
                             form="mvp", flat="off", precision=prec)
    cfg_dual = SolverConfig(iterations=args.iterations, engine="pallas",
                            form="dual", precision=prec)
    assert resolve_engine(data, cfg_dual) == "pallas"
    assert resolve_form(data, cfg_dual) == "dual"

    out = {
        "device": str(jax.devices()[0]),
        "shape": {"n_u": 30, "N": 30, "m": data.m, "n_z": data.n_z,
                  "m_half": data.m_half, "n_struct": data.n_struct},
        "batch": args.batch,
        "iterations": args.iterations,
        "precision": prec,
        "anchor": "xla mvp+flat (the auto-routing winner, AB_FLAGSHIP.json)",
    }

    # u* parity guard across all three paths before timing anything
    x0 = np.asarray(X0[0], dtype=np.float64)
    ref = gpad_solve_qp(qp, x0, iterations=args.iterations)
    for name, cfg in (("xla_flat", cfg_flat), ("xla_dense", cfg_dense),
                      ("pallas_dual", cfg_dual)):
        res = tpu_gpad.solve(data, X0[0], config=cfg)
        err = float(np.abs(np.asarray(res.u) - ref.u).max())
        out[f"u_err_{name}"] = err
        assert err < 1e-3, (name, err)

    peak = matmul_peak_tflops("float32", prec)
    for name, cfg, form, flat in (
        ("xla_dense_mvp", cfg_dense, "mvp", False),
        ("pallas_tiled_dual", cfg_dual, "dual", False),
    ):
        ab = interleaved_ab(
            lambda: solve_batch(data, X0, config=cfg).u,
            lambda: solve_batch(data, X0, config=cfg_flat).u,
            rounds=args.rounds, k_large=10,
        )
        flops = solve_flops(data, args.iterations, form, flat=flat) * args.batch
        flops_flat = solve_flops(
            data, args.iterations, "mvp", flat=True) * args.batch
        out[name] = {
            "solves_per_sec": args.batch / ab["t_a_median_s"],
            "xla_flat_solves_per_sec": args.batch / ab["t_b_median_s"],
            # >1 means this form is FASTER than the mvp+flat anchor
            "speedup_over_xla_flat_median": ab["ratio_b_over_a_median"],
            "speedup_iqr": ab["ratio_b_over_a_iqr"],
            "per_round_ratios": ab["ratios"],
            "pct_peak_own_form_flops": (
                100.0 * flops / ab["t_a_median_s"] / 1e12 / peak),
            "xla_flat_pct_peak": (
                100.0 * flops_flat / ab["t_b_median_s"] / 1e12 / peak),
            "peak_tflops": peak,
        }
        print(json.dumps({name: out[name]}), flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
