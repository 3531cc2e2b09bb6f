"""Small-shape MFU decomposition (round-2 VERDICT item 5).

The N10 shapes run at 3-19% of the big-matmul roofline. This tool
measures WHERE the gap comes from, per shape:

1. ``logical`` — the solver's logical flops (unpadded m_h; the honest MFU
   numerator used by bench.py);
2. ``mxu_tile_ceiling`` — the padding-aware ceiling: the dual matmul is
   (S, S) @ (S, B_t) with S = 8-sublane-padded m_h, and the 128x128 MXU
   processes 128-aligned panels, so a small S can use at most
   (m_h / ceil128(S))^2 of each systolic pass. This is a hardware bound
   no kernel schedule can beat at these shapes;
3. ``matmul_only`` — a chip-measured pure-matmul loop at exactly the
   kernel's padded shape and iteration count (captures real MXU behavior
   at small panels, including sequential-dependence stalls);
4. ``kernel`` — the fused solve itself;
5. ``packed`` — the multi-plant packing attempt: P identical small plants
   through ``stack_data``/``solve_multi`` (vmapped kernels). Packing
   amortizes grid/dispatch overhead but cannot beat the per-matmul tile
   ceiling (block-diagonal packing is quadratically wasteful and is NOT
   attempted; see the analysis in docs/DESIGN.md section 8f).

Comparisons between rows of one shape run INTERLEAVED (the A/B windows of
``utils.interleaved_ab``) so tunnel drift cannot fabricate a conclusion.

Usage (real chip):  python tools/mfu_breakdown.py [--out MFU_BREAKDOWN.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _ceil(x, m):
    return ((x + m - 1) // m) * m


def breakdown(shapes, batch=4096, iterations=100, quick=False):
    import os

    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    import tpu_gpad
    from tpu_gpad import problems
    from tpu_gpad.solver import SolverConfig, solve_batch
    from tpu_gpad.solver.core import resolve_engine, resolve_form
    from tpu_gpad.solver import kernels
    from tpu_gpad.utils import (
        device_time_per_call, interleaved_ab, matmul_peak_tflops, solve_flops,
    )

    cfg = SolverConfig(iterations=iterations)
    peak = matmul_peak_tflops()
    out = {"device": str(jax.devices()[0]),
           "matmul_peak_tflops_measured": peak,
           "iterations": iterations, "batch": batch, "shapes": []}
    rng = np.random.default_rng(0)
    rounds = 3 if quick else 6

    for prob_name, n, N in shapes:
        if prob_name == "battery":
            prob = problems.battery(n_cells=n, horizon=N)
        else:  # double_integrator/mass_spring take horizon only
            prob = getattr(problems, prob_name)(horizon=N)
        qp = tpu_gpad.condense(prob)
        data = tpu_gpad.dualize(qp, iterations=iterations, paired="auto")
        X0 = jnp.asarray(
            rng.uniform(-0.4, 0.4, size=(batch, qp.n_x)).astype(np.float32))
        m_h = data.m_half
        S = _ceil(m_h, 8)
        S128 = _ceil(S, 128)
        B_t = kernels.pick_lane_tile(batch, S, kernels.DUAL_FIXED_ARRAYS,
                                     mats=4 * S * S) or 128
        row = {
            "problem": prob.name, "n": n, "N": N, "m_half": m_h,
            "S_pad8": S, "S_pad128": S128, "B_t": B_t,
            "routing": {
                "engine": resolve_engine(data, cfg),
                "form": resolve_form(data, cfg),
            },
        }
        flops_solve = solve_flops(data, iterations, resolve_form(data, cfg))
        # padding-aware MXU ceiling: each (S, S) @ (S, B_t) pass occupies
        # m_h/S128-aligned panels in both contracting and row dims
        row["logical_flops_per_solve"] = flops_solve
        row["mxu_tile_ceiling_pct"] = 100.0 * (m_h / S128) ** 2

        # (4) the fused solve, interleaved against (3) a pure-matmul loop
        # at the kernel's exact padded shape and iteration count
        D_pad = jnp.zeros((S, S), dtype=jnp.float32)
        D_pad = D_pad.at[:m_h, :m_h].set(jnp.asarray(data.D))
        W0 = jnp.asarray(
            rng.standard_normal((S, batch)).astype(np.float32) * 0.01)

        @jax.jit
        def matmul_loop(D, W):
            def body(k, w):
                return jax.lax.dot(
                    D, w, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                ) * 1e-3 + w  # keep magnitudes bounded; still one MXU op
            return jax.lax.fori_loop(0, iterations, body, W)

        ab = interleaved_ab(
            lambda: solve_batch(data, X0, config=cfg).u,
            lambda: matmul_loop(D_pad, W0),
            rounds=rounds,
        )
        t_solve, t_mm = ab["t_a_median_s"], ab["t_b_median_s"]
        row["kernel_solves_per_sec"] = batch / t_solve
        row["kernel_tflops_logical"] = flops_solve * batch / t_solve / 1e12
        row["kernel_pct_peak_logical"] = (
            100.0 * row["kernel_tflops_logical"] / peak)
        mm_flops = 2 * S * S * batch * iterations
        row["matmul_only_tflops_padded"] = mm_flops / t_mm / 1e12
        row["matmul_only_pct_peak_padded"] = (
            100.0 * row["matmul_only_tflops_padded"] / peak)
        row["kernel_vs_matmul_only_time_ratio"] = t_solve / t_mm
        row["per_round_ratio"] = ab["ratios"]

        # (5) multi-plant packing: P copies through solve_multi (vmapped
        # kernel) vs P sequential solve_batch calls — measures dispatch/
        # grid amortization, the only overhead packing can remove
        from tpu_gpad.solver import solve_multi, stack_data

        P = 4
        stacked = stack_data([data] * P)
        Xp = jnp.asarray(np.tile(np.asarray(X0[: batch // P])[None],
                                 (P, 1, 1)))
        abp = interleaved_ab(
            lambda: solve_multi(stacked, Xp, config=cfg).u,
            lambda: solve_batch(data, X0[: batch // P], config=cfg).u,
            rounds=rounds,
        )
        t_packed, t_one = abp["t_a_median_s"], abp["t_b_median_s"]
        row["packed_x4_solves_per_sec"] = batch / t_packed
        row["packed_speedup_vs_4_calls"] = 4 * t_one / t_packed
        out["shapes"].append(row)
        print(json.dumps(row), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="MFU_BREAKDOWN.json")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iterations", type=int, default=100)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    shapes = [
        ("battery", 3, 10),          # m_half=70: the headline small shape
        ("double_integrator", 1, 10),  # the 3.0%-MFU worst case
        ("battery", 3, 30),          # mid-size for the trend
    ]
    out = breakdown(shapes, batch=args.batch, iterations=args.iterations,
                    quick=args.quick)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
