"""Interleaved A/B at the reference's flagship 30x30 shape (VERDICT item 3).

A = the HBM-streamed flat (mvp-form) Pallas kernel
    (``kernels.gpad_pallas_fixed_flat_tiled``, engine="pallas" form="mvp");
B = the XLA mvp+flat path (the round-2 auto-routing winner at this shape,
    47.6k solves/s highest / 81.8k high).

Both run the SAME algebra (flat mvp iteration, 2*n_struct^2 fewer flops per
iteration than dual form) on the same condensed battery 30x30 problem
(n_u=30, N=30, m=3660 — ``/root/reference/build/step3/4/input.txt:1``), at
precision "highest" AND "high", using ``utils.interleaved_ab`` so tunnel
drift cannot fabricate a verdict (CLAUDE.md measurement rule). A u*-parity
check against the NumPy oracle guards both sides.

Writes AB_FLAGSHIP.json. Run on the real chip:  python tools/ab_flagship.py
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
    ap.add_argument("--out", default="AB_FLAGSHIP.json")
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

    out = {
        "device": str(jax.devices()[0]),
        "shape": {"n_u": 30, "N": 30, "m": data.m, "n_z": data.n_z,
                  "m_half": data.m_half, "n_struct": data.n_struct},
        "batch": args.batch,
        "iterations": args.iterations,
    }

    # u* parity guard for both engines before timing anything
    x0 = np.asarray(X0[0], dtype=np.float64)
    ref = gpad_solve_qp(qp, x0, iterations=args.iterations)
    for eng, kw in (("pallas", {"form": "mvp"}), ("xla", {"form": "mvp", "flat": "on"})):
        c = SolverConfig(iterations=args.iterations, engine=eng, **kw)
        res = tpu_gpad.solve(data, X0[0], config=c)
        err = float(np.abs(np.asarray(res.u) - ref.u).max())
        out[f"u_err_{eng}"] = err
        assert err < 1e-3, (eng, err)

    flops = solve_flops(data, args.iterations, "mvp", flat=True) * args.batch

    for prec in ("highest", "high"):
        cfg_pl = SolverConfig(iterations=args.iterations, engine="pallas",
                              form="mvp", precision=prec)
        cfg_xla = SolverConfig(iterations=args.iterations, engine="xla",
                               form="mvp", flat="on", precision=prec)
        assert resolve_engine(data, cfg_pl) == "pallas"
        assert resolve_form(data, cfg_pl) == "mvp", resolve_form(data, cfg_pl)
        ab = interleaved_ab(
            lambda: solve_batch(data, X0, config=cfg_pl).u,
            lambda: solve_batch(data, X0, config=cfg_xla).u,
            rounds=args.rounds, k_large=10,
        )
        peak = matmul_peak_tflops("float32", prec)
        row = {
            "pallas_flat_tiled_solves_per_sec": args.batch / ab["t_a_median_s"],
            "xla_flat_solves_per_sec": args.batch / ab["t_b_median_s"],
            # ratio > 1 means A (pallas) is faster
            "speedup_pallas_over_xla_median": ab["ratio_b_over_a_median"],
            "speedup_iqr": ab["ratio_b_over_a_iqr"],
            "per_round_ratios": ab["ratios"],
            "pallas_pct_peak": 100.0 * flops / ab["t_a_median_s"] / 1e12 / peak,
            "xla_pct_peak": 100.0 * flops / ab["t_b_median_s"] / 1e12 / peak,
            "peak_tflops": peak,
        }
        out[f"precision_{prec}"] = row
        print(json.dumps({prec: row}), flush=True)

    # --- roofline decomposition: is XLA flat-mvp already at the bound? ---
    # A matmul-ONLY fori_loop at the flat iteration's exact two MXU
    # products per iteration — step 2 (n_z, m_h)@(m_h, B) and step 4
    # (n_struct, n_z)@(n_z, B) — with the step-4 rows scattered back into
    # the (m_h, B) state exactly as the solve must. If the real solve's
    # time is within a few % of this loop, the SAXPY/projection steps and
    # XLA's schedule are already free and no kernel can do better at this
    # shape (VERDICT item 3's alternative done-criterion).
    n_z, m_h, n_s = data.n_z, data.m_half, data.n_struct
    rngj = np.random.default_rng(1)
    A2 = jnp.asarray(rngj.standard_normal((n_z, m_h)).astype(np.float32))
    A4 = jnp.asarray(rngj.standard_normal((n_s, n_z)).astype(np.float32))
    W0 = jnp.asarray(
        rngj.standard_normal((m_h, args.batch)).astype(np.float32) * 1e-2)

    for prec, lax_prec in (("highest", jax.lax.Precision.HIGHEST),):
        @jax.jit
        def mm_loop(w):
            def body(k, w):
                z = jax.lax.dot(A2, w, precision=lax_prec,
                                preferred_element_type=jnp.float32)
                ys = jax.lax.dot(A4, z, precision=lax_prec,
                                 preferred_element_type=jnp.float32)
                # scatter struct rows back, keep identity rows — the same
                # memory movement the flat step 4 performs
                return jnp.concatenate([ys * 1e-3, w[n_s:]], axis=0)

            return jax.lax.fori_loop(0, args.iterations, body, w)

        cfg_xla = SolverConfig(iterations=args.iterations, engine="xla",
                               form="mvp", flat="on", precision=prec)
        ab = interleaved_ab(
            lambda: solve_batch(data, X0, config=cfg_xla).u,
            lambda: mm_loop(W0),
            rounds=args.rounds, k_large=10,
        )
        mm_flops = args.iterations * args.batch * (
            2 * n_z * m_h + 2 * n_s * n_z)
        peak = matmul_peak_tflops("float32", prec)
        out[f"roofline_{prec}"] = {
            "xla_solve_t_s": ab["t_a_median_s"],
            "matmul_only_t_s": ab["t_b_median_s"],
            # >1 means the solve is SLOWER than its own MXU work alone;
            # (ratio - 1) is the total non-MXU headroom a perfect kernel
            # could still claw back
            "solve_over_matmul_only_median": 1.0 / ab["ratio_b_over_a_median"],
            "per_round_ratios_mm_over_solve": ab["ratios"],
            "matmul_only_pct_peak": (
                100.0 * mm_flops / ab["t_b_median_s"] / 1e12 / peak),
        }
        print(json.dumps({f"roofline_{prec}": out[f"roofline_{prec}"]}),
              flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
