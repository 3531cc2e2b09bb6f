"""BASELINE.json config sweep: throughput across the five benchmark configs.

Covers what bench.py's headline doesn't: the double-integrator / mass-spring
horizon sweep (config 4) and a 100k+ scenario checkpointed sweep (the
single-chip stand-in for config 5 — the pod-slice variant adds shard_map
over more chips, same code path via ``sweep --sharded``).

Writes BENCH_CONFIGS.json. Run on the real chip:  python tools/bench_configs.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import os

    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    import tpu_gpad
    from tpu_gpad import problems
    from tpu_gpad.solver import SolverConfig, solve_batch
    from tpu_gpad.solver.core import resolve_engine, resolve_flat, resolve_form
    from tpu_gpad.utils import (
        device_time_per_call, matmul_peak_tflops, solve_flops,
    )
    from tpu_gpad.utils.timing import anchored_throughput

    out = {"device": str(jax.devices()[0]), "iterations": 100}
    cfg = SolverConfig(iterations=100)
    rng = np.random.default_rng(0)
    peaks = {}

    def peak_for(config):
        key = f"{config.matmul_dtype}/{config.precision}"
        if key not in peaks:
            peaks[key] = round(
                matmul_peak_tflops(config.matmul_dtype, config.precision), 2
            )
        return peaks[key]

    peak_for(cfg)
    out["matmul_peak_tflops_measured"] = peaks

    def bench_one(problem, batch, x_scale=0.4, config=None, data=None):
        config = config or cfg
        if data is None:
            data = tpu_gpad.dualize(
                tpu_gpad.condense(problem), iterations=100, paired="auto")
        X0 = jnp.asarray(
            rng.uniform(-x_scale, x_scale, size=(batch, problem.n_x))
            .astype(np.float32))
        # anchor-interleaved per row (VERDICT r03 item 4): sequential
        # median-of-5 rows carried 23-35% IQR — regression-blind. The
        # anchor-normalized rate is the comparable stat; iqr_rel > 0.10
        # marks a row as wide-variance weather.
        # IQR-targeted autoscaling (VERDICT r04 item 6): sub-ms rows
        # (N10 sweeps carried iqr_rel ~0.5) escalate to longer windows
        # until the ratio resolves to ~10% or the budget is spent
        at = anchored_throughput(
            lambda: solve_batch(data, X0, config=config).u,
            batch, rounds=5, k_large=10,
            iqr_rel_target=0.10, autoscale_max_s=75.0)
        t = at["t_a_median_s"]
        form = resolve_form(data, config)
        flat = form == "mvp" and resolve_flat(data, config)
        tflops = solve_flops(data, 100, form, flat=flat) * batch / t / 1e12
        return {
            "n_z": data.n_z, "m": data.m, "paired": data.paired,
            "batch": batch,
            "engine": resolve_engine(data, config),
            "form": form + ("+flat" if flat else ""),
            "precision": config.precision,
            "solves_per_sec": round(
                at["solves_per_sec_anchor_normalized"], 1),
            "solves_per_sec_raw": round(at["solves_per_sec_raw"], 1),
            "iqr_rel": round(at["iqr_rel"], 4),
            "wide_variance": bool(at["iqr_rel"] > 0.10),
            "rejected_rounds": at["rejected_rounds"],
            "unstable": at["unstable"],
            "anchor_tflops": round(at["anchor_tflops"], 2),
            "rounds": at["rounds"],
            "device_us_per_solve": round(t * 1e6 / batch, 3),
            "achieved_tflops": round(tflops, 3),
            "pct_peak": round(100.0 * tflops / peak_for(config), 1),
        }

    # config 4: double integrator + mass-spring over horizon {10, 30, 100}
    sweep = {}
    for N in (10, 30, 100):
        sweep[f"double_integrator_N{N}"] = bench_one(
            problems.double_integrator(horizon=N), batch=2048, x_scale=5.0)
        print(f"double_integrator N={N}: "
              f"{sweep[f'double_integrator_N{N}']['solves_per_sec']:.0f} /s",
              flush=True)
    for N, batch in ((10, 1024), (30, 1024), (100, 256)):
        sweep[f"mass_spring_N{N}"] = bench_one(
            problems.mass_spring(n_masses=4, horizon=N), batch=batch,
            x_scale=0.5)
        print(f"mass_spring N={N}: "
              f"{sweep[f'mass_spring_N{N}']['solves_per_sec']:.0f} /s",
              flush=True)
    out["horizon_sweep"] = sweep

    # the reference's flagship dataset shape: n_u=30, N=30, m=3660
    # (build/step3/4/input.txt header; main.cu's inputs_manysets datasets).
    # engine auto serves it with the flat-mvp XLA path (fastest measured;
    # the tiled Pallas dual kernel covers the forced-dual/eps routes).
    ref_shape = problems.battery(n_cells=30, horizon=30)
    data_ref = tpu_gpad.dualize(
        tpu_gpad.condense(ref_shape), iterations=100, paired="auto")
    out["reference_shape_30x30"] = bench_one(ref_shape, batch=256, data=data_ref)
    x1 = jnp.asarray(
        rng.uniform(-0.4, 0.4, size=(1, 30)).astype(np.float32))
    t1 = device_time_per_call(
        lambda: solve_batch(data_ref, x1, config=cfg).u, k_large=10)
    out["reference_shape_30x30"]["single_solve_device_ms"] = round(t1 * 1e3, 3)
    print(f"reference shape 30x30: "
          f"{out['reference_shape_30x30']['solves_per_sec']:.0f} /s batched, "
          f"{t1*1e3:.2f} ms single", flush=True)
    # the 3-pass fp32 ("high") tier at the same shape — same u* error as
    # 'highest' here (the fp32 fixed-point error dominates), ~1.7x faster
    out["reference_shape_30x30_high"] = bench_one(
        ref_shape, batch=256, data=data_ref,
        config=SolverConfig(iterations=100, precision="high"))
    print(f"reference shape 30x30 (high): "
          f"{out['reference_shape_30x30_high']['solves_per_sec']:.0f} /s",
          flush=True)

    # robust scenario MPC (tpu_gpad.robust): S=4 actuator-gain realizations
    # sharing one first move — a bigger-n_z workload class with a deduped
    # stacked constraint set (bench_one only reads .n_x off the "problem")
    nom = problems.double_integrator(horizon=12)
    variants = tpu_gpad.scenario_problem_variants(
        nom, B_list=[nom.B * s for s in (0.6, 0.85, 1.15, 1.4)])
    qp_rob = tpu_gpad.scenario_qp([tpu_gpad.condense(p) for p in variants])
    data_rob = tpu_gpad.dualize(qp_rob, iterations=100, paired="auto")
    out["scenario_robust_S4_N12"] = bench_one(
        qp_rob, batch=1024, x_scale=5.0, data=data_rob)
    print(f"scenario robust S4 N12: "
          f"{out['scenario_robust_S4_N12']['solves_per_sec']:.0f} /s",
          flush=True)

    # eps-mode iteration counts at the reference shape, +- adaptive restart
    # (reuse the condensed QP and Lipschitz constant computed for data_ref —
    # the spectral bound on the 3660-row dual Hessian costs minutes)
    qp_ref = tpu_gpad.condense(ref_shape)
    data_eps = tpu_gpad.dualize(
        qp_ref, iterations=3000, paired="auto", L=float(np.asarray(data_ref.L)))
    Xe = jnp.asarray(
        rng.uniform(-0.3, 0.3, size=(256, 30)).astype(np.float32))
    kw = dict(mode="eps", eps_g=1e-4, eps_V=1e-4, check_every=20,
              iterations=3000)
    eps_stats = {}
    for restart in (True, False):
        r = solve_batch(data_eps, Xe, config=SolverConfig(restart=restart, **kw))
        it = np.asarray(r.iterations)
        eps_stats["restart" if restart else "plain"] = {
            "converged": int(np.asarray(r.converged).sum()),
            "iters_mean": round(float(it.mean()), 1),
            "iters_max": int(it.max()),
        }
    out["reference_shape_eps1e4"] = eps_stats
    print("reference shape eps1e-4:", eps_stats, flush=True)

    # config 5 (single-chip stand-in): 131072-scenario checkpointed sweep
    from tpu_gpad.sweep import run_sweep

    problem = problems.battery(n_cells=3, horizon=10)
    data = tpu_gpad.dualize(
        tpu_gpad.condense(problem), iterations=100, paired="auto")
    B = 131072
    X0 = rng.uniform(-0.5, 0.5, size=(B, 3)).astype(np.float32)
    # warm the jit cache so the sweep measures steady-state throughput
    solve_batch(data, jnp.asarray(X0[:8192]), config=cfg).u.block_until_ready()
    res = run_sweep(data, X0, cfg, chunk_size=8192)
    out["sweep_131k"] = {
        "scenarios": B,
        "wall_s": round(res.wall_s, 3),
        "solves_per_sec_wall": round(B / res.wall_s, 1),
    }
    print(f"131k sweep: {out['sweep_131k']['solves_per_sec_wall']:.0f} /s wall",
          flush=True)

    path = Path(__file__).resolve().parent.parent / "BENCH_CONFIGS.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
