"""Benchmark harness. Prints ONE JSON line on stdout:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): MPC solves/sec/chip on the battery-balancing
QP — 4096 scenarios, horizon N=10, 100 fixed GPAD iterations, fp32.
``vs_baseline`` is the speedup over the sequential CPU oracle solving the
same problem at the same iteration budget — the reference project's own
headline comparison (GPU vs sequential CPU, README.md:7-10).

Timing uses the slope method (tpu_gpad.utils.timing): the tunneled TPU has a
~30 ms host RPC floor and an async dispatch that returns before compute
finishes, so naive per-call walltime is meaningless. The headline VALUE is
the ANCHOR-NORMALIZED rate: the solve is measured INTERLEAVED against a
fixed dense-matmul anchor (alternating windows, validity-gated — see
timing.interleaved_ab) and the ratio is multiplied by the pinned
ANCHOR_REF_TFLOPS anchor speed, so round-over-round comparisons measure
solver code, not tunnel weather (the raw absolute rate rides along as
``raw_solves_per_sec``). Detailed sub-benchmarks go to BENCH_DETAIL.json;
pass --quick for smoke runs.

Failure contract (the round-2 lesson, VERDICT.md item 1): the TPU tunnel can
be DOWN for an hour+ ("Unable to initialize backend 'axon'"). The backend is
probed in a subprocess under a timeout with retry/backoff BEFORE any solve;
on hard failure the script still prints one parseable JSON line with
``"value": null`` and an ``"error"`` field and exits 0 — never a bare
traceback as the only output (that is the reference's timing record role,
``main.cu:188-190``, done robustly).
"""

import argparse
import json
import subprocess
import sys
import time
import traceback


HEADLINE_METRIC = "mpc_solves_per_sec_per_chip"

# The chip's measured fp32-highest dense-matmul roofline (AB_FLAGSHIP.json
# roofline decomposition; also the anchor_tflops of every clean committed
# run: 31.09 in the round-3 BENCH_DETAIL). The headline value is the
# ANCHOR-NORMALIZED rate: solve/anchor ratio x this pinned anchor speed, so
# round-over-round numbers compare solver code, not tunnel weather
# (BENCH_r01 8.69M vs r03 6.84M was -21% raw but only -7% anchor-normalized
# — the raw rate conflated regression with drift; VERDICT r03 item 3).
ANCHOR_REF_TFLOPS = 31.0
# 1.5x the roofline: an anchor window timed faster than this is physically
# impossible on this chip — reject the round (VERDICT r03 item 2: the r03
# driver run let a ~zero anchor window fabricate a 988219x ratio).
ANCHOR_MAX_TFLOPS = 46.5

# Exception text that means "the tunnel/backend died", i.e. retryable.
_BACKEND_ERR_MARKERS = (
    "UNAVAILABLE", "unavailable", "axon", "DEADLINE", "backend",
    "RPC", "socket closed", "connection",
)


def probe_backend(budget_s: float, probe_timeout: float = 120.0) -> dict:
    """Probe jax.devices() in a SUBPROCESS under a timeout, retrying with
    backoff until ``budget_s`` is spent. A subprocess keeps a hung/poisoned
    backend init out of this process, so a later retry can still succeed.

    Returns {"ok": bool, "platform": str|None, "attempts": n, "last_error"}.
    """
    deadline = time.monotonic() + budget_s
    interval = 20.0
    attempts = 0
    last_err = ""
    while True:
        attempts += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); print(d[0].platform, len(d))"],
                capture_output=True, text=True, timeout=probe_timeout,
            )
            if out.returncode == 0 and out.stdout.strip():
                platform = out.stdout.split()[0]
                return {"ok": True, "platform": platform,
                        "attempts": attempts, "last_error": None}
            last_err = (out.stderr or out.stdout).strip()[-400:]
        except subprocess.TimeoutExpired:
            last_err = f"probe timed out after {probe_timeout:.0f}s"
        except Exception as ex:  # pragma: no cover - host-dependent
            last_err = f"{type(ex).__name__}: {ex}"[:400]
        now = time.monotonic()
        if now + interval > deadline:
            return {"ok": False, "platform": None,
                    "attempts": attempts, "last_error": last_err}
        print(f"[bench] backend probe attempt {attempts} failed "
              f"({last_err.splitlines()[-1] if last_err else '?'}); "
              f"retrying in {interval:.0f}s", file=sys.stderr)
        time.sleep(interval)
        interval = min(interval * 2, 120.0)


def emit(value, unit, vs_baseline=None, error=None, extra=None) -> int:
    """Print the one-line JSON contract and return an exit code (always 0:
    a structured failure line is a successful bench run of a broken day)."""
    line = {
        "metric": HEADLINE_METRIC,
        "value": value,
        "unit": unit,
        "vs_baseline": vs_baseline,
    }
    if error is not None:
        line["error"] = error
    if extra:
        line.update(extra)
    print(json.dumps(line))
    return 0


def _write_detail(detail: dict) -> None:
    with open("BENCH_DETAIL.json", "w") as f:
        json.dump(detail, f, indent=2)


def run(args, t_start: float) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpu_gpad
    from tpu_gpad import problems
    from tpu_gpad.solver import solve_batch, SolverConfig
    from tpu_gpad.solver.core import resolve_engine, resolve_flat, resolve_form
    from tpu_gpad.solver.reference import gpad_solve_qp
    from tpu_gpad.utils import (
        device_time_per_call,
        device_time_percentiles,
        device_time_stats,
        interleaved_ab,
        matmul_peak_tflops,
        solve_flops,
        wall_times,
    )

    from tpu_gpad.utils import timing as _timing

    # one source of truth for the pinned anchor speed (timing.py)
    assert ANCHOR_REF_TFLOPS == _timing.ANCHOR_REF_TFLOPS
    assert ANCHOR_MAX_TFLOPS == _timing.ANCHOR_MAX_TFLOPS

    batch = 256 if args.quick else args.batch
    n_cells, horizon = 3, 10
    iters = args.iterations

    qp = tpu_gpad.condense(problems.battery(n_cells=n_cells, horizon=horizon))
    # paired half-stack layout + dual-only iteration form (form="auto")
    data = tpu_gpad.dualize(qp, iterations=max(iters, 100), paired="auto")
    rng = np.random.default_rng(0)
    X0 = jnp.asarray(rng.uniform(-0.5, 0.5, size=(batch, n_cells)).astype(np.float32))
    cfg = SolverConfig(iterations=iters, engine=args.engine)

    def routing(d, c):
        """Resolved (engine, form, flat) — every BENCH_DETAIL rate row
        carries these so the number is traceable to a code path."""
        form = resolve_form(d, c)
        return {
            "engine": resolve_engine(d, c),
            "form": form,
            "flat": bool(form == "mvp" and resolve_flat(d, c)),
            "precision": c.precision,
            "matmul_dtype": c.matmul_dtype,
        }

    detail = {
        "device": str(jax.devices()[0]),
        "engine_requested": args.engine,
        "problem": data.name,
        "n_z": data.n_z,
        "m": data.m,
        "batch": batch,
        "iterations": iters,
        "headline_routing": routing(data, cfg),
    }

    # --- headline: batched throughput, fp32, device time via slope method,
    # INTERLEAVED with a fixed dense-matmul anchor. The absolute rate is
    # reported from the same windows; the solve/anchor ratio is the
    # drift-free round-over-round regression signal (tunnel drift moves
    # both sides together and cancels in the ratio). ---
    anchor_n = 1024 if args.quick else 2048
    a = jnp.ones((anchor_n, anchor_n), dtype=jnp.float32)
    b_mat = jnp.ones((anchor_n, anchor_n), dtype=jnp.float32)
    anchor_mm = jax.jit(lambda a, b: jnp.matmul(
        a, b, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32))
    rounds = 3 if args.quick else 8
    k_large = 8 if args.quick else 22
    anchor_flops = 2 * anchor_n**3
    headline_fn = lambda: solve_batch(data, X0, config=cfg).u
    ab = interleaved_ab(
        headline_fn,
        lambda: anchor_mm(a, b_mat),
        rounds=rounds, k_large=k_large,
        # anchor windows beating the physical roofline are rejected rounds
        t_b_floor_s=anchor_flops / (ANCHOR_MAX_TFLOPS * 1e12),
    )
    if ab["rounds"] == 0 or not np.isfinite(ab["t_a_median_s"]):
        # every interleave round was gated out (the r03 contention
        # regime): the contract is a structured failure line, never a
        # NaN headline (json.dumps would emit a non-JSON NaN token)
        _write_detail({"error": "measurement_unstable",
                       "rejected_rounds": ab["rejected_rounds"],
                       "ratios_all": ab["ratios_all"]})
        return emit(None,
                    "solves/s (battery n=3 N=10, %d iters, fp32, batch %d, "
                    "%s)" % (iters, batch, args.engine),
                    error="measurement_unstable",
                    extra={"rejected_rounds": ab["rejected_rounds"]})
    t_call = ab["t_a_median_s"]
    t_anchor = ab["t_b_median_s"]
    solves_per_sec = batch / t_call
    anchor_tflops = anchor_flops / t_anchor / 1e12
    # the driver-parsed headline: solve/anchor ratio x the PINNED anchor
    # speed — drift-free round over round (same units as the raw rate;
    # equal to it exactly when the session anchor runs at the pinned 31.0).
    # The pin is calibrated for the 2048 anchor ONLY: the quick mode's 1024
    # anchor is dispatch-bound and swings 2x between sessions (measured
    # 7.7-15.6 TFLOPs), so normalizing against it fabricates a 2-4x
    # inflated headline — quick mode reports the raw rate instead (it is a
    # smoke mode, never a record).
    anchor_ref_s = anchor_flops / (ANCHOR_REF_TFLOPS * 1e12)
    solves_per_anchor = ab["ratio_b_over_a_median"] * batch
    if anchor_n == 2048:
        headline_rate = solves_per_anchor / anchor_ref_s
    else:
        headline_rate = batch / ab["t_a_median_s"]
    detail["throughput_fp32_solves_per_sec_anchor_normalized"] = headline_rate
    detail["throughput_fp32_solves_per_sec"] = solves_per_sec
    detail["throughput_fp32_interleaved"] = {
        "median_solves_per_sec": solves_per_sec,
        "anchor_normalized_solves_per_sec": headline_rate,
        # solve-batches completed per anchor-matmul time: the drift-free stat
        "solves_per_anchor_median": solves_per_anchor,
        "solves_per_anchor_iqr": ab["ratio_b_over_a_iqr"] * batch,
        "per_round_ratio_b_over_a": ab["ratios"],
        "per_round_ratio_all_incl_rejected": ab["ratios_all"],
        "rejected_rounds": ab["rejected_rounds"],
        "unstable": ab["unstable"],
        "anchor": f"matmul {anchor_n}x{anchor_n} fp32 highest",
        "anchor_tflops": anchor_tflops,
        "anchor_ref_tflops_pinned": ANCHOR_REF_TFLOPS,
        "rounds": ab["rounds"],
    }
    detail["batch_device_ms"] = t_call * 1e3

    # --- MFU accounting: achieved useful flops/s vs the chip's own measured
    # dense-matmul roofline at the SAME operand dtype + precision ---
    form = resolve_form(data, cfg)
    flat = form == "mvp" and resolve_flat(data, cfg)
    flops = solve_flops(data, iters, form, flat=flat) * batch
    peak_tflops = matmul_peak_tflops(cfg.matmul_dtype, cfg.precision)
    detail["achieved_tflops"] = flops / t_call / 1e12
    detail["matmul_peak_tflops_measured"] = peak_tflops
    detail["pct_peak"] = 100.0 * detail["achieved_tflops"] / peak_tflops
    _write_detail(detail)  # partial detail survives a later-section crash

    # --- correctness spot check vs oracle ---
    from tpu_gpad.problems.battery import default_x0

    x0 = default_x0(n_cells, seed=7)
    res = tpu_gpad.solve(data, jnp.asarray(x0, dtype=jnp.float32), config=cfg)
    ref = gpad_solve_qp(qp, x0, iterations=iters)
    u_err = float(np.abs(np.asarray(res.u[0]) - ref.u).max())
    detail["u_star_max_abs_err_vs_oracle"] = u_err
    assert u_err < 1e-4, f"u* parity broken: {u_err}"

    # --- sequential CPU oracle baseline (reference's comparison point) ---
    n_base = 3 if args.quick else 10
    t0 = time.perf_counter()
    for i in range(n_base):
        gpad_solve_qp(qp, np.asarray(X0[i % batch], dtype=np.float64), iterations=iters)
    cpu_solves_per_sec = n_base / (time.perf_counter() - t0)
    detail["cpu_oracle_solves_per_sec"] = cpu_solves_per_sec

    # --- single-solve latency: device time + client-observed (incl. tunnel) ---
    x0_dev = jnp.asarray(x0, dtype=jnp.float32)
    single = lambda: tpu_gpad.solve(data, x0_dev, config=cfg).u
    detail["single_solve_device_ms"] = device_time_per_call(single, k_large=k_large) * 1e3
    # device-side latency percentiles (the solver's own p99 — the client
    # percentiles below are dominated by the ~30 ms tunnel RPC floor and
    # cannot show solver regressions)
    pct = device_time_percentiles(single, n=20 if args.quick else 100)
    # percentiles of WINDOW-MEAN device time (per-call tails are unmeasurable
    # under the ~30 ms tunnel RPC floor; see device_time_percentiles)
    detail["single_solve_device_ms_p50_windowmean"] = (
        pct["p50_windowmean_s"] * 1e3
    )
    detail["single_solve_device_ms_p99_windowmean"] = (
        pct["p99_windowmean_s"] * 1e3
    )
    # p99 context (VERDICT r03 item 8): the committed-vs-driver r03 runs
    # differed 2.7x on this stat — it measures TUNNEL/CHIP CONTENTION
    # tails, not solver regressions. The anchor ratio below is the
    # session-weather normalizer: p99/p50 >> 1 with a normal anchor means
    # a genuinely contended session, not slower code. Stall windows
    # (slope <= 0) are rejected and counted; genuinely slow windows are
    # kept — they ARE the measurable tail.
    detail["single_solve_device_p"] = {
        "n_windows": pct["n"],
        "rejected_stall_windows": pct["rejected_windows"],
        "p99_over_p50": pct["p99_windowmean_s"] / pct["p50_windowmean_s"],
        "session_anchor_tflops": anchor_tflops,
        "anchor_ref_tflops": ANCHOR_REF_TFLOPS,
        "rule": "window-mean slope samples; stalls rejected, slow kept",
    }
    lat = wall_times(single, warmup=2, iters=10 if args.quick else 50)
    detail["single_solve_client_ms_p50"] = float(np.percentile(lat, 50) * 1e3)
    detail["single_solve_client_ms_p99"] = float(np.percentile(lat, 99) * 1e3)

    # Optional sections below: a failure (e.g. a compile timeout on the
    # tunneled chip) must not take down the headline JSON line, and the
    # whole run must finish inside the driver's window even on a cold
    # compile cache — sections are skipped once the budget is spent.
    def optional(name, fn):
        elapsed = time.perf_counter() - t_start
        if elapsed > args.time_budget:
            detail[f"{name}_skipped"] = f"time budget ({elapsed:.0f}s elapsed)"
            return
        try:
            fn()
        except Exception as ex:  # pragma: no cover - depends on the device
            detail[f"{name}_error"] = f"{type(ex).__name__}: {ex}"[:300]
        _write_detail(detail)

    def _rate(name, d, c, fn, batch_n, k=None):
        """Record a throughput row WITH its routing metadata."""
        t = device_time_per_call(fn, k_large=k or k_large)
        detail[name + "_solves_per_sec"] = batch_n / t
        detail[name + "_routing"] = routing(d, c)
        return t

    def _rate_vs_headline(name, d, c, fn, batch_n):
        """Tier row measured as a gated INTERLEAVED ratio against the
        headline config (same treatment as serving): the published rate
        is headline_rate x ratio, so every ladder row shares the
        headline's anchor normalization and a contended minute cannot
        swing a tier ±15% against the others. Raw ratio stats and
        rejected-round counts ride along."""
        # IQR-targeted autoscaling (VERDICT r04 item 6): the fast tiers'
        # sub-ms batch times made 0.15 s windows read weather (default
        # tier IQR/median up to 1.0 in the r04 record) — escalate window
        # length until the ratio resolves to ~10% or the budget is spent
        ab_t = interleaved_ab(fn, headline_fn,
                              rounds=max(rounds // 2, 3), k_large=k_large,
                              iqr_rel_target=0.10,
                              autoscale_max_s=45.0)
        if ab_t["rounds"] == 0:
            detail[name + "_solves_per_sec"] = None
            detail[name + "_vs_headline"] = {"unstable": True,
                                             "rejected_rounds":
                                             ab_t["rejected_rounds"]}
            return
        detail[name + "_solves_per_sec"] = (
            headline_rate * ab_t["ratio_b_over_a_median"])
        detail[name + "_vs_headline"] = {
            "speedup_median": ab_t["ratio_b_over_a_median"],
            "speedup_iqr": ab_t["ratio_b_over_a_iqr"],
            "rejected_rounds": ab_t["rejected_rounds"],
            "unstable": ab_t["unstable"],
            # IQR/median > 0.25: the rounds disagree too much to read a
            # ±15% tier difference off this session — treat as weather
            "wide_variance": bool(
                ab_t["ratio_b_over_a_iqr"]
                > 0.25 * ab_t["ratio_b_over_a_median"]
            ),
        }
        detail[name + "_routing"] = routing(d, c)

    def _fast_modes():
        # the precision ladder (docs/DESIGN.md section 8): "high" = 3-pass
        # bf16x3 fp32 (2x the MXU rate of "highest", u* within a few e-3);
        # "default" = 1-pass bf16 (~1e-2); bf16 operands the loosest
        cfg_high = SolverConfig(iterations=iters, engine=args.engine, precision="high")
        _rate_vs_headline("throughput_high_precision", data, cfg_high,
                          lambda: solve_batch(data, X0, config=cfg_high).u,
                          batch)
        cfg_fast = SolverConfig(iterations=iters, engine=args.engine, precision="default")
        _rate_vs_headline("throughput_fast_precision", data, cfg_fast,
                          lambda: solve_batch(data, X0, config=cfg_fast).u,
                          batch)
        cfg_bf16 = SolverConfig(iterations=iters, engine=args.engine, matmul_dtype="bfloat16")
        _rate_vs_headline("throughput_bf16", data, cfg_bf16,
                          lambda: solve_batch(data, X0, config=cfg_bf16).u,
                          batch)

    def _serving_mode():
        # diagnostics=False: residual-free serving — the kernels drop their
        # w/zhat diagnostic outputs (u/z/y bit-identical, residual/gap NaN).
        # Measured as a gated INTERLEAVED ratio against the headline config
        # and reported as headline_rate x ratio: the claim is "within
        # tunnel noise of fixed", so the ratio IS the result, and a
        # contended session can no longer fabricate an absolute serving
        # rate 7.8x the headline (the r03 driver run's 53M row).
        cfg_srv = SolverConfig(iterations=iters, engine=args.engine,
                               diagnostics=False)
        ab_srv = interleaved_ab(
            lambda: solve_batch(data, X0, config=cfg_srv).u,
            headline_fn, rounds=max(rounds // 2, 3), k_large=k_large,
        )
        if ab_srv["rounds"] == 0:  # fully gated out: null, never NaN
            detail["throughput_serving_solves_per_sec"] = None
            detail["throughput_serving_vs_fixed"] = {
                "unstable": True,
                "rejected_rounds": ab_srv["rejected_rounds"],
            }
            return
        detail["throughput_serving_solves_per_sec"] = (
            headline_rate * ab_srv["ratio_b_over_a_median"])
        detail["throughput_serving_vs_fixed"] = {
            "speedup_median": ab_srv["ratio_b_over_a_median"],
            "speedup_iqr": ab_srv["ratio_b_over_a_iqr"],
            "rejected_rounds": ab_srv["rejected_rounds"],
            "unstable": ab_srv["unstable"],
        }
        detail["throughput_serving_routing"] = routing(data, cfg_srv)

    def _xla_engine():
        cfg_xla = SolverConfig(iterations=iters, engine="xla")
        _rate_vs_headline("throughput_xla_engine", data, cfg_xla,
                          lambda: solve_batch(data, X0, config=cfg_xla).u,
                          batch)

    def _eps_restart():
        # adaptive restart: eps-mode throughput at a real accuracy target
        data_eps = tpu_gpad.dualize(qp, iterations=2000, paired="auto")
        kw = dict(mode="eps", eps_g=1e-5, eps_V=1e-5, check_every=10,
                  iterations=2000)
        cfg_re = SolverConfig(restart=True, engine=args.engine, **kw)
        res_re = solve_batch(data_eps, X0, config=cfg_re)
        detail["eps1e5_restart_max_iterations"] = int(
            np.max(np.asarray(res_re.iterations)))
        detail["eps1e5_restart_all_converged"] = bool(
            np.all(np.asarray(res_re.converged)))
        _rate("eps1e5_restart", data_eps, cfg_re,
              lambda: solve_batch(data_eps, X0, config=cfg_re).u, batch, k=8)

    def _long_horizon():
        # long horizon N=50 (BASELINE config 2). At this size the dual
        # matmul is MXU-bound, so the 1-pass precision mode is ~3x.
        qp50 = tpu_gpad.condense(problems.battery(n_cells=n_cells, horizon=50))
        data50 = tpu_gpad.dualize(qp50, iterations=max(iters, 100), paired="auto")
        X0_50 = X0[:1024]
        t50 = _rate("long_horizon_N50", data50, cfg,
                    lambda: solve_batch(data50, X0_50, config=cfg).u,
                    X0_50.shape[0], k=10)
        form50 = resolve_form(data50, cfg)
        flat50 = form50 == "mvp" and resolve_flat(data50, cfg)
        f50 = solve_flops(data50, iters, form50, flat=flat50)
        detail["long_horizon_N50_achieved_tflops"] = (
            f50 * X0_50.shape[0] / t50 / 1e12
        )
        detail["long_horizon_N50_pct_peak"] = (
            100.0 * detail["long_horizon_N50_achieved_tflops"] / peak_tflops
        )
        cfg50h = SolverConfig(iterations=iters, engine=args.engine,
                              precision="high")
        _rate("long_horizon_N50_high_precision", data50, cfg50h,
              lambda: solve_batch(data50, X0_50, config=cfg50h).u,
              X0_50.shape[0], k=10)
        cfg50f = SolverConfig(iterations=iters, engine=args.engine,
                              precision="default")
        _rate("long_horizon_N50_fast_precision", data50, cfg50f,
              lambda: solve_batch(data50, X0_50, config=cfg50f).u,
              X0_50.shape[0], k=10)

    optional("fast_modes", _fast_modes)
    optional("serving_mode", _serving_mode)
    optional("xla_engine", _xla_engine)
    if not args.quick:
        optional("eps_restart", _eps_restart)
        optional("long_horizon", _long_horizon)

    # --- cross-stat sanity: physically-ordered rates. Violations are
    # FLAGGED in the output (and the offending row nulled), never shipped
    # as numbers — a reader of BENCH_DETAIL must not have to know which
    # rows a contended tunnel can corrupt. ---
    # All cross-stat checks compare the INTERLEAVED speedup ratios vs the
    # shared headline config — unit-free and drift-free by construction
    # (every tier and serving measured against the same A side), so a
    # session drifting between sections cannot false-flag.
    flags = []

    def _ratio(key):
        d = detail.get(key) or {}
        return d.get("speedup_median")

    srv_r = _ratio("throughput_serving_vs_fixed")
    fast_r = _ratio("throughput_fast_precision_vs_headline")
    high_r = _ratio("throughput_high_precision_vs_headline")
    # serving is bit-identical HIGHEST-precision work: it cannot beat the
    # 1-pass default tier, nor sit far above the fixed headline (the r03
    # failure mode this guards was 7.8x).
    if srv_r is not None and fast_r is not None and srv_r > fast_r * 1.25:
        flags.append("serving_exceeds_default_tier")
        detail["throughput_serving_solves_per_sec"] = None
    if srv_r is not None and srv_r > 1.5:
        flags.append("serving_far_above_headline")
        detail["throughput_serving_solves_per_sec"] = None
    # precision ladder must be monotone: highest <= high(3-pass) <= default
    if high_r is not None and fast_r is not None and high_r > fast_r * 1.15:
        flags.append("precision_ladder_inverted_high_vs_default")
    if high_r is not None and high_r < 0.8:
        flags.append("high_tier_below_highest")
    if ab["unstable"]:
        flags.append("headline_interleave_unstable")
    detail["sanity_flags"] = flags

    _write_detail(detail)
    unit_kind = (
        "anchor-normalized" if anchor_n == 2048 else "raw (quick mode)"
    )
    return emit(
        round(headline_rate, 1),
        "solves/s %s (battery n=3 N=10, %d iters, fp32, "
        "batch %d, %s)" % (unit_kind, iters, batch, args.engine),
        vs_baseline=round(headline_rate / cpu_solves_per_sec, 1),
        extra={
            "raw_solves_per_sec": round(solves_per_sec, 1),
            "anchor_tflops_session": round(anchor_tflops, 2),
            "rejected_rounds": ab["rejected_rounds"],
            "sanity_flags": flags,
        },
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument("--iterations", type=int, default=100)
    parser.add_argument("--engine", default="pallas", choices=["xla", "pallas"])
    parser.add_argument(
        "--time-budget", type=float, default=900.0,
        help="skip remaining OPTIONAL sections once this many seconds have "
             "elapsed (tunnel compiles are 30s-10min; the headline metric "
             "always completes)",
    )
    parser.add_argument(
        "--probe-budget", type=float, default=480.0,
        help="seconds to spend probing/retrying a dead backend before "
             "emitting the structured tpu_unavailable line",
    )
    parser.add_argument(
        "--no-probe", action="store_true",
        help="skip the subprocess backend probe (CI/CPU smoke runs)",
    )
    args = parser.parse_args()
    t_start = time.perf_counter()
    unit = ("solves/s (battery n=3 N=10, %d iters, fp32, batch %d, %s)"
            % (args.iterations, 256 if args.quick else args.batch, args.engine))

    probe = {"ok": True, "platform": "unprobed", "attempts": 0}
    if not args.no_probe:
        probe = probe_backend(args.probe_budget)
        if not probe["ok"]:
            _write_detail({"error": "tpu_unavailable", "probe": probe})
            return emit(None, unit, error="tpu_unavailable",
                        extra={"probe_attempts": probe["attempts"],
                               "probe_last_error": probe["last_error"]})

    attempts = 2
    for attempt in range(attempts):
        try:
            return run(args, t_start)
        except Exception as ex:
            traceback.print_exc()
            msg = f"{type(ex).__name__}: {ex}"
            retryable = any(m in msg for m in _BACKEND_ERR_MARKERS)
            if retryable and attempt + 1 < attempts:
                print("[bench] backend error mid-run; re-probing and "
                      "retrying once", file=sys.stderr)
                reprobe = probe_backend(min(args.probe_budget, 300.0))
                if reprobe["ok"]:
                    continue
                return emit(None, unit, error="tpu_unavailable",
                            extra={"mid_run_error": msg[:300]})
            _write_detail({"error": msg[:1000]})
            return emit(None, unit, error=msg[:300])


if __name__ == "__main__":
    sys.exit(main())
