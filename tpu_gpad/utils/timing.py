"""Walltime measurement that survives high-latency device tunnels.

This replaces the reference's ``gettimeofday``-around-``cudaDeviceSynchronize``
brackets (``main.cu:161-174``). On a tunneled TPU (axon relay) a host
round-trip costs tens of milliseconds and ``block_until_ready`` can return
before compute finishes, so naive per-call timing measures only RPC floor.
``device_time_per_call`` instead times K in-order dispatches followed by one
host read-back (device executes launches in order), for two values of K, and
takes the slope — the fixed RPC cost cancels exactly.
"""

from __future__ import annotations

import time

import numpy as np


def _run_chain(fn, k: int) -> float:
    """Dispatch fn() k times, force completion with one host read, return s."""
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = fn()
    np.asarray(out.ravel()[0] if hasattr(out, "ravel") else out)
    return time.perf_counter() - t0


def device_time_per_call(
    fn,
    k_small: int = 2,
    k_large: int = 22,
    repeats: int = 3,
    min_window_s: float = 0.15,
) -> float:
    """Per-call device execution time of ``fn`` in seconds (slope method).

    ``fn`` must return a jax array whose first element forces the whole
    computation (true for any solver output). ``k_large`` is scaled up
    adaptively so the measured window is at least ``min_window_s`` — with a
    ~30 ms tunnel RPC floor, a window shorter than that is pure noise."""
    _run_chain(fn, 2)  # warm up compile + caches
    t_probe = _run_chain(fn, k_large) / k_large
    if t_probe * (k_large - k_small) < min_window_s:
        k_large = k_small + max(int(min_window_s / max(t_probe, 1e-7)), 20)
        k_large = min(k_large, 20000)
    best = np.inf
    good = 0
    for _ in range(2 * repeats):
        if good == repeats:
            break
        t_small = _run_chain(fn, k_small)
        t_large = _run_chain(fn, k_large)
        slope = (t_large - t_small) / (k_large - k_small)
        if slope <= 0:  # tunnel stall hit the small window; not a timing
            continue
        best = min(best, slope)
        good += 1
    if not np.isfinite(best):  # all windows stalled
        best = t_large / k_large
    return float(max(best, 1e-9))


def device_time_stats(
    fn,
    n: int = 5,
    k_small: int = 2,
    k_large: int = 22,
    min_window_s: float = 0.15,
) -> dict:
    """Median-of-n slope-method timing with spread, for round-over-round
    benchmark comparability (a single min-of-3 reading on the tunneled chip
    drifts ~5% run to run; the median + IQR makes drift vs regression
    distinguishable).

    A slope window whose large-minus-small difference comes out <= 0 (a
    tunnel stall landed on the small window) is physically meaningless —
    the old clamp-to-1e-9 fabricated infinite rates under contention
    (round-3 driver run: a per-round ratio of 988219). Such windows are
    REJECTED and re-sampled (up to ``2n`` total attempts) and counted in
    ``rejected``. Returns ``{"median_s", "iqr_s", "n", "samples_s",
    "rejected"}``."""
    _run_chain(fn, 2)  # warm up compile + caches
    t_probe = _run_chain(fn, k_large) / k_large
    if t_probe * (k_large - k_small) < min_window_s:
        k_large = k_small + max(int(min_window_s / max(t_probe, 1e-7)), 20)
        k_large = min(k_large, 20000)
    samples = []
    rejected = 0
    for _ in range(2 * n):
        if len(samples) == n:
            break
        t_small = _run_chain(fn, k_small)
        t_large = _run_chain(fn, k_large)
        slope = (t_large - t_small) / (k_large - k_small)
        if slope <= 0:
            rejected += 1
            continue
        samples.append(slope)
    if not samples:  # every window stalled: report the stall, loudly
        samples = [max(t_large / k_large, 1e-9)]
    s = np.asarray(samples)
    q1, q3 = np.percentile(s, [25, 75])
    return {
        "median_s": float(np.median(s)),
        "iqr_s": float(q3 - q1),
        "n": int(len(samples)),
        "samples_s": [float(x) for x in s],
        "rejected": int(rejected),
        "window_calls": int(k_large - k_small),
    }


def device_time_percentiles(
    fn, n: int = 100, min_window_s: float = 0.05
) -> dict:
    """Device-side latency percentiles: ``n`` independent slope-method
    samples of per-call device time. The client-observed p99 through the
    axon tunnel is dominated by the ~30 ms RPC floor and says nothing about
    the solver; this measures the device execution time distribution itself
    (BASELINE.md "p99 solve latency" done right).

    MEASUREMENT SEMANTICS: each sample is a *window mean* over the
    (k_large - k_small) chained calls of one slope window, so the reported
    percentiles are of window-mean device time. Averaging inside the window
    suppresses single-call tail latency — a true per-call p99 would need
    per-call host syncs, which the ~30 ms tunnel RPC floor makes impossible
    to measure below ~30 ms here. For a jitted solve with static shapes the
    device execution time is near-deterministic, so window-mean percentiles
    track cross-window (chip/tunnel contention) variation, which is the
    tail that exists on this path. Keys are suffixed ``_windowmean_s`` to
    keep the distinction visible; ``window_calls`` reports the averaging
    width."""
    stats = device_time_stats(fn, n=n, min_window_s=min_window_s)
    s = np.asarray(stats["samples_s"])
    return {
        "p50_windowmean_s": float(np.percentile(s, 50)),
        "p90_windowmean_s": float(np.percentile(s, 90)),
        "p99_windowmean_s": float(np.percentile(s, 99)),
        "n": int(stats["n"]),
        # non-positive-slope windows (tunnel stalls) rejected and resampled;
        # genuinely SLOW windows are kept — they ARE the measurable tail
        "rejected_windows": int(stats["rejected"]),
        "window_calls": int(stats["window_calls"]),
    }


def _sized_k_large(fn, k_small: int, k_large: int, min_window_s: float) -> int:
    t_probe = _run_chain(fn, k_large) / k_large
    if t_probe * (k_large - k_small) < min_window_s:
        k_large = k_small + max(int(min_window_s / max(t_probe, 1e-7)), 20)
        k_large = min(k_large, 20000)
    return k_large


def interleaved_ab(
    fn_a,
    fn_b,
    rounds: int = 8,
    k_small: int = 2,
    k_large: int = 22,
    min_window_s: float = 0.15,
    t_a_floor_s: float = 0.0,
    t_b_floor_s: float = 0.0,
    gate_band: float = 3.0,
    iqr_rel_target: "float | None" = None,
    autoscale_max_s: float = 120.0,
) -> dict:
    """Drift-cancelling A/B comparison: alternate slope-method windows.

    Absolute device rates through the tunnel drift ±10% (and occasionally
    2×) within a session, so sequential readings of A then B fabricate
    wins. Alternating A/B windows and reporting per-round ratios cancels
    the drift — both sides see the same chip/tunnel state each round.

    VALIDITY GATING (the round-3 lesson): under heavy tunnel contention a
    slope window can come out ~zero or negative — the old clamp produced a
    per-round ratio of 988219 and a fabricated 53M solves/s serving rate
    in the driver's r03 run. A round is REJECTED (never silently used)
    when any of:

    - either slope is <= 0 (stall landed on the small window);
    - either side is faster than its physical floor (``t_a_floor_s`` /
      ``t_b_floor_s``, e.g. the anchor matmul at the chip's measured
      roofline — a faster reading is impossible, not lucky);
    - either side deviates from its own cross-round median by more than
      ``gate_band``x in either direction, or the ratio deviates from the
      cross-round median ratio by more than ``gate_band``x (medians over
      the floor-valid rounds are robust to <= half the rounds being
      garbage).

    Rejected rounds are replaced (up to ``2*rounds`` window pairs total)
    and counted in ``rejected_rounds``; ``unstable`` is set when fewer
    than ``max(3, rounds//2)`` valid rounds survive — treat the numbers
    as weather, not measurements, when it is.

    RESOLUTION AUTOSCALING (the round-4 lesson: the official record's
    precision tiers carried IQR/median up to 1.0 — wide-variance-marked
    numbers that cannot catch a regression): pass ``iqr_rel_target``
    (e.g. 0.10) and the measurement ESCALATES — 3x longer windows and
    more rounds per pass — until the surviving-ratio IQR/median meets the
    target or ``autoscale_max_s`` of wall clock is spent. The returned
    dict then carries ``autoscale_passes`` and ``autoscale_window_s``;
    check ``ratio_b_over_a_iqr`` against your target yourself — a result
    that still misses it after the budget is honest weather, not a
    measurement.

    Returns ``{"ratio_b_over_a_median", "ratio_b_over_a_iqr", "ratios",
    "ratios_all", "t_a_median_s", "t_b_median_s", "rounds",
    "rejected_rounds", "unstable"}``. ratio > 1 means A is faster (B
    takes longer). Both fns must return a jax array that forces the
    computation (e.g. ``res.u``, never a SolveResult)."""
    import time as _time

    t_start = _time.perf_counter()

    def one_pass(win_s, n_rounds):
        _run_chain(fn_a, 2)
        _run_chain(fn_b, 2)
        ka = _sized_k_large(fn_a, k_small, k_large, win_s)
        kb = _sized_k_large(fn_b, k_small, k_large, win_s)
        raw = []  # (ta, tb) with None for slope-invalid sides
        for attempt in range(2 * n_rounds):
            # stop when `rounds` rounds survive the FULL gate (floor +
            # band): band-rejected rounds consume attempt budget and get
            # replaced too, not just floor-rejected ones
            if (
                len(raw) >= n_rounds
                and _gate_ab_rounds(raw, n_rounds, gate_band)["rounds"]
                >= n_rounds
            ):
                break
            ta = (
                _run_chain(fn_a, ka) - _run_chain(fn_a, k_small)
            ) / (ka - k_small)
            tb = (
                _run_chain(fn_b, kb) - _run_chain(fn_b, k_small)
            ) / (kb - k_small)
            raw.append(
                (
                    ta if ta > max(t_a_floor_s, 0.0) else None,
                    tb if tb > max(t_b_floor_s, 0.0) else None,
                )
            )
        return _gate_ab_rounds(raw, n_rounds, gate_band)

    win, n_rounds, passes = min_window_s, rounds, 0
    best = None
    while True:
        res = one_pass(win, n_rounds)
        passes += 1
        med = res["ratio_b_over_a_median"]
        rel = (
            res["ratio_b_over_a_iqr"] / abs(med)
            if res["rounds"] > 0 and med
            else float("inf")
        )
        if best is None or rel < best[0]:
            best = (rel, res, win)
        if (
            iqr_rel_target is None
            or best[0] <= iqr_rel_target
            or _time.perf_counter() - t_start > autoscale_max_s
        ):
            break
        win, n_rounds = win * 3.0, max(n_rounds, rounds + 2)
    _, res, win_used = best
    if iqr_rel_target is not None:
        res["autoscale_passes"] = passes
        res["autoscale_window_s"] = win_used
    return res


def _gate_ab_rounds(raw, rounds: int, gate_band: float = 3.0) -> dict:
    """Pure gating/aggregation step of ``interleaved_ab`` (unit-testable:
    feed it the raw (ta, tb) window pairs — including the round-3 driver
    run's garbage — and assert what survives). ``raw`` entries use None
    for a side whose slope failed the floor/positivity check."""
    pairs = [p for p in raw if p[0] is not None and p[1] is not None]
    n_attempted = len(raw)
    if not pairs:  # hopeless weather; return a loud, unusable result
        return {
            "ratio_b_over_a_median": float("nan"),
            "ratio_b_over_a_iqr": float("nan"),
            "ratios": [],
            "ratios_all": [],
            "t_a_median_s": float("nan"),
            "t_b_median_s": float("nan"),
            "rounds": 0,
            "rounds_attempted": n_attempted,
            "rejected_rounds": n_attempted,
            "unstable": True,
        }
    t_as = np.asarray([p[0] for p in pairs])
    t_bs = np.asarray([p[1] for p in pairs])
    ratios_all = t_bs / t_as
    med_a, med_b = np.median(t_as), np.median(t_bs)
    med_r = np.median(ratios_all)
    keep = (
        (t_as > med_a / gate_band)
        & (t_as < med_a * gate_band)
        & (t_bs > med_b / gate_band)
        & (t_bs < med_b * gate_band)
        & (ratios_all > med_r / gate_band)
        & (ratios_all < med_r * gate_band)
    )
    r = ratios_all[keep]
    n_valid = int(keep.sum())
    if n_valid == 0:  # medians themselves corrupted; nothing trustworthy
        return {
            "ratio_b_over_a_median": float("nan"),
            "ratio_b_over_a_iqr": float("nan"),
            "ratios": [],
            "ratios_all": [float(x) for x in ratios_all],
            "t_a_median_s": float("nan"),
            "t_b_median_s": float("nan"),
            "rounds": 0,
            "rounds_attempted": n_attempted,
            "rejected_rounds": n_attempted,
            "unstable": True,
        }
    q1, q3 = np.percentile(r, [25, 75])
    return {
        "ratio_b_over_a_median": float(np.median(r)),
        "ratio_b_over_a_iqr": float(q3 - q1),
        "ratios": [float(x) for x in r],
        "ratios_all": [float(x) for x in ratios_all],
        "t_a_median_s": float(np.median(t_as[keep])),
        "t_b_median_s": float(np.median(t_bs[keep])),
        "rounds": n_valid,
        "rounds_attempted": n_attempted,
        "rejected_rounds": n_attempted - n_valid,
        "unstable": bool(n_valid < max(3, rounds // 2)),
    }


# The chip's measured fp32-highest dense-matmul roofline (v5e via axon;
# AB_FLAGSHIP.json roofline decomposition — every clean committed bench run
# reproduces ~31). Anchor-NORMALIZED rates multiply the drift-free
# solve/anchor ratio by this pinned speed so round-over-round numbers
# compare solver code, not tunnel weather. Chip-specific by design.
ANCHOR_REF_TFLOPS = 31.0
# 1.5x the roofline: an anchor window faster than this is physically
# impossible on this chip — the round is rejected, not recorded.
ANCHOR_MAX_TFLOPS = 46.5


def anchored_throughput(
    fn,
    batch: int,
    rounds: int = 8,
    k_large: int = 22,
    anchor_n: int = 2048,
    min_window_s: float = 0.15,
    iqr_rel_target: "float | None" = None,
    autoscale_max_s: float = 120.0,
) -> dict:
    """Throughput of ``fn`` measured INTERLEAVED against the pinned
    fp32-highest anchor matmul, with validity gating (``interleaved_ab``).

    Returns the gated A/B dict plus ``solves_per_sec_anchor_normalized``
    (the drift-free, round-over-round-comparable stat),
    ``solves_per_sec_raw``, ``anchor_tflops`` (this session's anchor
    speed — weather context), and ``iqr_rel`` (ratio IQR / median)."""
    import jax
    import jax.numpy as jnp

    a = jnp.ones((anchor_n, anchor_n), dtype=jnp.float32)
    mm = jax.jit(
        lambda x, y: jnp.matmul(
            x, y, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    )
    anchor_flops = 2 * anchor_n**3
    ab = interleaved_ab(
        fn,
        lambda: mm(a, a),
        rounds=rounds,
        k_large=k_large,
        min_window_s=min_window_s,
        t_b_floor_s=anchor_flops / (ANCHOR_MAX_TFLOPS * 1e12),
        iqr_rel_target=iqr_rel_target,
        autoscale_max_s=autoscale_max_s,
    )
    out = dict(ab)
    out["anchor_n"] = anchor_n
    anchor_ref_s = anchor_flops / (ANCHOR_REF_TFLOPS * 1e12)
    if ab["rounds"]:
        out["anchor_tflops"] = anchor_flops / ab["t_b_median_s"] / 1e12
        out["solves_per_sec_raw"] = batch / ab["t_a_median_s"]
        out["solves_per_sec_anchor_normalized"] = (
            ab["ratio_b_over_a_median"] * batch / anchor_ref_s
        )
        out["iqr_rel"] = (
            ab["ratio_b_over_a_iqr"] / ab["ratio_b_over_a_median"]
        )
    else:
        for k in ("anchor_tflops", "solves_per_sec_raw",
                  "solves_per_sec_anchor_normalized", "iqr_rel"):
            out[k] = float("nan")
    return out


def matmul_peak_tflops(
    dtype: str = "float32",
    precision: str = "highest",
    size: int = 4096,
    repeats: int = 5,
) -> float:
    """Measured dense-matmul roofline on THIS chip at the given operand
    dtype/precision — the denominator for honest %-of-peak accounting
    (public spec-sheet peaks mix precisions; a (size, size)^2 matmul at the
    solver's own matmul settings is the attainable ceiling).

    Uses the MEDIAN of ``repeats`` slope-method samples: a min-of-samples
    estimate is biased fast by tunnel timing noise (one bad sample once
    reported a physically impossible 311 TFLOP/s for the 3-pass tier,
    whose true ceiling here is ~64)."""
    import jax
    import jax.numpy as jnp

    mm_dtype = jnp.dtype(dtype)
    prec = (
        jax.lax.Precision(precision.lower())
        if mm_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    a = jnp.ones((size, size), dtype=mm_dtype)
    b = jnp.ones((size, size), dtype=mm_dtype)

    @jax.jit
    def mm(a, b):
        return jnp.matmul(
            a, b, precision=prec, preferred_element_type=jnp.float32
        )

    stats = device_time_stats(lambda: mm(a, b), n=repeats)
    return float(2 * size**3 / stats["median_s"] / 1e12)


def wall_times(fn, warmup: int = 2, iters: int = 20) -> np.ndarray:
    """End-to-end wall times per call including host/tunnel overhead (what a
    remote client of a serving deployment would observe)."""
    for _ in range(warmup):
        out = fn()
        np.asarray(out.ravel()[0] if hasattr(out, "ravel") else out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out.ravel()[0] if hasattr(out, "ravel") else out)
        ts.append(time.perf_counter() - t0)
    return np.asarray(ts)
