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
    for _ in range(repeats):
        t_small = _run_chain(fn, k_small)
        t_large = _run_chain(fn, k_large)
        best = min(best, (t_large - t_small) / (k_large - k_small))
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
    distinguishable). Returns ``{"median_s", "iqr_s", "n", "samples_s"}``."""
    _run_chain(fn, 2)  # warm up compile + caches
    t_probe = _run_chain(fn, k_large) / k_large
    if t_probe * (k_large - k_small) < min_window_s:
        k_large = k_small + max(int(min_window_s / max(t_probe, 1e-7)), 20)
        k_large = min(k_large, 20000)
    samples = []
    for _ in range(n):
        t_small = _run_chain(fn, k_small)
        t_large = _run_chain(fn, k_large)
        samples.append(max((t_large - t_small) / (k_large - k_small), 1e-9))
    s = np.asarray(samples)
    q1, q3 = np.percentile(s, [25, 75])
    return {
        "median_s": float(np.median(s)),
        "iqr_s": float(q3 - q1),
        "n": int(n),
        "samples_s": [float(x) for x in s],
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
        "n": int(n),
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
) -> dict:
    """Drift-cancelling A/B comparison: alternate slope-method windows.

    Absolute device rates through the tunnel drift ±10% (and occasionally
    2×) within a session, so sequential readings of A then B fabricate
    wins. Alternating A/B windows and reporting per-round ratios cancels
    the drift — both sides see the same chip/tunnel state each round.

    Returns ``{"ratio_b_over_a_median", "ratio_b_over_a_iqr", "ratios",
    "t_a_median_s", "t_b_median_s", "rounds"}``. ratio > 1 means A is
    faster (B takes longer). Both fns must return a jax array that forces
    the computation (e.g. ``res.u``, never a SolveResult)."""
    _run_chain(fn_a, 2)
    _run_chain(fn_b, 2)
    ka = _sized_k_large(fn_a, k_small, k_large, min_window_s)
    kb = _sized_k_large(fn_b, k_small, k_large, min_window_s)
    t_as, t_bs, ratios = [], [], []
    for _ in range(rounds):
        ta = max((_run_chain(fn_a, ka) - _run_chain(fn_a, k_small))
                 / (ka - k_small), 1e-9)
        tb = max((_run_chain(fn_b, kb) - _run_chain(fn_b, k_small))
                 / (kb - k_small), 1e-9)
        t_as.append(ta)
        t_bs.append(tb)
        ratios.append(tb / ta)
    r = np.asarray(ratios)
    q1, q3 = np.percentile(r, [25, 75])
    return {
        "ratio_b_over_a_median": float(np.median(r)),
        "ratio_b_over_a_iqr": float(q3 - q1),
        "ratios": [float(x) for x in r],
        "t_a_median_s": float(np.median(t_as)),
        "t_b_median_s": float(np.median(t_bs)),
        "rounds": int(rounds),
    }


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
