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
