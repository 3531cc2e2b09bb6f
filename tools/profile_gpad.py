"""Profiling & validation harness (the reference's ``main_prof.cu`` role).

Reference behavior being reproduced (SURVEY.md C6):
- per-step timing matrix over problem sizes (``acceldualgrad.m:41-58``
  returns ``avg_alg_times``; cookbook p.5 Fig. 3 plots it);
- a sweep study writing per-configuration timings to a file
  (``main_prof.cu:330-357`` sweeps thread counts into ``block_times.txt`` —
  the TPU analogue sweeps the scenario batch size, the knob that controls
  MXU occupancy here);
- golden-fixture validation of the step kernels (``main_prof.cu:100-171``).

Usage:
    python tools/profile_gpad.py steps   [--sizes 3x4 10x15 ...]
    python tools/profile_gpad.py sweep   [--out sweep_times.json]
    python tools/profile_gpad.py validate
    python tools/profile_gpad.py trace --out /tmp/trace  (jax.profiler)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _setup():
    import os

    import jax

    # a sitecustomize pre-imports jax before env vars are read; honor
    # JAX_PLATFORMS explicitly so `JAX_PLATFORMS=cpu python tools/...` works
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    import tpu_gpad
    from tpu_gpad import problems

    return jax, jnp, tpu_gpad, problems


def profile_steps(sizes, iterations=100):
    """Per-step device timings (batched, batch=1024) per problem size."""
    jax, jnp, tpu_gpad, problems = _setup()
    from tpu_gpad.utils import device_time_per_call
    from tpu_gpad.solver.core import affine_params, SolverConfig, solve_batch

    B = 1024
    rows = []
    for n, N in sizes:
        qp = tpu_gpad.condense(problems.battery(n_cells=n, horizon=N))
        data = tpu_gpad.dualize(qp, iterations=iterations)
        rng = np.random.default_rng(0)
        X0 = jnp.asarray(rng.uniform(-0.4, 0.4, (B, n)).astype(np.float32))
        g_P, p_D = affine_params(data, X0)
        y = jnp.zeros((B, data.m));  w = jnp.zeros((B, data.m))
        zhat = jnp.zeros((B, data.n_z)); z = jnp.zeros((B, data.n_z))

        s1 = jax.jit(lambda y, yp: y + 0.5 * (y - yp))
        s2 = jax.jit(lambda w, gP: -(w @ data.MG_T) - gP)
        s3 = jax.jit(lambda z, zh: 0.97 * z + 0.03 * zh)
        s4 = jax.jit(lambda w, zh, pD: jnp.maximum(w + zh @ data.GL_T + pD, 0.0))
        t1 = device_time_per_call(lambda: s1(y, y))
        t2 = device_time_per_call(lambda: s2(w, g_P))
        t3 = device_time_per_call(lambda: s3(z, zhat))
        t4 = device_time_per_call(lambda: s4(w, zhat, p_D))
        t_full = device_time_per_call(
            lambda: solve_batch(data, X0, config=SolverConfig(iterations=iterations)).u
        )
        row = dict(
            n_u=n, N=N, m=data.m, n_z=data.n_z, batch=B,
            step1_us=t1 * 1e6, step2_us=t2 * 1e6, step3_us=t3 * 1e6,
            step4_us=t4 * 1e6,
            full_solve_us=t_full * 1e6,
            per_iteration_us=t_full / iterations * 1e6,
        )
        rows.append(row)
        print(
            "n_u=%2d N=%2d m=%4d | step1 %7.1fus step2 %7.1fus step3 %7.1fus "
            "step4 %7.1fus | full(%d it) %9.1fus" % (
                n, N, data.m, row["step1_us"], row["step2_us"],
                row["step3_us"], row["step4_us"], iterations,
                row["full_solve_us"],
            )
        )
    return rows


def profile_sweep(out, batches=(64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384)):
    """Throughput vs batch size (the occupancy knob) for all engine/form
    combos; writes the table to ``out`` (block_times.txt analogue)."""
    jax, jnp, tpu_gpad, problems = _setup()
    from tpu_gpad.utils import device_time_per_call
    from tpu_gpad.solver import SolverConfig, solve_batch

    qp = tpu_gpad.condense(problems.battery(n_cells=3, horizon=10))
    data = tpu_gpad.dualize(qp, iterations=100, paired="auto")
    rng = np.random.default_rng(0)
    rows = []
    combos = [("xla", "dual"), ("xla", "mvp"), ("pallas", "dual"), ("pallas", "mvp")]
    for B in batches:
        X0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 3)).astype(np.float32))
        for eng, form in combos:
            cfg = SolverConfig(iterations=100, engine=eng, form=form)
            t = device_time_per_call(lambda: solve_batch(data, X0, config=cfg).u)
            rows.append(dict(batch=B, engine=eng, form=form,
                             us_per_batch=t * 1e6, solves_per_sec=B / t))
            print(f"batch={B:6d} {eng:6s}/{form:4s}: {t*1e6:9.1f} us  "
                  f"{B/t:12.0f} solves/s")
    Path(out).write_text(json.dumps(rows, indent=2))
    print(f"wrote {out}")
    return rows


def validate():
    """Golden-fixture validation: reference step3 fixtures + oracle-generated
    step1/2/4 goldens through the native and jax paths."""
    import subprocess

    code = subprocess.call(
        [sys.executable, "-m", "pytest", "tests/test_fixtures.py",
         "tests/test_native.py", "tests/test_pallas.py", "-q"],
        cwd=Path(__file__).resolve().parent.parent,
    )
    print("VALIDATION", "PASSED" if code == 0 else "FAILED")
    return code


def trace(out):
    jax, jnp, tpu_gpad, problems = _setup()
    from tpu_gpad.solver import SolverConfig, solve_batch

    qp = tpu_gpad.condense(problems.battery(n_cells=3, horizon=10))
    data = tpu_gpad.dualize(qp, iterations=100, paired="auto")
    X0 = jnp.asarray(np.random.default_rng(0).uniform(-0.4, 0.4, (4096, 3)),
                     dtype=jnp.float32)
    cfg = SolverConfig(iterations=100)
    jax.block_until_ready(solve_batch(data, X0, config=cfg).u)  # warm up
    with jax.profiler.trace(out):
        for _ in range(5):
            jax.block_until_ready(solve_batch(data, X0, config=cfg).u)
    print(f"trace written to {out}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_steps = sub.add_parser("steps")
    p_steps.add_argument("--sizes", nargs="*", default=["3x4", "4x3", "10x15", "15x10", "30x30"])
    p_sweep = sub.add_parser("sweep")
    p_sweep.add_argument("--out", default="sweep_times.json")
    p_sweep.add_argument("--batches", nargs="*", type=int, default=None)
    sub.add_parser("validate")
    p_trace = sub.add_parser("trace")
    p_trace.add_argument("--out", default="/tmp/tpu_gpad_trace")
    args = ap.parse_args()
    if args.cmd == "steps":
        sizes = [tuple(int(t) for t in s.split("x")) for s in args.sizes]
        profile_steps(sizes)
    elif args.cmd == "sweep":
        kw = {} if args.batches is None else dict(batches=tuple(args.batches))
        profile_sweep(args.out, **kw)
    elif args.cmd == "validate":
        sys.exit(validate())
    elif args.cmd == "trace":
        trace(args.out)


if __name__ == "__main__":
    main()
