"""Adaptive-restart effect → RESTART_EFFECT.json.

Backs the README / DESIGN.md section 4b restart claims with a committed
artifact (VERDICT round 2 item 2), per shape:

  * eps-mode iteration counts at eps=1e-5, plain Nesterov schedule vs
    O'Donoghue-Candes adaptive restart (the "<=80 vs ~250" claim);
  * u* error vs the exact QP optimum after a FIXED 100-iteration budget,
    restart off vs on (the "~20x better u*" claim).

Round-4 addition (VERDICT r03 item 4): the reference's own 30x30 flagship
shape, where AB_FLAGSHIP_DEFAULT measured fixed-100 u* error 0.152
(schedule truncation dominates) — if restart lands <=1e-4 there, the
framework solves the reference's flagship to useful accuracy inside the
reference's own 100-iteration budget (``acceldualgrad.m:6,39`` is
fixed-100 with the termination test commented out).

Run on the real chip: ``python tools/restart_effect.py``.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

import tpu_gpad
from tpu_gpad import problems
from tpu_gpad.solver import SolverConfig, solve_batch
from tpu_gpad.solver.core import resolve_engine, resolve_form
from tpu_gpad.solver.qp import solve_condensed_qp

import jax

SHAPES = [
    # (n_cells, N, batch, eps budget)
    (3, 10, 256, 2000),
    (30, 30, 256, 4000),  # the reference's flagship shape
]

out = {"device": str(jax.devices()[0]), "shapes": []}

for n_cells, N, BATCH, budget in SHAPES:
    qp = tpu_gpad.condense(problems.battery(n_cells=n_cells, horizon=N))
    data = tpu_gpad.dualize(qp, iterations=budget, paired="auto")
    rng = np.random.default_rng(0)
    X0 = jnp.asarray(
        rng.uniform(-0.5, 0.5, size=(BATCH, n_cells)).astype(np.float32)
    )
    row = {"problem": data.name, "n_cells": n_cells, "N": N, "batch": BATCH,
           "m": data.m, "n_z": data.n_z}

    # --- eps-mode iteration counts, plain vs restart ---
    for label, restart in (("plain", False), ("restart", True)):
        cfg = SolverConfig(mode="eps", eps_g=1e-5, eps_V=1e-5,
                           check_every=10, iterations=budget,
                           restart=restart)
        res = solve_batch(data, X0, config=cfg)
        iters = np.asarray(res.iterations)
        row[f"eps1e5_{label}"] = {
            "iters_mean": float(iters.mean()),
            "iters_max": int(iters.max()),
            "all_converged": bool(np.all(np.asarray(res.converged))),
            "engine": resolve_engine(data, cfg),
            "form": resolve_form(data, cfg),
        }
        print(n_cells, N, label, row[f"eps1e5_{label}"], flush=True)

    # --- fixed-budget u* accuracy, restart off vs on, vs the CERTIFIED
    # optimum. The from-scratch active-set oracle silently capped at 500
    # pivots at 30x30 and its ~0.08-0.10 distance from the optimum was
    # reported as solver error in rounds 3-4 (FLAGSHIP_ACCURACY.json
    # post-mortem) — certify via f64 polish from a deep device solve and
    # SKIP anything not KKT-verified.
    from tpu_gpad.solver.qp import certified_optimum

    errs = {"plain": [], "restart": []}
    n_samples = 16 if qp.G.shape[1] <= 200 else 8
    deep = solve_batch(
        data, X0[:n_samples],
        config=SolverConfig(mode="eps", eps_g=2e-5, eps_V=2e-5,
                            check_every=10, iterations=budget,
                            restart=True),
    )
    Zdeep = np.asarray(deep.z, np.float64)
    skipped = 0
    for i in range(n_samples):
        x0 = np.asarray(X0[i], dtype=np.float64)
        cert = certified_optimum(qp, x0, Zdeep[i])
        if cert.status != "optimal":
            skipped += 1
            continue
        u_exact = cert.z[: qp.n_u]
        for label, restart in (("plain", False), ("restart", True)):
            cfg = SolverConfig(iterations=100, restart=restart)
            res = tpu_gpad.solve(data, X0[i], config=cfg)
            errs[label].append(
                float(np.abs(np.asarray(res.u) - u_exact).max())
            )
    cfg100 = SolverConfig(iterations=100)
    row["fixed100_routing"] = {
        "engine": resolve_engine(data, cfg100),
        "form": resolve_form(data, cfg100),
    }
    row["oracle"] = "certified (f64 polish from deep eps solve)"
    row["oracle_skipped_samples"] = skipped
    for label in errs:
        row[f"fixed100_{label}_u_err_median"] = float(np.median(errs[label]))
        row[f"fixed100_{label}_u_err_max"] = float(np.max(errs[label]))
    row["fixed100_u_err_improvement_median"] = (
        row["fixed100_plain_u_err_median"]
        / row["fixed100_restart_u_err_median"]
    )
    print(json.dumps({k: v for k, v in row.items() if "fixed100" in k}),
          flush=True)
    out["shapes"].append(row)
    with open("/root/repo/RESTART_EFFECT.json", "w") as f:
        json.dump(out, f, indent=2)

# legacy top-level aliases for the n3 N10 row (round-3 consumers)
first = out["shapes"][0]
for k in ("eps1e5_plain", "eps1e5_restart"):
    out[k] = first[k]
for k in list(first):
    if k.startswith("fixed100"):
        out[k] = first[k]

with open("/root/repo/RESTART_EFFECT.json", "w") as f:
    json.dump(out, f, indent=2)
print("wrote RESTART_EFFECT.json")
