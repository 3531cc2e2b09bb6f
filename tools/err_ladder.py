"""Precision-ladder u* error table → PRECISION_ERRORS.json.

For each benchmark shape (battery N=10 and N=50) and each precision tier
(highest / high / default), solve one scenario on the auto-routed engine
and report the max-abs u* error against the float64 NumPy oracle at the
same iteration budget. These are the error parentheticals quoted in
docs/DESIGN.md section 8b — this script makes them traceable to a
committed artifact (VERDICT round 2 item 2).

Run on the real chip: ``python tools/err_ladder.py``.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

import tpu_gpad
from tpu_gpad import problems
from tpu_gpad.problems.battery import default_x0
from tpu_gpad.solver import SolverConfig, solve_batch
from tpu_gpad.solver.core import resolve_engine, resolve_flat, resolve_form
from tpu_gpad.solver.reference import gpad_solve_qp

ITERS = 100
OUT = {"iterations": ITERS, "oracle": "float64 NumPy gpad_solve_qp"}

for horizon, key in ((10, "battery_N10"), (50, "battery_N50")):
    qp = tpu_gpad.condense(problems.battery(n_cells=3, horizon=horizon))
    data = tpu_gpad.dualize(qp, iterations=ITERS, paired="auto")
    x0 = default_x0(3, seed=7)
    ref = gpad_solve_qp(qp, np.asarray(x0, dtype=np.float64), iterations=ITERS)
    X0 = jnp.asarray(x0, dtype=jnp.float32)[None]
    row = {}
    for prec in ("highest", "high", "default"):
        cfg = SolverConfig(iterations=ITERS, precision=prec)
        res = solve_batch(data, X0, config=cfg)
        form = resolve_form(data, cfg)
        row[prec] = {
            "u_star_max_abs_err_vs_fp64": float(
                np.abs(np.asarray(res.u[0]) - ref.u).max()
            ),
            "engine": resolve_engine(data, cfg),
            "form": form,
            "flat": bool(form == "mvp" and resolve_flat(data, cfg)),
        }
        print(key, prec, row[prec])
    OUT[key] = row

with open("/root/repo/PRECISION_ERRORS.json", "w") as f:
    json.dump(OUT, f, indent=2)
print("wrote PRECISION_ERRORS.json")
