"""Adaptive-restart effect → RESTART_EFFECT.json.

Backs the README / DESIGN.md section 4b restart claims with a committed
artifact (VERDICT round 2 item 2): on the headline battery N=10 problem,

  * eps-mode iteration counts at eps=1e-5, plain Nesterov schedule vs
    O'Donoghue-Candes adaptive restart (the "<=80 vs ~250" claim);
  * u* error vs the exact QP optimum after a FIXED 100-iteration budget,
    restart off vs on (the "~20x better u*" claim).

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
from tpu_gpad.solver.qp import solve_condensed_qp

import jax

BATCH = 256

qp = tpu_gpad.condense(problems.battery(n_cells=3, horizon=10))
data = tpu_gpad.dualize(qp, iterations=2000, paired="auto")
rng = np.random.default_rng(0)
X0 = jnp.asarray(rng.uniform(-0.5, 0.5, size=(BATCH, 3)).astype(np.float32))

out = {"device": str(jax.devices()[0]), "problem": data.name,
       "batch": BATCH}

# --- eps-mode iteration counts, plain vs restart ---
for label, restart in (("plain", False), ("restart", True)):
    cfg = SolverConfig(mode="eps", eps_g=1e-5, eps_V=1e-5, check_every=10,
                       iterations=2000, restart=restart)
    res = solve_batch(data, X0, config=cfg)
    iters = np.asarray(res.iterations)
    out[f"eps1e5_{label}"] = {
        "iters_mean": float(iters.mean()),
        "iters_max": int(iters.max()),
        "all_converged": bool(np.all(np.asarray(res.converged))),
    }
    print(label, out[f"eps1e5_{label}"])

# --- fixed-budget u* accuracy, restart off vs on, vs the exact QP ---
errs = {"plain": [], "restart": []}
for i in range(16):
    x0 = np.asarray(X0[i], dtype=np.float64)
    u_exact = solve_condensed_qp(qp, x0).z[: qp.n_u]
    for label, restart in (("plain", False), ("restart", True)):
        cfg = SolverConfig(iterations=100, restart=restart)
        res = tpu_gpad.solve(data, X0[i], config=cfg)
        errs[label].append(float(np.abs(np.asarray(res.u) - u_exact).max()))
for label in errs:
    out[f"fixed100_{label}_u_err_median"] = float(np.median(errs[label]))
    out[f"fixed100_{label}_u_err_max"] = float(np.max(errs[label]))
out["fixed100_u_err_improvement_median"] = (
    out["fixed100_plain_u_err_median"] / out["fixed100_restart_u_err_median"]
)
print(json.dumps({k: v for k, v in out.items() if "fixed100" in k}))

with open("/root/repo/RESTART_EFFECT.json", "w") as f:
    json.dump(out, f, indent=2)
print("wrote RESTART_EFFECT.json")
