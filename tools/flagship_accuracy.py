"""u* accuracy endgame at the reference's 30x30 flagship shape
(VERDICT r04 item 5) -> FLAGSHIP_ACCURACY.json.

Two findings this tool commits:

1. ORACLE POST-MORTEM: the earlier RESTART_EFFECT numbers at 30x30
   (fixed-100 u* err 0.097->0.115, "restart doesn't fix it") measured
   the ORACLE's error, not the solver's. ``solve_condensed_qp``'s
   active-set method adds/drops one row per pivot; at m=3660 its default
   500-pivot cap returned iterates with status="max_iter" sitting ~2.0
   ABOVE the optimal objective and 0.08-0.10 away in u — while both the
   device eps-solves and the f64 polish reach the SAME certified optimum
   (cond(H) = 1.24: the minimizer is unique). This tool measures every
   recipe against the KKT-certified optimum (``qp.certified_optimum``:
   polish from a deeply-converged device iterate, status-checked).

2. THE RECIPE LADDER: what actually delivers what accuracy, and at what
   throughput. Chip-measured outcome (committed in the JSON): device
   fp32 plateaus at ~9e-4 median / ~3e-3 max u error (fixed-1000 ==
   fixed-4000 == eps-2e-5: more iterations do not help; the eps test
   itself cannot be tightened past ~2e-5 because the fp32 residual/gap
   evaluation floors there — 2/256 scenarios sit at resid 1.08e-5
   forever). u* <= 1e-4 therefore needs the f64 active-set polish after
   a converged device solve: exact to ~1e-13 at a measured host cost per
   sample. The reference's own fixed-100 contract (acceldualgrad.m:6,39)
   leaves 0.03-0.3 error at this shape — "beating the reference" here
   means having a path to the optimum at all.

Run on the real chip:  python tools/flagship_accuracy.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import tpu_gpad
    from tpu_gpad import problems
    from tpu_gpad.solver import SolverConfig, solve_batch
    from tpu_gpad.solver.core import resolve_engine, resolve_form
    from tpu_gpad.solver.qp import certified_optimum, solve_condensed_qp

    NS = 8  # certified samples (one f64 polish each)
    B = 256
    qp = tpu_gpad.condense(problems.battery(n_cells=30, horizon=30))
    data = tpu_gpad.dualize(qp, iterations=8000, paired="auto")
    rng = np.random.default_rng(0)
    X0 = jnp.asarray(
        rng.uniform(-0.5, 0.5, size=(B, 30)).astype(np.float32))
    H = np.asarray(qp.H, np.float64)
    evmin = float(np.linalg.eigvalsh(H)[0])
    evmax = float(np.linalg.eigvalsh(H)[-1])

    out = {
        "device": str(jax.devices()[0]),
        "problem": "battery n=30 N=30 (the reference's flagship fixture "
                   "shape, build/step3/4)",
        "n_z": qp.n_z, "m": qp.G.shape[0],
        "H_eig_min": evmin, "H_eig_max": evmax,
        "minimizer_unique": True,
    }

    # --- the oracle post-mortem, reproduced and committed --------------
    cfg_deep = SolverConfig(mode="eps", eps_g=2e-5, eps_V=2e-5,
                            check_every=10, iterations=8000, restart=True)
    rd = solve_batch(data, X0, config=cfg_deep)
    Zd = np.asarray(rd.z, np.float64)
    t0 = time.perf_counter()
    cert, statuses = {}, []
    for i in range(NS):
        sol = certified_optimum(qp, np.asarray(X0[i], np.float64), Zd[i])
        statuses.append(sol.status)
        if sol.status == "optimal":
            cert[i] = sol.z[: qp.n_u]
    t_cert = (time.perf_counter() - t0) / NS
    out["certify"] = {
        "statuses": statuses,
        "host_s_per_sample": t_cert,
        "n_certified": len(cert),
    }
    legacy = solve_condensed_qp(qp, np.asarray(X0[0], np.float64))
    out["legacy_oracle_postmortem"] = {
        "status": legacy.status,
        "u_dist_from_certified": (
            float(np.abs(legacy.z[: qp.n_u] - cert[0]).max())
            if 0 in cert else None),
        "note": "solve_condensed_qp default 500-pivot cap at m=3660; "
                "this distance is what RESTART_EFFECT r3/r4 reported as "
                "solver error",
    }
    print(json.dumps(out["legacy_oracle_postmortem"]), flush=True)

    # --- the recipe ladder vs the certified optimum --------------------
    recipes = {
        "fixed100_plain": SolverConfig(iterations=100),
        "fixed100_restart": SolverConfig(iterations=100, restart=True),
        "fixed1000_restart": SolverConfig(iterations=1000, restart=True),
        "fixed4000_restart": SolverConfig(iterations=4000, restart=True),
        "eps2e5_restart_cap4000": SolverConfig(
            mode="eps", eps_g=2e-5, eps_V=2e-5, check_every=10,
            iterations=4000, restart=True),
        "eps1e4_restart_cap4000": SolverConfig(
            mode="eps", eps_g=1e-4, eps_V=1e-4, check_every=10,
            iterations=4000, restart=True),
    }
    out["ladder"] = {}
    for name, cfg in recipes.items():
        r = solve_batch(data, X0, config=cfg)
        errs = [
            float(np.abs(np.asarray(r.u[i], np.float64) - cert[i]).max())
            for i in cert
        ]
        jf = jax.jit(lambda d, x, c=cfg: solve_batch(d, x, config=c).u)
        jf(data, X0).block_until_ready()
        t1 = time.perf_counter()
        jf(data, X0).block_until_ready()
        jf(data, X0).block_until_ready()
        dt = (time.perf_counter() - t1) / 2
        it = np.asarray(r.iterations)
        row = {
            "u_err_median": float(np.median(errs)),
            "u_err_max": float(np.max(errs)),
            "solves_per_sec": B / dt,
            "iters_mean": float(it.mean()),
            "all_converged": bool(np.all(np.asarray(r.converged))),
            "engine": resolve_engine(data, cfg),
            "form": resolve_form(data, cfg),
        }
        out["ladder"][name] = row
        print(name, json.dumps(row), flush=True)

    # --- eps-tail diagnosis: the fp32 residual floor --------------------
    cfg_t = SolverConfig(mode="eps", eps_g=1e-5, eps_V=1e-5,
                         check_every=10, iterations=4000, restart=True)
    rt = solve_batch(data, X0, config=cfg_t)
    conv = np.asarray(rt.converged)
    resid = np.asarray(rt.residual)
    out["eps_tail"] = {
        "eps": 1e-5,
        "converged": int(conv.sum()),
        "batch": B,
        "nonconverged_resid_max": (
            float(resid[~conv].max()) if (~conv).any() else None),
        "note": "non-converged scenarios sit JUST above the eps-1e-5 "
                "test at the fp32 residual evaluation floor (~1.1e-5); "
                "12000 iterations do not move them. eps=2e-5 converges "
                "256/256.",
    }

    # --- the 1e-4 recipe: device eps + f64 polish -----------------------
    from tpu_gpad.solver.qp import polish

    cfg_e = recipes["eps2e5_restart_cap4000"]
    re_ = solve_batch(data, X0, config=cfg_e)
    Z = np.asarray(re_.z, np.float64)
    t0 = time.perf_counter()
    perr, pstat = [], []
    for i in cert:
        sol = polish(qp, np.asarray(X0[i], np.float64), Z[i])
        pstat.append(sol.status)
        perr.append(float(np.abs(sol.z[: qp.n_u] - cert[i]).max()))
    out["polish_recipe"] = {
        "pipeline": "eps2e-5+restart device solve -> f64 active-set "
                    "polish (qp.polish)",
        "u_err_max": float(np.max(perr)),
        "host_s_per_sample": (time.perf_counter() - t0) / len(cert),
        "statuses": pstat,
        "note": "the committed <=1e-4 path at 30x30: exact (KKT-"
                "certified) rather than 1e-4; device-only fp32 plateaus "
                "at ~9e-4 median / ~3e-3 max (ladder above) because the "
                "duality-gap test cannot resolve the required "
                "eps_V ~ lmin(H) (1e-4)^2 / 2 ~ 5e-9 in fp32",
    }
    print(json.dumps(out["polish_recipe"]), flush=True)

    Path("FLAGSHIP_ACCURACY.json").write_text(json.dumps(out, indent=1))
    print("wrote FLAGSHIP_ACCURACY.json")


if __name__ == "__main__":
    main()
