"""Generate per-step golden fixtures for steps 1, 2 and 4.

The reference commits golden files only for step 3
(``build/step3/{1..5}/{input,output}.txt``); the path templates in
``main_prof.cu:93-109`` show steps 1/2/4 existed but were never committed.
This regenerates the missing coverage natively: fixtures are produced from
*real* GPAD trajectories (iterate 10 of a battery solve, float64 condensation,
float32 steps) so the operands have realistic magnitudes and activity
patterns, in the same whitespace-float text style.

Formats (header then operands, one value per line):
  step1/<k>: input  "n_u N m beta"  y (m)  y_prev (m)       output  w (m)
  step2/<k>: input  "n_u N m"       MG_T (m*n_z)  w (m)  g_P (n_z)
             output zhat (n_z)                       [canonical sign]
  step4/<k>: input  "n_u N m"       GL_T (n_z*m)  w (m)  p_D (m)  zhat (n_z)
             output y_next (m)

Run: python tools/gen_fixtures.py  (writes tests/fixtures/)
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SIZES = [(3, 4), (4, 3), (10, 15), (15, 10)]  # reference fixture sizes sans 30x30
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def _fmt(arr):
    return "\n".join(f"{v:.8e}" for v in np.asarray(arr, np.float32).reshape(-1))


def main():
    from tpu_gpad import problems
    from tpu_gpad.condense import condense, lipschitz_constant
    from tpu_gpad.schedule import momentum_schedule
    from tpu_gpad.solver import reference as oracle

    for k, (n, N) in enumerate(SIZES, start=1):
        qp = condense(problems.battery(n_cells=n, horizon=N))
        L = lipschitz_constant(qp)
        x0 = problems.battery_default_x0(n, seed=k)
        f = qp.F.T @ x0
        b = qp.b0 + qp.E @ x0
        M_G = np.linalg.solve(qp.H, qp.G.T).astype(np.float32)  # (n_z, m)
        g_P = np.linalg.solve(qp.H, f).astype(np.float32)
        G_L = (qp.G / L).astype(np.float32)
        p_D = (-b / L).astype(np.float32)
        m, n_z = qp.m, qp.n_z
        theta, beta = momentum_schedule(100)

        # run 10 iterations to get realistic iterates
        y = np.zeros(m, np.float32)
        y_prev = np.zeros(m, np.float32)
        z = np.zeros(n_z, np.float32)
        for it in range(10):
            w = oracle.step1(y, y_prev, float(beta[it]))
            zhat = oracle.step2(M_G, w, g_P)
            z = oracle.step3(z, zhat, float(theta[it]))
            y_prev, y = y, oracle.step4(G_L, w, p_D, zhat)

        bk = float(beta[10])
        w = oracle.step1(y, y_prev, bk)
        zhat = oracle.step2(M_G, w, g_P)
        y_next = oracle.step4(G_L, w, p_D, zhat)

        d1 = OUT / "step1" / str(k); d1.mkdir(parents=True, exist_ok=True)
        (d1 / "input.txt").write_text(
            f"{n} {N} {m} {bk:.8e}\n" + _fmt(y) + "\n" + _fmt(y_prev) + "\n")
        (d1 / "output.txt").write_text(_fmt(w) + "\n")

        d2 = OUT / "step2" / str(k); d2.mkdir(parents=True, exist_ok=True)
        (d2 / "input.txt").write_text(
            f"{n} {N} {m}\n" + _fmt(M_G.T) + "\n" + _fmt(w) + "\n" + _fmt(g_P) + "\n")
        (d2 / "output.txt").write_text(_fmt(zhat) + "\n")

        d4 = OUT / "step4" / str(k); d4.mkdir(parents=True, exist_ok=True)
        (d4 / "input.txt").write_text(
            f"{n} {N} {m}\n" + _fmt(G_L.T) + "\n" + _fmt(w) + "\n"
            + _fmt(p_D) + "\n" + _fmt(zhat) + "\n")
        (d4 / "output.txt").write_text(_fmt(y_next) + "\n")
        print(f"fixture {k}: n_u={n} N={N} m={m}")


if __name__ == "__main__":
    main()
