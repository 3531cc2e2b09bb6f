"""Exact QP ground truth (the reference's ``quadprog`` cross-check).

Reference ``Code/MATLAB/gpad.m:88-89`` keeps a (commented) MATLAB
``quadprog`` call as algorithm-level ground truth. This module provides the
same level of the oracle hierarchy (SURVEY.md section 4, level 3) with two
*independent* algorithms — neither shares code with GPAD:

- ``solve_qp_exact``: dense primal active-set method on the KKT system,
  float64, solved to machine precision (the default ground truth);
- ``solve_qp_admm``: OSQP-style ADMM, used as a second opinion / fallback.

Both solve:  minimize 0.5 z' H z + f' z   s.t.  G z <= b   with H ≻ 0.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class QPSolution:
    z: np.ndarray
    lam: np.ndarray  # dual multipliers for G z <= b (>= 0)
    active: np.ndarray  # indices of active constraints
    iterations: int
    status: str


def _kkt_solve(H, f, G_a, b_a):
    """Equality-constrained QP: min 0.5 z'Hz + f'z s.t. G_a z = b_a."""
    n = H.shape[0]
    k = G_a.shape[0]
    if k == 0:
        return np.linalg.solve(H, -f), np.zeros(0)
    KKT = np.block([[H, G_a.T], [G_a, np.zeros((k, k))]])
    rhs = np.concatenate([-f, b_a])
    sol = np.linalg.solve(KKT, rhs)
    return sol[:n], sol[n:]


def solve_qp_exact(
    H: np.ndarray,
    f: np.ndarray,
    G: np.ndarray,
    b: np.ndarray,
    max_iter: int = 500,
    tol: float = 1e-10,
) -> QPSolution:
    """Primal active-set method for strictly convex inequality QPs.

    Classic textbook scheme (Nocedal & Wright, Alg. 16.3): start at the
    unconstrained minimizer clipped into feasibility via a blocking-constraint
    line search, then add/drop constraints from the working set until the KKT
    conditions hold.
    """
    H = np.asarray(H, dtype=np.float64)
    f = np.asarray(f, dtype=np.float64)
    G = np.asarray(G, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    m, n = G.shape

    # Feasible start: z = 0 is feasible for all bundled problems (b >= 0 when
    # x0 is interior); otherwise back off toward the analytic center cheaply.
    z = np.zeros(n)
    viol = G @ z - b
    if viol.max() > 0:
        # crude feasibility restoration: pull along -G' viol_+ until feasible
        for _ in range(100):
            step = G.T @ np.maximum(viol, 0.0)
            z = z - step / max(np.linalg.norm(step), 1e-12) * 0.1
            viol = G @ z - b
            if viol.max() <= 0:
                break
        else:
            return QPSolution(z, np.zeros(m), np.zeros(0, int), 0, "infeasible_start")

    W: list[int] = []  # working set
    lam_full = np.zeros(m)
    for it in range(1, max_iter + 1):
        G_a = G[W] if W else np.zeros((0, n))
        b_a = b[W] if W else np.zeros(0)
        # Solve EQP for the step direction from z
        z_eq, lam = _kkt_solve(H, f, G_a, b_a)
        p = z_eq - z
        if np.linalg.norm(p, np.inf) < tol:
            # Stationary on the working set: check multiplier signs
            lam_full[:] = 0.0
            if W:
                lam_full[np.asarray(W)] = lam
            if len(W) == 0 or lam.min() >= -tol:
                return QPSolution(z, np.maximum(lam_full, 0.0), np.asarray(sorted(W)), it, "optimal")
            W.pop(int(np.argmin(lam)))  # drop most negative multiplier
            continue
        # Line search to the nearest blocking constraint not in W
        Gp = G @ p
        mask = Gp > tol
        mask[W] = False
        if mask.any():
            alphas = (b[mask] - G[mask] @ z) / Gp[mask]
            idx = np.flatnonzero(mask)
            amin = alphas.min()
            if amin < 1.0:
                z = z + max(amin, 0.0) * p
                W.append(int(idx[np.argmin(alphas)]))
                continue
        z = z_eq
    return QPSolution(z, lam_full, np.asarray(sorted(W)), max_iter, "max_iter")


def solve_qp_admm(
    H: np.ndarray,
    f: np.ndarray,
    G: np.ndarray,
    b: np.ndarray,
    rho: float = 1.0,
    max_iter: int = 20000,
    tol: float = 1e-10,
) -> QPSolution:
    """OSQP-style ADMM on the splitting  z, s:  G z - s = 0, s <= b."""
    H = np.asarray(H, dtype=np.float64)
    f = np.asarray(f, dtype=np.float64)
    G = np.asarray(G, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    m, n = G.shape
    K = H + rho * (G.T @ G)
    K_inv = np.linalg.inv(K)
    z = np.zeros(n)
    s = np.zeros(m)
    u = np.zeros(m)
    it = 0
    for it in range(1, max_iter + 1):
        z = K_inv @ (-f + rho * G.T @ (s - u))
        Gz = G @ z
        s = np.minimum(Gz + u, b)
        r = Gz - s
        u = u + r
        if np.linalg.norm(r, np.inf) < tol and it % 50 == 0:
            # dual residual check
            if np.linalg.norm(rho * G.T @ (s - np.minimum(G @ z + u, b)), np.inf) < 1e2 * tol:
                break
    lam = rho * u
    active = np.flatnonzero(lam > 1e-8)
    return QPSolution(z, np.maximum(lam, 0.0), active, it, "optimal" if it < max_iter else "max_iter")


def solve_condensed_qp(qp, x0, method: str = "active_set") -> QPSolution:
    """Ground-truth solve of a ``CondensedQP`` at parameter x0."""
    x0 = np.asarray(x0, dtype=np.float64)
    f = qp.F.T @ x0 + qp.g
    b = qp.b0 + qp.E @ x0
    if method == "active_set":
        return solve_qp_exact(qp.H, f, qp.G, b)
    if method == "admm":
        return solve_qp_admm(qp.H, f, qp.G, b)
    raise ValueError(f"unknown method: {method!r}")
