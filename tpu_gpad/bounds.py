"""Certified iteration bounds for fixed-count (hard real-time) GPAD.

The reference runs Algorithm-2 mode: a fixed iteration budget N_nu certified
offline (``nmpc12-gpad.pdf`` p.4, eqs. (11), (13), (16); the repo itself
hardcodes N_nu = 100, ``main.cu:87``). This module computes such budgets.

Theory: GPAD is Nesterov's accelerated gradient method on the dual
``min_{y>=0} Phi(y)``, whose gradient is L-Lipschitz. With y_0 = 0 and the
theta recursion (theta_nu <= 2/(nu+2)), the standard estimate-sequence bound
gives dual suboptimality

    Phi(y_nu) - Phi* <= 2 L ||y*||^2 / (nu + 1)^2 ,

and the paper's primal bounds inherit the same O(1/nu^2) decay with constants
proportional to L and to Delta = an upper bound on ||y*(p)|| over the
parameter set P. Inverting these for a target (eps_g, eps_V) yields the
budgets below. The constants used here (2 for the dual/cost bound, 8 for the
feasibility bound) follow the accelerated dual gradient-projection analysis
of Patrinos & Bemporad; they are conservative (valid) upper bounds, and
``tests/test_bounds.py`` verifies empirically that the certified budget
always meets the target tolerances on sampled parameters.

Delta itself: the paper bounds ``Delta_y(P) = max_p min_{y in Y*(p)} ||y||``
with an MILP (eq. (16)) — optional by SURVEY.md section 7. Here
``dual_norm_bound`` computes Delta by exact QP solves at the vertices of a
box parameter set (exact for the bundled problems whose y*(p) extremes occur
at vertices) plus random interior sampling, with a configurable safety
factor for conservatism.
"""

from __future__ import annotations

import itertools
import math
from dataclasses import dataclass

import numpy as np

from tpu_gpad.types import CondensedQP


def iterations_for_optimality(L: float, delta: float, eps_V: float) -> int:
    """Smallest nu with 2 L Delta^2 / (nu+1)^2 <= eps_V  (paper eq. (11) form)."""
    return max(0, math.ceil(math.sqrt(2.0 * L / eps_V) * delta) - 1)


def iterations_for_feasibility(L: float, delta: float, eps_g: float) -> int:
    """Smallest nu with 8 L Delta / (nu+1)^2 <= eps_g  (paper eq. (13) form)."""
    return max(0, math.ceil(math.sqrt(8.0 * L * delta / eps_g)) - 1)


def certified_budget(L: float, delta: float, eps_g: float, eps_V: float) -> int:
    """Fixed iteration count guaranteeing BOTH eps_g feasibility and eps_V
    optimality for every parameter with ||y*(p)|| <= delta."""
    return max(
        iterations_for_optimality(L, delta, eps_V),
        iterations_for_feasibility(L, delta, eps_g),
    )


@dataclass
class DualNormBound:
    delta: float  # the certified (safety-scaled) bound on ||y*(p)||_2
    delta_observed: float  # largest ||y*(p)||_2 actually seen
    n_points: int  # parameters probed
    argmax_p: np.ndarray  # parameter achieving delta_observed


def dual_norm_bound(
    qp: CondensedQP,
    p_min: np.ndarray,
    p_max: np.ndarray,
    n_samples: int = 200,
    safety: float = 1.2,
    seed: int = 0,
) -> DualNormBound:
    """Bound Delta >= max_p ||y*(p)||_2 over the box [p_min, p_max].

    Probes every vertex of the box (2^n_x points, capped at 1024) plus
    ``n_samples`` uniform interior samples, solving each QP exactly with the
    active-set ground truth and taking the max multiplier norm, scaled by
    ``safety``. This is the practical replacement for the paper's MILP bound
    (eq. (16)): exact vertex enumeration where the max is attained at a
    vertex, sampled lower bound + safety margin otherwise.
    """
    from tpu_gpad.solver.qp import solve_condensed_qp

    p_min = np.asarray(p_min, dtype=np.float64)
    p_max = np.asarray(p_max, dtype=np.float64)
    n_x = p_min.size
    points = []
    if 2**n_x <= 1024:
        for corner in itertools.product(*zip(p_min, p_max)):
            points.append(np.asarray(corner))
    rng = np.random.default_rng(seed)
    for _ in range(n_samples):
        points.append(rng.uniform(p_min, p_max))

    best = 0.0
    best_p = points[0]
    n_ok = 0
    for p in points:
        sol = solve_condensed_qp(qp, p)
        if sol.status != "optimal":
            continue
        n_ok += 1
        nrm = float(np.linalg.norm(sol.lam))
        if nrm > best:
            best, best_p = nrm, p
    if n_ok == 0:
        raise ValueError("no parameter in the box yielded a solvable QP")
    return DualNormBound(
        delta=safety * best, delta_observed=best, n_points=n_ok, argmax_p=best_p
    )


def certify(
    qp: CondensedQP,
    p_min: np.ndarray,
    p_max: np.ndarray,
    eps_g: float = 1e-3,
    eps_V: float = 1e-3,
    lipschitz: str = "spectral_dual",
    **bound_kw,
) -> tuple[int, DualNormBound, float]:
    """One-call certification: returns (N_nu, Delta bound, L) for a problem
    over a box parameter set — the offline step producing the Algorithm-2
    fixed budget that the reference hardcodes."""
    from tpu_gpad.condense import lipschitz_constant

    L = lipschitz_constant(qp, lipschitz)
    dn = dual_norm_bound(qp, p_min, p_max, **bound_kw)
    return certified_budget(L, dn.delta, eps_g, eps_V), dn, L
