"""Device-side scenario (robust) condensation vs the host pipeline.

``dualize_scenario_device`` must reproduce the host
``scenario_qp(condense(...)) -> dualize`` result (round-2 VERDICT item 4)
up to fp32-vs-float64 condensation arithmetic — checked on the primal
solution against both the host GPAD solve and the exact KKT QP solve.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import tpu_gpad
from tpu_gpad import problems
from tpu_gpad.device_condense import dualize_scenario_device
from tpu_gpad.robust import scenario_qp, scenario_problem_variants
from tpu_gpad.solver import SolverConfig, solve_batch
from tpu_gpad.solver.qp import solve_condensed_qp


def _gain_scenarios(horizon=6, scales=(0.7, 1.0, 1.3), **kw):
    nominal = problems.double_integrator(
        horizon=horizon, x_limit=8.0, u_limit=1.0, qu_weight=0.05, **kw
    )
    variants = scenario_problem_variants(
        nominal, B_list=[nominal.B * s for s in scales]
    )
    return nominal, variants


def _device_stacks(variants, horizon):
    S = len(variants)
    n_x = variants[0].n_x
    A = np.stack([np.tile(p.A, (horizon, 1, 1)) for p in variants])
    B = np.stack([np.tile(p.B, (horizon, 1, 1)) for p in variants])
    c = np.zeros((S, horizon, n_x), dtype=np.float32)
    return jnp.asarray(A, jnp.float32), jnp.asarray(B, jnp.float32), jnp.asarray(c)


@pytest.mark.parametrize("weights", [None, (0.5, 0.2, 0.3)])
def test_scenario_device_matches_host(weights):
    horizon = 6
    nominal, variants = _gain_scenarios(horizon=horizon)
    A, B, c = _device_stacks(variants, horizon)
    iters = 600
    cfg = SolverConfig(iterations=iters, restart=True)

    data_dev = dualize_scenario_device(
        A, B, c, nominal.Q, nominal.R, nominal.u_min, nominal.u_max,
        iterations=iters, weights=weights,
        x_min=nominal.x_min, x_max=nominal.x_max,
    )
    qps = [tpu_gpad.condense(p, tracking=True) for p in variants]
    qp_rob = scenario_qp(qps, weights=weights)
    data_host = tpu_gpad.dualize(qp_rob, iterations=iters, paired="auto")

    x = np.array([1.5, -0.4], dtype=np.float32)
    x_ref = np.array([4.0, 0.0], dtype=np.float32)
    p = np.concatenate([x, x_ref])[None]
    r_dev = solve_batch(data_dev, jnp.asarray(p), config=cfg)
    r_host = solve_batch(data_host, jnp.asarray(p), config=cfg)
    exact = solve_condensed_qp(qp_rob, p[0].astype(np.float64))

    # shared first move + the full stacked plan (z~ layouts coincide)
    np.testing.assert_allclose(
        np.asarray(r_dev.u[0]), np.asarray(r_host.u[0]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(r_dev.z[0]), np.asarray(r_host.z[0]), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(r_dev.u[0]), exact.z[: nominal.n_u], atol=5e-4
    )
    assert data_dev.paired and data_dev.n_struct is not None
    # identity block covers every stacked decision variable exactly once
    S = len(variants)
    n_tilde = nominal.n_u * (1 + S * (horizon - 1))
    assert data_dev.m_half == data_dev.n_struct + n_tilde


def test_scenario_device_per_stage_tightened_boxes():
    """Per-stage (N, n)-shaped boxes (the tube-tightened class) flow
    through the scenario device path and match the host per-stage path."""
    horizon = 5
    nominal, variants = _gain_scenarios(horizon=horizon)
    rng = np.random.default_rng(0)
    shrink = 1.0 - 0.04 * np.arange(horizon)[:, None]
    x_max_ps = np.tile(np.asarray(nominal.x_max)[None], (horizon, 1)) * shrink
    x_min_ps = -x_max_ps
    u_max_ps = np.tile(np.asarray(nominal.u_max)[None], (horizon, 1)) * shrink
    u_min_ps = -u_max_ps
    import dataclasses

    variants_ps = [
        dataclasses.replace(
            p, x_min=x_min_ps, x_max=x_max_ps, u_min=u_min_ps, u_max=u_max_ps
        )
        for p in variants
    ]
    A, B, c = _device_stacks(variants, horizon)
    iters = 600
    cfg = SolverConfig(iterations=iters, restart=True)
    data_dev = dualize_scenario_device(
        A, B, c, nominal.Q, nominal.R, u_min_ps, u_max_ps,
        iterations=iters, x_min=x_min_ps, x_max=x_max_ps,
    )
    qp_rob = scenario_qp(
        [tpu_gpad.condense(p, tracking=True) for p in variants_ps]
    )
    x = np.array([2.0, 0.3], dtype=np.float32)
    x_ref = np.array([5.0, 0.0], dtype=np.float32)
    p = np.concatenate([x, x_ref])[None]
    r_dev = solve_batch(data_dev, jnp.asarray(p), config=cfg)
    exact = solve_condensed_qp(qp_rob, p[0].astype(np.float64))
    np.testing.assert_allclose(
        np.asarray(r_dev.u[0]), exact.z[: nominal.n_u], atol=5e-4
    )


def test_scenario_device_single_scenario_degenerates_to_ltv():
    """S=1 scenario stack == the plain LTV device dualization."""
    from tpu_gpad.device_condense import dualize_ltv_device

    horizon = 6
    nominal, variants = _gain_scenarios(horizon=horizon, )
    A, B, c = _device_stacks(variants[:1], horizon)
    iters = 400
    cfg = SolverConfig(iterations=iters, restart=True)
    data_s = dualize_scenario_device(
        A, B, c, nominal.Q, nominal.R, nominal.u_min, nominal.u_max,
        iterations=iters, x_min=nominal.x_min, x_max=nominal.x_max,
    )
    data_l = dualize_ltv_device(
        A[0], B[0], c[0], nominal.Q, nominal.R, nominal.u_min, nominal.u_max,
        iterations=iters, x_min=nominal.x_min, x_max=nominal.x_max,
    )
    p = np.array([[1.0, -0.2, 3.0, 0.0]], dtype=np.float32)
    r_s = solve_batch(data_s, jnp.asarray(p), config=cfg)
    r_l = solve_batch(data_l, jnp.asarray(p), config=cfg)
    np.testing.assert_allclose(
        np.asarray(r_s.z[0]), np.asarray(r_l.z[0]), atol=2e-5
    )
