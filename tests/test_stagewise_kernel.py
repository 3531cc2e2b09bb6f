"""Fused Pallas stage-wise kernel: parity with the XLA stage-wise path.

On CPU the kernel runs in Pallas interpret mode (same program,
interpreted) via the forced ``engine="pallas"`` route; the chip A/B and
throughput rows live in STAGEWISE.json (tools/bench_stagewise.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_gpad import problems
from tpu_gpad.stagewise import build_stagewise, solve_stagewise
from tpu_gpad.stagewise_kernel import (
    pick_stagewise_tile,
    stagewise_kernel_compatible,
)


def _solve_pair(prob, iters, X0, **kw):
    data = build_stagewise(prob, iterations=iters)
    ref = solve_stagewise(data, X0, iterations=iters, engine="xla", **kw)
    res = solve_stagewise(data, X0, iterations=iters, engine="pallas", **kw)
    return ref, res


def test_matches_xla_engine_battery():
    rng = np.random.default_rng(0)
    X0 = jnp.asarray(rng.uniform(-0.4, 0.4, size=(5, 3)).astype(np.float32))
    ref, res = _solve_pair(problems.battery(3, 8), 60, X0)
    np.testing.assert_allclose(res.u, ref.u, atol=2e-6)
    np.testing.assert_allclose(res.z, ref.z, atol=2e-6)
    np.testing.assert_allclose(res.y, ref.y, atol=5e-6)
    np.testing.assert_allclose(res.residual, ref.residual, atol=2e-6)
    np.testing.assert_allclose(res.gap, ref.gap, atol=2e-5)
    assert np.all(np.asarray(res.residual) >= 0.0)


def test_matches_xla_engine_ltv_restart():
    prob = problems.random_ltv(n_x=3, n_u=2, horizon=6, seed=3)
    rng = np.random.default_rng(1)
    X0 = jnp.asarray(rng.uniform(-0.5, 0.5, size=(4, 3)).astype(np.float32))
    ref, res = _solve_pair(prob, 80, X0, restart=True)
    np.testing.assert_allclose(res.u, ref.u, atol=2e-6)
    np.testing.assert_allclose(res.y, ref.y, atol=5e-6)


def test_batch_shape_and_metadata():
    rng = np.random.default_rng(2)
    X0 = jnp.asarray(
        rng.uniform(-0.3, 0.3, size=(2, 3, 3)).astype(np.float32)
    )
    data = build_stagewise(problems.battery(3, 6), iterations=40)
    res = solve_stagewise(data, X0, iterations=40, engine="pallas")
    assert res.u.shape == (2, 3, 3)
    assert res.y.shape == (2, 3, 6, data.m_x + data.m_u)
    assert int(np.asarray(res.iterations)[0, 0]) == 40
    assert bool(np.all(np.asarray(res.converged)))


def test_kernel_warm_start_matches_xla():
    """v2: a warm dual start rides the kernel and reproduces the XLA
    warm-started path exactly (same init semantics: y_prev = y0)."""
    data = build_stagewise(problems.battery(3, 6), iterations=40)
    rng = np.random.default_rng(7)
    X0 = jnp.asarray(rng.uniform(-0.3, 0.3, size=(3, 3)).astype(np.float32))
    # a realistic warm start: the dual of a nearby solve
    warm = solve_stagewise(data, X0 * 0.9, iterations=40, engine="xla")
    ref = solve_stagewise(data, X0, iterations=40, engine="xla", y0=warm.y)
    res = solve_stagewise(data, X0, iterations=40, engine="pallas",
                          y0=warm.y)
    np.testing.assert_allclose(res.u, ref.u, atol=2e-6)
    np.testing.assert_allclose(res.y, ref.y, atol=5e-6)
    np.testing.assert_allclose(res.residual, ref.residual, atol=2e-6)
    # warm + restart compose
    ref_r = solve_stagewise(data, X0, iterations=40, engine="xla",
                            y0=warm.y, restart=True)
    res_r = solve_stagewise(data, X0, iterations=40, engine="pallas",
                            y0=warm.y, restart=True)
    np.testing.assert_allclose(res_r.u, ref_r.u, atol=2e-6)


def test_kernel_declines_eps():
    data = build_stagewise(problems.battery(3, 6), iterations=40)
    X0 = jnp.zeros((2, 3), dtype=jnp.float32)
    # forced engines work or raise: the kernel covers fixed mode only,
    # so a forced pallas + eps request raises instead of silently
    # measuring the XLA path
    with pytest.raises(ValueError, match="fixed"):
        solve_stagewise(
            data, X0, iterations=40, engine="pallas", mode="eps",
            eps_g=1e-3, eps_V=1e-3,
        )
    # auto still serves eps (XLA path)
    res = solve_stagewise(
        data, X0, iterations=40, mode="eps", eps_g=1e-3, eps_V=1e-3,
    )
    assert bool(np.all(np.asarray(res.converged)))


def test_vmem_budget_and_degenerate_rows():
    # no input rows at all -> kernel declines, auto falls back
    from tpu_gpad.types import LinearMPCProblem

    prob = LinearMPCProblem(
        A=np.array([[1.0, 0.1], [0.0, 1.0]]),
        B=np.array([[0.0], [0.1]]),
        Q=np.eye(2),
        R=np.eye(1),
        horizon=6,
        u_min=np.array([-1.0]),
        u_max=np.array([1.0]),
        name="inputs_only",
    )
    data = build_stagewise(prob, iterations=40)
    ok, why = stagewise_kernel_compatible(data)
    assert not ok and "m_x" in why
    with pytest.raises(ValueError, match="cannot take"):
        solve_stagewise(
            data,
            jnp.zeros((2, 2), dtype=jnp.float32),
            iterations=40,
            engine="pallas",
        )
    # the tile picker refuses absurd horizons instead of OOMing
    assert pick_stagewise_tile(200000, 8, 8, 16, 24) is None


def test_wide_dual_rows_pack():
    """battery n=8 has m_sp = 40 > n_p + p_p = 16 — the packed-constant
    row extent must cover the h column (chip regression: negative pad)."""
    rng = np.random.default_rng(3)
    X0 = jnp.asarray(rng.uniform(-0.3, 0.3, size=(3, 8)).astype(np.float32))
    ref, res = _solve_pair(problems.battery(8, 12), 60, X0)
    np.testing.assert_allclose(res.u, ref.u, atol=2e-6)
    np.testing.assert_allclose(res.y, ref.y, atol=5e-6)


def test_kernel_under_shard_map_dp():
    """Scenario-DP over the virtual 8-device mesh with the FUSED kernel
    inside each shard (interpret mode on CPU): the kernel is a per-chip
    executor, so sharding composes exactly like the XLA paths."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device (virtual CPU) mesh")
    from jax.sharding import PartitionSpec as P

    from tpu_gpad.parallel import make_mesh

    shard_map = jax.shard_map

    data = build_stagewise(problems.battery(3, 6), iterations=50)
    rng = np.random.default_rng(9)
    X0 = jnp.asarray(rng.uniform(-0.3, 0.3, size=(16, 3)).astype(np.float32))
    ref = solve_stagewise(data, X0, iterations=50, engine="pallas")

    mesh = make_mesh(n_data=8)

    def shard_fn(x):
        res = solve_stagewise(data, x, iterations=50, engine="pallas")
        return res.u, res.residual

    u, resid = shard_map(
        shard_fn, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
        check_vma=False,
    )(X0)
    np.testing.assert_allclose(np.asarray(u), np.asarray(ref.u), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(resid), np.asarray(ref.residual), atol=1e-6
    )


def test_kernel_affine_offsets_and_fixed_ref():
    """The kernel's packed [dtl | qoff | c] columns reproduce the XLA
    stage-wise path exactly for affine dynamics and a baked reference."""
    import dataclasses

    prob = dataclasses.replace(
        problems.battery(3, 7), c=np.array([0.02, -0.01, 0.015])
    )
    data = build_stagewise(prob, iterations=100)
    rng = np.random.default_rng(13)
    X0 = jnp.asarray(rng.uniform(-0.3, 0.3, size=(4, 3)).astype(np.float32))
    ref = solve_stagewise(data, X0, engine="xla", scan="sequential")
    res = solve_stagewise(data, X0, engine="pallas")
    np.testing.assert_allclose(res.u, ref.u, atol=2e-6)
    np.testing.assert_allclose(res.z, ref.z, atol=2e-6)
    np.testing.assert_allclose(res.y, ref.y, atol=5e-6)
    np.testing.assert_allclose(res.residual, ref.residual, atol=2e-6)

    di = problems.double_integrator(horizon=8)
    data2 = build_stagewise(di, iterations=100, x_ref=np.array([0.25, 0.0]))
    X2 = jnp.asarray(rng.uniform(-0.4, 0.4, size=(3, 2)).astype(np.float32))
    ref2 = solve_stagewise(data2, X2, engine="xla", scan="sequential")
    res2 = solve_stagewise(data2, X2, engine="pallas")
    np.testing.assert_allclose(res2.u, ref2.u, atol=2e-6)
