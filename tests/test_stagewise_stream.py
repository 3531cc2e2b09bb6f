"""HBM-streamed stage-wise kernel: parity with the XLA stage-wise path.

On CPU the kernel runs in Pallas interpret mode (same program,
interpreted); the chip A/B rows live in STAGEWISE.json
(tools/bench_stagewise_r5.py --section stream)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_gpad import problems
from tpu_gpad.stagewise import build_stagewise, solve_stagewise
from tpu_gpad.stagewise_stream import (
    pick_stream_tile,
    solve_stagewise_stream,
    stagewise_stream_compatible,
)


def _on_tpu():
    import jax

    return jax.default_backend() == "tpu"


# On the real chip (opt-in suite) the parity tests run the REAL kernel
# for the two small shapes below; the heavier interpret-mode tests are
# CPU-only — interpret adds nothing on hardware and each extra chip
# compile costs 30s-10min through the tunnel (the chip evidence for the
# big shapes is STAGEWISE.json stream_rows).
heavy_cpu_only = pytest.mark.skipif(
    _on_tpu(),
    reason="CPU-only (chip compile budget; chip rows in STAGEWISE.json)",
)


def _pair(prob, iters, X0, restart=False, y0=None):
    data = build_stagewise(prob, iterations=iters)
    ref = solve_stagewise(data, X0, iterations=iters, engine="xla",
                          restart=restart, y0=y0)
    out = solve_stagewise_stream(data, X0, iterations=iters,
                                 restart=restart, y0=y0,
                                 interpret=not _on_tpu())
    return ref, out


def test_stream_matches_xla_battery():
    from conftest import backend_tol

    rng = np.random.default_rng(0)
    X0 = jnp.asarray(rng.uniform(-0.4, 0.4, size=(5, 3)).astype(np.float32))
    ref, (u0, zu, y, resid, gap) = _pair(problems.battery(3, 6), 40, X0)
    tol = backend_tol(2e-6, 5e-5)
    np.testing.assert_allclose(u0, ref.u, atol=tol)
    np.testing.assert_allclose(zu.reshape(5, -1), ref.z, atol=tol)
    np.testing.assert_allclose(y, ref.y, atol=backend_tol(5e-6, 1e-4))
    np.testing.assert_allclose(resid, ref.residual, atol=tol)
    np.testing.assert_allclose(gap, ref.gap, atol=backend_tol(2e-5, 2e-4))


def test_stream_warm_restart_and_wide_rows():
    """battery n8 (3 h-chunks) with warm start and adaptive restart —
    the lazy-mask restart must reproduce the XLA iterate semantics."""
    data = build_stagewise(problems.battery(8, 12), iterations=60)
    rng = np.random.default_rng(1)
    X0 = jnp.asarray(rng.uniform(-0.3, 0.3, size=(4, 8)).astype(np.float32))
    warm = solve_stagewise(data, X0 * 0.9, iterations=60, engine="xla")
    from conftest import backend_tol

    for restart in (False, True):
        ref = solve_stagewise(data, X0, iterations=60, engine="xla",
                              y0=warm.y, restart=restart)
        u0, zu, y, resid, gap = solve_stagewise_stream(
            data, X0, iterations=60, restart=restart, y0=warm.y,
            interpret=not _on_tpu())
        np.testing.assert_allclose(u0, ref.u, atol=backend_tol(2e-6, 5e-5))
        np.testing.assert_allclose(y, ref.y, atol=backend_tol(5e-6, 1e-4))


@heavy_cpu_only
def test_stream_wide_constants_n30():
    """n30-class packed constants exceed one 128-lane tile (the whole-VMEM
    kernel's rejection case) — the streamed kernel takes them."""
    from tpu_gpad.stagewise_kernel import stagewise_kernel_compatible

    data = build_stagewise(problems.battery(30, 8), iterations=30)
    ok_v1, why = stagewise_kernel_compatible(data)
    assert not ok_v1 and "128-lane" in why
    assert stagewise_stream_compatible(data)[0]
    X0 = jnp.asarray(
        np.random.default_rng(2).uniform(-0.3, 0.3, size=(3, 30))
        .astype(np.float32))
    ref = solve_stagewise(data, X0, iterations=30, engine="xla")
    u0, zu, y, resid, gap = solve_stagewise_stream(
        data, X0, iterations=30, interpret=True)
    np.testing.assert_allclose(u0, ref.u, atol=2e-6)
    np.testing.assert_allclose(y, ref.y, atol=5e-6)


@heavy_cpu_only
def test_stream_engine_route():
    """engine='stream' forces the streamed kernel through solve_stagewise
    (interpret off-TPU), with the standard SolveResult contract."""
    data = build_stagewise(problems.battery(3, 6), iterations=40)
    rng = np.random.default_rng(3)
    X0 = jnp.asarray(
        rng.uniform(-0.3, 0.3, size=(2, 4, 3)).astype(np.float32))
    ref = solve_stagewise(data, X0, iterations=40, engine="xla")
    res = solve_stagewise(data, X0, iterations=40, engine="stream")
    np.testing.assert_allclose(res.u, ref.u, atol=2e-6)
    assert res.u.shape == (2, 4, 3)
    assert res.y.shape == (2, 4, 6, data.m_x + data.m_u)
    # stream declines eps mode and runtime params loudly
    with pytest.raises(ValueError, match="fixed"):
        solve_stagewise(data, X0, iterations=40, engine="stream",
                        mode="eps", eps_g=1e-3, eps_V=1e-3)
    with pytest.raises(ValueError, match="q_lin"):
        solve_stagewise(data, X0, iterations=40, engine="stream",
                        q_lin=jnp.zeros((6, 3)))


@heavy_cpu_only
def test_stream_under_shard_map_dp():
    """Scenario-DP over the virtual 8-device mesh with the streamed
    kernel inside each shard (interpret on CPU): a per-chip executor,
    so sharding composes exactly like the other engines."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device (virtual CPU) mesh")
    from jax.sharding import PartitionSpec as P

    from tpu_gpad.parallel import make_mesh

    data = build_stagewise(problems.battery(3, 6), iterations=30)
    rng = np.random.default_rng(9)
    X0 = jnp.asarray(rng.uniform(-0.3, 0.3, size=(16, 3)).astype(np.float32))
    ref_u, *_ = solve_stagewise_stream(data, X0, iterations=30,
                                       interpret=True)
    mesh = make_mesh(n_data=8)
    u = jax.shard_map(
        lambda x: solve_stagewise_stream(
            data, x, iterations=30, interpret=True)[0],
        mesh=mesh, in_specs=(P("data"),), out_specs=P("data"),
        check_vma=False,
    )(X0)
    np.testing.assert_allclose(np.asarray(u), np.asarray(ref_u), atol=1e-6)


def test_stream_tile_picker_bounds():
    # refuses absurd horizons instead of OOMing
    assert pick_stream_tile(2_000_000, 32, 32, 64, 64, 256) is None
    # the flagship stream shape fits at 128 lanes or wider
    assert pick_stream_tile(200, 32, 32, 64, 64, 256) >= 128
