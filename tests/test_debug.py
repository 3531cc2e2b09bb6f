"""Sanitizer-equivalent checks: divergence/NaN detection (SURVEY.md sec. 5)."""

import dataclasses

import numpy as np
import pytest

import tpu_gpad
from tpu_gpad import problems
from tpu_gpad.solver import SolverConfig
from tpu_gpad.utils import solve_batch_checked, validate_data


def _data(**kw):
    qp = tpu_gpad.condense(problems.battery(n_cells=3, horizon=6))
    return tpu_gpad.dualize(qp, iterations=80, **kw)


def test_checked_solve_passes_on_healthy_problem():
    data = _data(paired="auto")
    X0 = np.random.default_rng(0).uniform(-0.4, 0.4, (8, 3)).astype(np.float32)
    res = solve_batch_checked(data, X0, SolverConfig(iterations=80))
    assert np.all(np.isfinite(np.asarray(res.u)))


def test_checked_solve_raises_on_divergence():
    # L far too small => step size 1/L too large => dual iteration expands
    data = _data()
    bad = dataclasses.replace(
        data,
        GL_T=data.GL_T * 1e4,  # as if L were 1e4 times smaller
        pD_const=data.pD_const * 1e4,
        pD_map=data.pD_map * 1e4,
    )
    X0 = np.random.default_rng(1).uniform(-0.4, 0.4, (4, 3)).astype(np.float32)
    with pytest.raises(Exception, match="non-finite|diverged"):
        solve_batch_checked(bad, X0, SolverConfig(iterations=80))


def test_validate_data_flags_nan_and_bad_L():
    data = _data()
    assert validate_data(data) == []
    import jax.numpy as jnp

    poisoned = dataclasses.replace(
        data, gP_const=data.gP_const.at[0].set(jnp.nan)
    )
    msgs = validate_data(poisoned)
    assert any("gP_const" in m for m in msgs)
