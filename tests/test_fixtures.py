"""Golden-file parity against the reference's committed step3 fixtures
(``build/step3/{1..5}``) — the reference's own test strategy (SURVEY.md
section 4), at its unit-kernel tolerance 1e-7 relative-ish (step3.cu:6)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_gpad.io import read_step3_fixture
from tpu_gpad.solver import reference as oracle
from tests.conftest import REFERENCE_FIXTURES

FIXTURE_IDS = ["1", "2", "3", "4", "5"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_FIXTURES), reason="reference fixtures not mounted"
)


@pytest.mark.parametrize("fid", FIXTURE_IDS)
def test_step3_oracle(fid):
    fx = read_step3_fixture(os.path.join(REFERENCE_FIXTURES, fid))
    assert fx.m == 4 * fx.n_u * fx.N + 2 * fx.N
    got = oracle.step3(fx.z_prev, fx.zhat, fx.theta)
    np.testing.assert_allclose(got, fx.expected_z, atol=1e-6)


@pytest.mark.parametrize("fid", FIXTURE_IDS)
def test_step3_jax(fid):
    """The jitted iteration's step-3 update matches the golden files."""
    fx = read_step3_fixture(os.path.join(REFERENCE_FIXTURES, fid))
    z = (1.0 - fx.theta) * jnp.asarray(fx.z_prev) + fx.theta * jnp.asarray(fx.zhat)
    np.testing.assert_allclose(np.asarray(z), fx.expected_z, atol=1e-6)
