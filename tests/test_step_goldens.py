"""Golden-file validation of steps 1/2/4 (completing the reference's
uncommitted step1/step2/step4 fixture coverage, main_prof.cu:93-109) against
three implementations: NumPy oracle, native C++, and jitted jax ops."""

from pathlib import Path

import numpy as np
import pytest

from tpu_gpad import native
from tpu_gpad.solver import reference as oracle

FIXTURES = Path(__file__).resolve().parent / "fixtures"
CASES = sorted(int(p.name) for p in (FIXTURES / "step1").iterdir())


def _vals(path):
    return np.loadtxt(path, dtype=np.float32).reshape(-1)


def _read(step, k):
    d = FIXTURES / step / str(k)
    tokens = (d / "input.txt").read_text().split()
    return tokens, _vals(d / "output.txt")


@pytest.mark.parametrize("k", CASES)
def test_step1_golden(k):
    tokens, expected = _read("step1", k)
    n_u, N, m = int(tokens[0]), int(tokens[1]), int(tokens[2])
    beta = float(tokens[3])
    vals = np.asarray(tokens[4:], dtype=np.float32)
    y, y_prev = vals[:m], vals[m : 2 * m]
    np.testing.assert_allclose(oracle.step1(y, y_prev, beta), expected, atol=1e-7)
    if native.available():
        np.testing.assert_allclose(native.step1(y, y_prev, beta), expected, atol=1e-7)
    import jax.numpy as jnp

    w_jax = np.asarray(jnp.asarray(y) + beta * (jnp.asarray(y) - jnp.asarray(y_prev)))
    np.testing.assert_allclose(w_jax, expected, atol=1e-6)


@pytest.mark.parametrize("k", CASES)
def test_step2_golden(k):
    tokens, expected = _read("step2", k)
    n_u, N, m = int(tokens[0]), int(tokens[1]), int(tokens[2])
    n_z = n_u * N
    vals = np.asarray(tokens[3:], dtype=np.float32)
    MG_T = vals[: m * n_z].reshape(m, n_z)
    w = vals[m * n_z : m * n_z + m]
    g_P = vals[m * n_z + m :]
    np.testing.assert_allclose(oracle.step2(MG_T.T, w, g_P), expected, atol=1e-5)
    if native.available():
        np.testing.assert_allclose(native.step2(MG_T, w, g_P), expected, atol=1e-5)
    import jax.numpy as jnp

    zhat_jax = np.asarray(-(jnp.asarray(w) @ jnp.asarray(MG_T)) - jnp.asarray(g_P))
    np.testing.assert_allclose(zhat_jax, expected, atol=1e-5)


@pytest.mark.parametrize("k", CASES)
def test_step4_golden(k):
    tokens, expected = _read("step4", k)
    n_u, N, m = int(tokens[0]), int(tokens[1]), int(tokens[2])
    n_z = n_u * N
    vals = np.asarray(tokens[3:], dtype=np.float32)
    GL_T = vals[: n_z * m].reshape(n_z, m)
    w = vals[n_z * m : n_z * m + m]
    p_D = vals[n_z * m + m : n_z * m + 2 * m]
    zhat = vals[n_z * m + 2 * m :]
    np.testing.assert_allclose(oracle.step4(GL_T.T, w, p_D, zhat), expected, atol=1e-5)
    if native.available():
        np.testing.assert_allclose(native.step4(GL_T, w, p_D, zhat), expected, atol=1e-5)
    import jax.numpy as jnp

    y_jax = np.asarray(
        jnp.maximum(jnp.asarray(w) + jnp.asarray(zhat) @ jnp.asarray(GL_T) + jnp.asarray(p_D), 0.0)
    )
    np.testing.assert_allclose(y_jax, expected, atol=1e-5)
    assert (expected >= 0).all()
