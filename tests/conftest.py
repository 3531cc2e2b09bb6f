"""Test environment: force CPU with 8 virtual devices so mesh/sharding tests
run anywhere (the multi-chip strategy of SURVEY.md section 4). Must run
before the first ``import jax`` anywhere in the test process."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

if not os.environ.get("TPU_GPAD_TEST_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # A sitecustomize in this image imports jax at interpreter startup, so
    # the env var alone can be captured too late — force the config too.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


REFERENCE_FIXTURES = "/root/reference/Code/CUDA/FinalProject/build/step3"


def backend_tol(cpu: float, tpu: float) -> float:
    """Backend-aware tolerance.

    On the real chip (opt-in via TPU_GPAD_TEST_ON_TPU=1) fp32 'highest'
    matmuls are 6-pass bf16 splits, not host fp32: iterate trajectories
    diverge from the NumPy oracle at relu boundaries, and on near-degenerate
    problem directions the iteration's fixed point sits ~1e-3 in u* from
    the fp64 optimum (identical across engines/forms — measured; the same
    fp32 data reaches 5e-6 on CPU). Feasibility/gap eps-optimality is
    unaffected; only tight u*-distance assertions need the looser bound."""
    import jax

    return tpu if jax.default_backend() == "tpu" else cpu


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Clear the in-process jit/compile caches after every test module.

    The XLA:CPU backend deterministically SEGFAULTS inside
    backend_compile_and_load partway through test_tiled.py when the full
    suite's ~450 compiled executables accumulate in one process (rc=139
    at the same test on three consecutive runs; the module passes alone
    and in every sub-suite tried; RSS was only ~4.4 GB, so not OOM).
    Dropping the caches at module boundaries bounds the live-executable
    count and keeps the suite green at a small recompile cost.
    """
    yield
    import jax

    jax.clear_caches()
