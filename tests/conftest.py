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


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
