"""Test harness config: force the CPU backend with 8 virtual devices.

The test suite never requires TPU hardware; multi-chip sharding tests run on a
faked 8-device CPU mesh (SURVEY §4).  The axon sitecustomize pins
jax_platforms to "axon,cpu" at interpreter start, so we flip it back to cpu
here — conftest imports before any test module touches a backend.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(0)
