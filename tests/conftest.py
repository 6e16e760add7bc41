"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a CPU-simulated mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per the project test
strategy (SURVEY.md §4). NOTE: the axon TPU plugin ignores the JAX_PLATFORMS
environment variable, so we must force the platform via jax.config before any
backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    # Function-scoped: a session-scoped generator made every test's data
    # depend on how many draws earlier tests consumed — adding any test
    # could flip unrelated assertions (e.g. rotation vectors crossing the
    # |w| = pi log-branch cut).
    return np.random.default_rng(42)
