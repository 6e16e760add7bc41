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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Keep the one-shot full-suite run alive: XLA:CPU's in-process JIT
    segfaults inside backend_compile once the process has accumulated a
    few GB of live compiled executables (~220 tests in; LLVM ORC JIT
    relocation-overflow class — reproduced twice in round 4, stack always
    in compiler.py backend_compile_and_load). Dropping JAX's executable
    caches after every module bounds the live JIT footprint; modules
    recompile their own programs anyway, so the overhead is small."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    # Function-scoped: a session-scoped generator made every test's data
    # depend on how many draws earlier tests consumed — adding any test
    # could flip unrelated assertions (e.g. rotation vectors crossing the
    # |w| = pi log-branch cut).
    return np.random.default_rng(42)
