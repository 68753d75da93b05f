"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use 8 virtual
CPU devices (SURVEY.md §4). Note: this environment's ``sitecustomize``
imports jax at interpreter start with ``JAX_PLATFORMS=axon`` (remote TPU
tunnel), so setting env vars here is too late — we must use
``jax.config.update`` which takes effect as long as no backend has been
initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long end-to-end/pipeline tests (second tier; "
        "run `pytest -m 'not slow'` for the fast tier, see README)",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
