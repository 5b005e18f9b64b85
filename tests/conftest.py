"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests use a virtual device mesh
(xla_force_host_platform_device_count), the standard TPU-less substitute for
pod testing (SURVEY.md §4).  Must set env BEFORE jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the env sets axon (TPU) globally
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU backend via jax.config;
# override it back to CPU for the test suite.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gnn_computing_tpu.graph import rmat_graph, uniform_graph  # noqa: E402


@pytest.fixture(scope="session")
def small_rmat():
    return rmat_graph(200, 2000, seed=7)


@pytest.fixture(scope="session")
def small_uniform():
    return uniform_graph(150, 1200, seed=11)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(123)
