"""Test configuration: run JAX on a virtual 8-device CPU platform.

Multi-chip sharding logic (DP, row-sharded embeddings, global negatives,
top-k merge) is tested without TPU hardware by forcing the host platform to
expose 8 virtual devices, per SURVEY.md §4's test-strategy plan.

Note: this environment's sitecustomize registers a TPU PJRT plugin at
interpreter start with ``JAX_PLATFORMS=axon`` already captured by jax's
config, so mutating ``os.environ`` here is too late for the platform choice —
``jax.config.update`` is required. ``XLA_FLAGS`` is still honoured lazily
when the CPU client is created, so the 8-device override below works.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.devices()[0].platform == "cpu", (
        "Tests must run on the virtual CPU platform, got "
        f"{jax.devices()}"
    )
    assert jax.device_count() == 8


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
