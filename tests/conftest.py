"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
xla_force_host_platform_device_count, the JAX analogue of the reference's
single-machine CTest strategy (SURVEY.md section 4).

Note: this environment's sitecustomize pre-imports jax with a tunneled TPU
backend (JAX_PLATFORMS=axon, multi-ms per-op latency), so the env var is
already consumed — jax.config.update is the only effective override here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running configuration test")
