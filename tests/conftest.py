"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (SURVEY.md §4.4).

Note: this image registers a TPU ('axon') PJRT plugin from sitecustomize at
interpreter start, so JAX_PLATFORMS env munging is too late — we override via
jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
