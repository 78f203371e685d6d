"""Test harness setup: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (the standard
pjit/shard_map emulation recipe, SURVEY.md section 4).

Note: this machine's site customization pins jax_platforms to the 'axon'
TPU tunnel regardless of JAX_PLATFORMS, so we must override the config
explicitly after import."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="session")
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", jax.devices()
    yield
