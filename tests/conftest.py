"""Test harness: force CPU with 8 virtual devices so multi-chip DP
sharding is exercised without TPU hardware (SURVEY.md §4 —
xla_force_host_platform_device_count trick).

NOTE on this machine: the axon sitecustomize force-sets
jax_platforms="axon,cpu" at interpreter start (ignoring JAX_PLATFORMS),
so the override must happen via jax.config.update AFTER import but
BEFORE first backend use — backends initialize lazily."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_data():
    from dynseg.data.datasets import load_synthetic

    return load_synthetic(seed=0, num_tiles=2, size=128)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
