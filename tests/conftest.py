"""Test configuration: CPU backend with 8 virtual devices (to exercise the
multi-chip sharding paths without TPU hardware) and x64 enabled."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The TPU tunnel environment pins JAX_PLATFORMS=axon and pre-imports jax via
# sitecustomize, so the env var alone is not enough — force the config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from mlff_tpu.data.synthetic import make_dataset  # noqa: E402


@pytest.fixture(scope="session")
def ethanol_ds():
    return make_dataset("ethanol", n_samples=400, seed=3)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
