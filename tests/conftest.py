"""Test configuration: run everything on a fake 8-device CPU mesh.

Must set XLA flags before jax initialises a backend, so this executes at
conftest import time (pytest imports conftest before test modules).
"""

import os

# Force CPU even when the session env pins JAX_PLATFORMS to a TPU platform:
# unit tests must not compile over the TPU tunnel. jax may already be
# imported by a sitecustomize hook, so the env var alone is not enough —
# use config.update before any backend is initialised.
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


@pytest.fixture
def rng():
    return np.random.default_rng(0)
