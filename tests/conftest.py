"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX fake-backend idiom (the reference has no test
suite at all — SURVEY.md §4); sharding/collective tests validate the
multi-chip path without TPU hardware.
"""

import os

# The session environment pins JAX_PLATFORMS=axon (single real TPU via a
# tunnel) through a sitecustomize hook that runs before conftest, so the
# env var alone is not enough — update jax.config before any backend use.
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
