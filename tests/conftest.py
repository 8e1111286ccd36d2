"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip sharding tests run against ``xla_force_host_platform_device_count=8``
(the TPU-native analogue of a fake backend — SURVEY.md §4); Pallas kernels
fall back to interpreter mode automatically (ssar_tpu/utils/platform.py).
Must run before jax is imported anywhere.
"""
import os

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin and overrides
# JAX_PLATFORMS; this post-import config update reliably pins tests to the
# virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
