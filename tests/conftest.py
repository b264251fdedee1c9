"""Test configuration: run everything on an 8-virtual-device CPU backend.

This is the TPU-native analog of a fake backend (SURVEY.md §4): pjit/sharding
programs execute identically on 8 host devices, so the multi-chip paths are
exercised without TPU hardware. Must run before jax initializes a backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize may have pre-imported jax with the TPU
# backend selected; override before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
