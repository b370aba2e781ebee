"""Test env: force CPU with 8 virtual devices BEFORE jax import.

SURVEY.md §4.2 "Distributed": an 8-device CPU mesh lets shard-invariance and
collective-merge tests run without TPU pod hardware; Pallas kernels run in
interpret mode on CPU and in compiled mode on the real chip (bench path).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
