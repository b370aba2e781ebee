"""Test env: force CPU with 8 virtual devices BEFORE jax import.

SURVEY.md §4.2 "Distributed": an 8-device CPU mesh lets shard-invariance and
collective-merge tests run without TPU pod hardware; Pallas kernels run in
interpret mode on CPU and in compiled mode on the real chip (bench path).
"""

import os

# The session environment presets JAX_PLATFORMS=axon (the TPU tunnel) and the
# axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu") in
# EVERY interpreter — env vars alone cannot force CPU. Override through
# jax.config before any backend is initialized so tests never claim the TPU
# tunnel (which is single-client and makes concurrent test runs hang).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
