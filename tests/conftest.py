"""Test config: force an 8-device virtual CPU platform before JAX import so
multi-chip sharding paths are testable without TPUs (SURVEY.md section 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even if axon/TPU is wired
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
