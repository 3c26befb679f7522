"""Test config: force an 8-device virtual CPU platform before any JAX
backend init, so multi-chip sharding paths are testable without TPUs
(SURVEY.md section 4).

Note: on this image the `JAX_PLATFORMS`/`XLA_FLAGS` env vars are not
honored (axon TPU plugin + JAX 0.9 dropped
--xla_force_host_platform_device_count); the jax.config calls below are the
reliable mechanism.
"""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
