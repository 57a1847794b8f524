"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run anywhere (no TPU needed), per the driver's multichip dry-run contract."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hermetic CPU tests (env may preset a TPU platform)
os.environ["TTS_TPU_NO_COMPILE_CACHE"] = "1"  # CPU AOT cache isn't host-portable
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon site hook pins JAX_PLATFORMS=axon; the config API still wins
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
