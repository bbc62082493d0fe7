"""Test harness configuration.

Forces the CPU backend with 8 virtual devices — the standard fake-TPU
harness for exercising shard_map/pjit/collectives without real multi-chip
hardware (SURVEY.md §4 point (c); the reference has no analogue, its only
parallel path is `MCMCThreads()`).

NOTE: this image pre-imports jax at interpreter startup with
JAX_PLATFORMS=axon (a tunneled TPU with remote compile), so setting the
env var here is too late — the platform must be overridden through
jax.config BEFORE any backend initializes.  Set DEMCMC_TEST_PLATFORM to
run the suite on another backend (e.g. 'tpu' for on-device runs).
"""

import os

import jax

_platform = os.environ.get("DEMCMC_TEST_PLATFORM", "cpu")
jax.config.update("jax_platforms", _platform)
jax.config.update("jax_enable_x64", True)

if _platform == "cpu":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("need 8 virtual CPU devices")
    return devs[:8]


@pytest.fixture()
def rng_np():
    return np.random.default_rng(0)
