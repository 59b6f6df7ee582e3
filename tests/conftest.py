"""Test config (SURVEY.md §4): run everything on CPU with 8 fake devices so
sharding tests exercise a virtual v5e-8 mesh without hardware, and unit tests
avoid TPU compile latency.

Note: in this image a sitecustomize pre-imports jax and registers the TPU
PJRT plugin, so env vars set here are too late — but backend *initialization*
is lazy, so `jax.config.update('jax_platforms', ...)` before first use still
wins. Set TPU_TESTS=1 to run the suite on the real chip instead.
"""

import os

import jax

if not os.environ.get("TPU_TESTS"):
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
