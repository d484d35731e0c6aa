"""Test configuration: force the CPU backend with 8 virtual devices so all
sharding/collective tests run without TPU hardware (SURVEY.md §4.5).

Note: this image's sitecustomize registers an ``axon`` TPU-tunnel PJRT plugin
and sets ``jax_platforms=axon,cpu`` programmatically (overriding the env var),
so we must override it back via ``jax.config`` before any backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1337)
