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

# Sub-5-minute smoke core (CLAUDE.md: `pytest -m quick`): the pure-math /
# small-module tests. Modules are auto-marked here so individual tests don't
# need decorators; the full suite (~30 min) remains the green-keeping gate.
_QUICK_MODULES = {
    "test_so3",
    "test_deltas",
    "test_procrustes",
    "test_corruption",
    "test_losses",
    "test_metrics",
    "test_hostload",
    "test_hostmath",
    "test_attention",
    "test_cli",
    "test_reporting",
    "test_native_npz",
    "test_profiling",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: sub-5-minute smoke core (see CLAUDE.md)"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(1337)
