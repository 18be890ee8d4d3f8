"""Test configuration: force an 8-device virtual CPU mesh so client-sharded
code paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # overwrite: CI env may pin a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # sitecustomize may pin a TPU platform

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1037)


# ----------------------------------------------------------------------
# Test tiers: `pytest -m smoke` runs the fast unit tier (< ~5 min on one
# CPU core); the unmarked remainder is the compile-heavy integration tier
# (the full suite is ~30+ min, compile-dominated on CPU).
# ----------------------------------------------------------------------

SMOKE_MODULES = {
    "test_aggregate",
    "test_augment",
    "test_data",
    "test_depthwise",
    "test_fused_conv_bn",
    "test_losses",
    "test_metrics",
    "test_pallas_ops",
    "test_pallas_warp",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = os.path.basename(item.nodeid.split("::")[0])
        if mod.endswith(".py"):
            mod = mod[:-3]
        if mod in SMOKE_MODULES and "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)
