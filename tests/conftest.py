"""Test configuration.

Tests run on CPU with 8 virtual devices (the TPU-analog of the reference's
dask LocalCluster testing strategy, SURVEY.md §4: parametrize over {1 device,
N-device mesh} and assert sharded == single-device).  float64 is enabled so
golden-value comparisons against numpy oracles are exact.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The CI image's sitecustomize imports jax and registers the remote-TPU
# ("axon") backend before any user code runs, so JAX_PLATFORMS env settings
# are too late — the config update below is the only thing that actually
# forces tests onto the (8-virtual-device) CPU backend.
jax.config.update("jax_platforms", "cpu")
# x64 gives exact float64 golden comparisons (the suite's oracles assume it).
# XGCM_TPU_TEST_X32=1 runs in float32 for eyeballing TPU-precision behaviour;
# expect the exact-comparison tests to report ~1e-7-level mismatches there.
if not os.environ.get("XGCM_TPU_TEST_X32"):
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(42)
