"""Profiling utility tests (CPU)."""

import jax.numpy as jnp
import numpy as np

from xgcm_tpu.utils import device_time, throughput


def test_device_time_runs():
    x = jnp.asarray(np.random.rand(64, 64).astype(np.float32))
    secs = device_time(lambda a: a * 2.0, x, iters=5)
    assert secs > 0


def test_throughput_reports_points():
    x = jnp.asarray(np.random.rand(32, 32).astype(np.float32))
    out = throughput(lambda a: a + 1.0, x, iters=5)
    assert out["points_per_second"] > 0
    assert abs(out["points_per_second"] * out["seconds_per_iter"] - x.size) < 1


def test_import_orders_no_cycles():
    """Any submodule can be imported first without circular-import errors."""
    import importlib
    import subprocess
    import sys

    for mod in (
        "xgcm_tpu.ops",
        "xgcm_tpu.ops.diagnostics",
        "xgcm_tpu.ops.regridding",
        "xgcm_tpu.parallel",
        "xgcm_tpu.grids",
        "xgcm_tpu.parsers",
    ):
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms','cpu'); "
             f"import {mod}"],
            capture_output=True, text=True, timeout=120,
        )
        assert r.returncode == 0, f"{mod}: {r.stderr[-500:]}"
