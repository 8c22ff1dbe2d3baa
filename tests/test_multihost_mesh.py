"""Multi-host mesh helpers: ICI-topology-aware mesh construction and the
jax.distributed bootstrap wrapper.

Real multi-host cannot run in CI; what CAN be pinned is the single-process
contract (``init_distributed`` is a safe no-op), that
``make_multihost_mesh`` builds a full-device mesh through
``mesh_utils.create_device_mesh`` (the ICI-aware assignment), and that
ops on such a mesh keep the sharded == single-device equivalence that
every other mesh in the suite guarantees.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.parallel import (
    ShardedGrid,
    init_distributed,
    make_multihost_mesh,
    shard_gridded,
)

pytestmark = pytest.mark.quick


def test_init_distributed_single_process_noop():
    # no coordinator derivable on a single-process CPU run: returns False
    # instead of raising, so library code can call it unconditionally
    assert init_distributed() is False


def test_make_multihost_mesh_1d():
    mesh = make_multihost_mesh({"x": 8})
    assert mesh.axis_names == ("x",)
    assert mesh.devices.shape == (8,)
    assert set(mesh.devices.flat) == set(jax.devices())


def test_make_multihost_mesh_2d():
    mesh = make_multihost_mesh({"b": 2, "x": 4})
    assert mesh.axis_names == ("b", "x")
    assert mesh.devices.shape == (2, 4)


def test_make_multihost_mesh_must_span_all_devices():
    with pytest.raises(ValueError, match="exactly the global device count"):
        make_multihost_mesh({"x": 4})


def test_dcn_axes_must_be_mesh_axes():
    with pytest.raises(ValueError, match="not mesh axes"):
        make_multihost_mesh({"x": 8}, dcn_axes={"y": 2})


def test_sharded_op_on_multihost_mesh_matches_single_device():
    nx, ny = 32, 16
    ds = Dataset(
        coords={
            "xc": ("xc", np.arange(nx) + 0.5, {"axis": "X"}),
            "xg": ("xg", np.arange(nx) * 1.0,
                   {"axis": "X", "c_grid_axis_shift": -0.5}),
            "yc": ("yc", np.arange(ny) + 0.5, {"axis": "Y"}),
        }
    )
    grid = Grid(ds)
    rng = np.random.default_rng(0)
    da = GriddedArray(rng.random((ny, nx)), ("yc", "xc"))
    expected = grid.diff(da, "X")

    mesh = make_multihost_mesh({"x": 8})
    sgrid = ShardedGrid(grid, mesh, {"xc": "x", "xg": "x"})
    da_s = shard_gridded(da, mesh, {"xc": "x"})
    out = sgrid.diff(da_s, "X")
    np.testing.assert_allclose(
        np.asarray(jnp.asarray(out.data)), np.asarray(expected.data)
    )


def test_init_distributed_misconfiguration_not_swallowed():
    """A coordinator WITHOUT a process id is a misconfiguration, not a
    single-process run — it must raise, not silently degrade the pod job
    to per-host single-process mode."""
    with pytest.raises(Exception):
        init_distributed(
            coordinator_address="127.0.0.1:65534", num_processes=2
        )


def test_dcn_axes_divisibility_checked():
    with pytest.raises(ValueError, match="does not divide into"):
        make_multihost_mesh({"face": 6, "x": 2}, dcn_axes={"face": 4})


def test_internal_sharded_grid_reconstruction_emits_no_deprecations():
    """The per-shard Grid reconstruction passes boundary/fill_value dicts
    internally; the constructor's forward-compat DeprecationWarnings must
    not reach users of sharded ops."""
    import warnings

    from xgcm_tpu.parallel import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    ds = Dataset(
        coords={
            "xc": ("xc", np.arange(16) + 0.5, {"axis": "X"}),
            "xg": ("xg", np.arange(16) * 1.0,
                   {"axis": "X", "c_grid_axis_shift": -0.5}),
        }
    )
    grid = Grid(ds)
    mesh = make_mesh({"x": min(8, len(jax.devices()))})
    sgrid = ShardedGrid(grid, mesh, {"xc": "x", "xg": "x"})
    da = shard_gridded(
        GriddedArray(np.arange(16.0), ("xc",)), mesh, {"xc": "x"}
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", DeprecationWarning)
        sgrid.diff(da, "X")


def test_grid_factories_emit_no_deprecations():
    import warnings

    from xgcm_tpu.grids import llc_grid, mitgcm_c_grid

    with warnings.catch_warnings():
        warnings.simplefilter("error", DeprecationWarning)
        mitgcm_c_grid()
        llc_grid(n=4)


def test_init_distributed_pod_marker_warns(monkeypatch):
    """ADVICE r4: the no-arg call on a host whose env says multi-process
    (coordinator markers set) must warn loudly when jax.distributed can no
    longer initialize, instead of silently degrading the pod job to
    per-host single-process mode."""
    import warnings

    def _too_late(**kwargs):
        raise RuntimeError(
            "jax.distributed.initialize() must be called before "
            "any JAX computations are executed."
        )

    monkeypatch.setattr(jax.distributed, "initialize", _too_late)
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:8476")
    with pytest.warns(RuntimeWarning, match="multi-host"):
        assert init_distributed() is False

    # without pod markers the same failure is benign: False, no warning
    # (this image's TPU tunnel exports some markers — clear them all)
    for marker in (
        "COORDINATOR_ADDRESS",
        "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
        "TPU_WORKER_HOSTNAMES",
        "TPU_PROCESS_ADDRESSES",
    ):
        monkeypatch.delenv(marker, raising=False)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert init_distributed() is False

    # a caller who PASSED kwargs explicitly wanted multi-process:
    # the too-late error must propagate, not be swallowed
    with pytest.raises(RuntimeError, match="must be called before"):
        init_distributed(coordinator_address="10.0.0.1:8476")
