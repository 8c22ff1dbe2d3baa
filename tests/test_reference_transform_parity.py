"""Ports of the reference's high-level transform contract tests by exact
name (reference test_transform.py:1072-1399), rewritten against the
native/xarray bridge API.  These cover behaviours the rest of the suite
exercises only implicitly:

- input type validation (`needs to be a`, test_grid_transform_input_check,
  reference :1367-1399)
- ``bypass_checks`` correctness for monotonically increasing data
  (:1194-1223)
- auto-naming of the transformed coordinate when ``target`` is a bare
  numpy array (:1166-1191)
- nameless ``da`` keeps ``name=None`` through transform (:1107-1121)
- conservative + multidimensional target -> NotImplementedError
  (:1072-1083, reference transform.py:467-472)
- periodic axis -> ValueError (:1154-1163)

Runs against real xarray when installed, else against the duck-typed
stub in tests/fake_xarray.py (installed as ``sys.modules["xarray"]``
around each test, mirroring tests/test_xarray_adapter_stub.py).
"""

import importlib
import sys

import numpy as np
import pytest

from xgcm_tpu import Grid, GriddedArray

try:
    import xarray as _real_xr
except ImportError:
    _real_xr = None

from . import fake_xarray

NZ = 20


@pytest.fixture()
def xr():
    if _real_xr is not None:
        yield _real_xr
        return
    import xgcm_tpu.adapters.xarray_adapter as ad

    old = sys.modules.get("xarray")
    sys.modules["xarray"] = fake_xarray
    importlib.reload(ad)
    assert ad.HAS_XARRAY
    try:
        yield fake_xarray
    finally:
        if old is not None:
            sys.modules["xarray"] = old
        else:
            sys.modules.pop("xarray", None)
        importlib.reload(ad)


@pytest.fixture()
def source(xr):
    """Depth -> density setup mirroring the reference's
    construct_test_source_data(cases["linear_depth_dens"]) in spirit:
    monotonic stratification with a nameless-friendly layout."""
    rng = np.random.RandomState(11)
    z = np.arange(NZ) + 0.5
    zo = np.arange(NZ + 1) * 1.0
    dens = np.sort(rng.rand(NZ)) * 5 + 24.0
    data = rng.rand(NZ)
    return xr.Dataset(
        {
            "data": (("zc",), data),
            "dens": (("zc",), dens),
        },
        coords={
            "zc": ("zc", z, {"axis": "Z"}),
            "zo": (
                "zo",
                zo,
                {"axis": "Z", "c_grid_axis_shift": -0.5},
            ),
        },
    )


@pytest.fixture()
def grid(source):
    return Grid(source, periodic=False)


def test_grid_transform_input_check(source, grid):
    """xr.Dataset for `da`, `target`, or `target_data` raises the
    reference's typed ValueError (reference test_transform.py:1367)."""
    target = np.linspace(24.5, 28.5, 7)
    match_msg = r"needs to be a"

    with pytest.raises(ValueError, match=r"`da` " + match_msg):
        grid.transform(source, "Z", target, target_data=source.dens)

    with pytest.raises(ValueError, match=match_msg):
        grid.transform(
            source.data,
            "Z",
            source.dens.to_dataset(name="dummy"),
            target_data=source.dens,
        )

    with pytest.raises(ValueError, match=match_msg):
        grid.transform(
            source.data,
            "Z",
            target,
            target_data=source.dens.to_dataset(name="dummy"),
        )


@pytest.mark.parametrize("bypass_checks", [True, False])
def test_grid_transform_bypass_checks(source, grid, bypass_checks):
    """bypass_checks=True must still deliver the right results for
    monotonically increasing target_data (reference :1194)."""
    target = np.linspace(24.5, 28.5, 7)
    out = grid.transform(
        source.data,
        "Z",
        target,
        target_data=source.dens,
        bypass_checks=bypass_checks,
    )
    expected = np.interp(
        target, source.dens.values, source.data.values,
        left=np.nan, right=np.nan,
    )
    np.testing.assert_allclose(out.values, expected)


@pytest.mark.parametrize("method", ["linear", "conservative"])
def test_grid_transform_auto_naming(source, grid, method):
    """When `target` is a bare numpy array the transformed coordinate is
    named after target_data — or, with no target_data, after the axis's
    own coordinate (center for linear, outer for conservative;
    reference :1166-1191)."""
    if method == "linear":
        target = np.linspace(2.0, 18.0, 5)
        out = grid.transform(source.data, "Z", target, method=method)
        expected_coord = "zc"
    else:
        target = np.linspace(0.0, 20.0, 6)
        out = grid.transform(source.data, "Z", target, method=method)
        expected_coord = "zo"
    assert expected_coord in out.coords

    # and with explicit target_data the name follows the DataArray
    target2 = np.linspace(24.5, 28.5, 5)
    out2 = grid.transform(
        source.data, "Z", target2, target_data=source.dens, method="linear"
    )
    assert "dens" in out2.coords


def test_grid_transform_noname_data(source, grid):
    """A nameless `da` stays nameless through transform (reference
    :1107-1121)."""
    da = source.data.copy()
    da.name = None
    target = np.linspace(24.5, 28.5, 5)
    out = grid.transform(da, "Z", target, target_data=source.dens)
    assert out.name is None


def test_conservative_interp_error_if_multidim_target_dim(source, grid):
    """Conservative + multidimensional target -> NotImplementedError
    (reference :1072, transform.py:467-472)."""
    target2d = GriddedArray(
        np.tile(np.linspace(0.0, 20.0, 6), (3, 1)), ("y", "dens_bins")
    )
    with pytest.raises(NotImplementedError):
        grid.transform(
            source.data,
            "Z",
            target2d,
            target_data=source.dens,
            target_dim="dens_bins",
            method="conservative",
        )


def test_transform_error_periodic(source):
    """transform on a periodic axis raises (reference :1154)."""
    grid_p = Grid(source)  # default periodic=True
    target = np.linspace(24.5, 28.5, 5)
    with pytest.raises(ValueError):
        grid_p.transform(source.data, "Z", target, target_data=source.dens)
