"""Ports of the reference's coordinate-preservation tests by exact name
(reference test_grid_ufunc.py GH #496/#575/#719 block and
test_grid.py::test_cumsum_preserves_input_noncore_coords), rewritten
against the xarray bridge:

- non-core coords carried on the input (dimension AND non-dimension)
  survive the pad/compute/unpad round-trip with values and dtype intact;
- when several inputs carry a same-named non-core coord, the FIRST
  input's values win;
- a vector component supplied as ``{axis: DataArray}`` keeps its
  non-core coords through the unpack + reattach;
- ``Grid.cumsum`` preserves the input's (possibly user-recast) non-core
  coords, attaches the shifted core-dim coord from the grid, and drops
  coords of dims no longer present.

Runs against real xarray when installed, else the duck-typed stub
(tests/fake_xarray.py), mirroring tests/test_reference_transform_parity.py.
"""

import importlib
import sys

import numpy as np
import pytest

from xgcm_tpu import Grid, apply_as_grid_ufunc

try:
    import xarray as _real_xr
except ImportError:
    _real_xr = None

from . import fake_xarray


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


def _depth_grid(xr):
    n = 9
    ds = xr.Dataset(
        coords={
            "depth_c": ("depth_c", np.arange(n) + 0.5, {"axis": "Z"}),
            "depth_g": (
                "depth_g",
                np.arange(n) * 1.0,
                {"axis": "Z", "c_grid_axis_shift": -0.5},
            ),
        }
    )
    return Grid(
        ds,
        coords={"depth": {"center": "depth_c", "left": "depth_g"}},
        periodic=True,
        autoparse_metadata=False,
    )


def _diff_center_to_left(a):
    return a[..., 1:] - a[..., :-1]


def test_non_core_coord_on_input_is_preserved(xr):
    """GH #575: dimension coord `time` and non-dimension coord `label`
    ride on a surviving dim — both must remain, values and dtype intact."""
    grid = _depth_grid(xr)
    time = np.array([10, 20, 30], dtype="float32")
    label = np.array([1, 2, 3], dtype="int64")
    da = xr.DataArray(
        np.random.rand(3, 9),
        dims=("time", "depth_c"),
        coords={"time": ("time", time), "label": ("time", label)},
    )
    result = apply_as_grid_ufunc(
        _diff_center_to_left,
        da,
        axis=[("depth",)],
        grid=grid,
        signature="(X:center)->(X:left)",
        boundary_width={"X": (1, 0)},
    )
    assert "time" in result.coords
    assert "label" in result.coords
    assert result["time"].dtype == time.dtype
    np.testing.assert_array_equal(np.asarray(result["time"].values), time)
    np.testing.assert_array_equal(np.asarray(result["label"].values), label)


def test_non_core_coord_first_input_wins(xr):
    """Same-named non-core coords on multiple inputs: first input wins
    (the setdefault precedence of _reattach_coords, GH #496)."""
    grid = _depth_grid(xr)
    time_a = np.array([10, 20, 30], dtype="float32")
    time_b = np.array([99, 98, 97], dtype="float32")
    a = xr.DataArray(
        np.random.rand(3, 9),
        dims=("time", "depth_c"),
        coords={"time": ("time", time_a)},
    )
    b = xr.DataArray(
        np.random.rand(3, 9),
        dims=("time", "depth_c"),
        coords={"time": ("time", time_b)},
    )

    def diff_of_diff(x, y):
        return (x - y)[..., 1:]

    result = apply_as_grid_ufunc(
        diff_of_diff,
        a,
        b,
        axis=[("depth",), ("depth",)],
        grid=grid,
        signature="(X:center),(X:center)->(X:left)",
        boundary_width={"X": (1, 0)},
    )
    assert "time" in result.coords
    np.testing.assert_array_equal(np.asarray(result["time"].values), time_a)


def test_non_core_coord_on_vector_component_input_is_preserved(xr):
    """{axis: DataArray} vector input keeps its non-core coords through
    unpack + reattach."""
    grid = _depth_grid(xr)
    time = np.array([10, 20, 30], dtype="float32")
    da = xr.DataArray(
        np.random.rand(3, 9),
        dims=("time", "depth_c"),
        coords={"time": ("time", time)},
    )
    result = apply_as_grid_ufunc(
        _diff_center_to_left,
        {"depth": da},
        axis=[("depth",)],
        grid=grid,
        signature="(X:center)->(X:left)",
        boundary_width={"X": (1, 0)},
    )
    assert "time" in result.coords
    assert result["time"].dtype == time.dtype
    np.testing.assert_array_equal(np.asarray(result["time"].values), time)


def test_cumsum_preserves_input_noncore_coords(xr):
    """GH #496/#575 for Grid.cumsum: user-recast non-core coords survive,
    the shifted core coord comes from the grid, and coords of vanished
    dims are dropped."""
    n = 8
    ds = xr.Dataset(
        coords={
            "XC": ("XC", np.arange(n) + 0.5, {"axis": "X"}),
            "XG": (
                "XG",
                np.arange(n) * 1.0,
                {"axis": "X", "c_grid_axis_shift": -0.5},
            ),
            "time": ("time", np.arange(n) * 600.0),
        }
    )
    grid = Grid(
        ds,
        coords={"X": {"center": "XC", "left": "XG"}},
        periodic=True,
        autoparse_metadata=False,
    )
    new_time = (np.arange(n) * 600 / 3600.0).astype(np.float32)
    new_t_label = (np.arange(n) + 100).astype(np.float32)
    new_xc_aux = (np.arange(n) + 500).astype(np.float32)
    v = xr.DataArray(
        np.random.rand(n, n),
        dims=("time", "XC"),
        coords={
            "time": ("time", new_time),
            "t_label": ("time", new_t_label),
            "xc_aux": ("XC", new_xc_aux),
        },
    )
    out = grid.cumsum(v, "X", to="left", keep_coords=True)

    assert out["time"].dtype == np.float32
    np.testing.assert_array_equal(np.asarray(out["time"].values), new_time)
    assert "t_label" in out.coords
    assert out["t_label"].dtype == np.float32
    np.testing.assert_array_equal(
        np.asarray(out["t_label"].values), new_t_label
    )
    assert "XG" in out.coords
    np.testing.assert_array_equal(
        np.asarray(out["XG"].values), np.arange(n) * 1.0
    )
    assert "XC" not in out.dims
    assert "xc_aux" not in out.coords
