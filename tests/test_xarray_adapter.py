"""xarray adapter tests — run only when xarray is installed (it is absent in
the build image; these validate the bridge wherever it is available)."""

import numpy as np
import pytest

xr = pytest.importorskip("xarray")

from xgcm_tpu import Grid, GriddedArray
from xgcm_tpu.adapters.xarray_adapter import (
    dataarray_from_xarray,
    dataset_from_xarray,
    to_xarray,
)

N = 8


@pytest.fixture()
def xds():
    return xr.Dataset(
        {"temp": (("YC", "XC"), np.random.rand(N, N))},
        coords={
            "XC": ("XC", np.arange(N) + 0.5, {"axis": "X"}),
            "XG": (
                "XG",
                np.arange(N) * 1.0,
                {"axis": "X", "c_grid_axis_shift": -0.5},
            ),
            "YC": ("YC", np.arange(N) + 0.5, {"axis": "Y"}),
            "YG": (
                "YG",
                np.arange(N) * 1.0,
                {"axis": "Y", "c_grid_axis_shift": -0.5},
            ),
        },
    )


def test_dataset_roundtrip(xds):
    ds = dataset_from_xarray(xds)
    assert ds.dims == dict(xds.sizes)
    assert ds.coords["XC"].attrs["axis"] == "X"
    np.testing.assert_allclose(
        np.asarray(ds["temp"].data), xds["temp"].values
    )


def test_grid_accepts_xarray_dataset(xds):
    grid = Grid(xds)  # autoparses COMODO attrs through the adapter
    assert grid.axes["X"].coords == {"center": "XC", "left": "XG"}
    da = dataarray_from_xarray(xds["temp"])
    out = grid.diff(da, "X")
    assert out.dims == ("YC", "XG")


def test_to_xarray_attaches_grid_coords(xds):
    grid = Grid(xds)
    da = dataarray_from_xarray(xds["temp"])
    out = grid.interp(da, "X")
    xa = to_xarray(out, grid)
    assert isinstance(xa, xr.DataArray)
    assert "XG" in xa.coords and "YC" in xa.coords
    np.testing.assert_allclose(xa["XG"].values, xds["XG"].values)


def test_ops_accept_dataarrays_directly(xds):
    grid = Grid(xds)
    implicit = grid.diff(xds["temp"], "X")
    explicit = grid.diff(dataarray_from_xarray(xds["temp"]), "X")
    assert implicit.dims == ("YC", "XG")
    np.testing.assert_allclose(
        np.asarray(implicit.data), np.asarray(explicit.data)
    )


def test_dataset_to_xarray_roundtrip(xds):
    from xgcm_tpu.adapters.xarray_adapter import dataset_to_xarray

    back = dataset_to_xarray(dataset_from_xarray(xds))
    assert dict(back.sizes) == dict(xds.sizes)
    assert back["XG"].attrs["c_grid_axis_shift"] == -0.5
    np.testing.assert_allclose(back["temp"].values, xds["temp"].values)
