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


def test_xarray_in_xarray_out(xds):
    """The reference contract: xarray inputs come back as xr.DataArray with
    grid coords on the shifted core dim (reference grid_ufunc.py:1224-1241)."""
    grid = Grid(xds)
    out = grid.diff(xds["temp"], "X")
    assert isinstance(out, xr.DataArray)
    assert out.dims == ("YC", "XG")
    np.testing.assert_allclose(out["XG"].values, xds["XG"].values)
    np.testing.assert_allclose(out["YC"].values, xds["YC"].values)


def test_input_coords_preserved_on_noncore_dims(xds):
    """Coords the user modified on non-core dims survive the round-trip and
    override the grid's (reference grid_ufunc.py:1204-1222, GH #496)."""
    grid = Grid(xds)
    temp = xds["temp"].assign_coords(
        YC=("YC", np.arange(N) * 10.0),
        ylabel=("YC", np.arange(N) + 100.0),
    )
    out = grid.diff(temp, "X", keep_coords=True)
    np.testing.assert_allclose(out["XG"].values, xds["XG"].values)
    np.testing.assert_allclose(out["YC"].values, np.arange(N) * 10.0)
    np.testing.assert_allclose(out["ylabel"].values, np.arange(N) + 100.0)


def test_first_input_wins_coord_precedence(xds):
    """When several inputs carry the same non-core coord, the first input's
    version wins (reference #719 convention)."""
    from xgcm_tpu import apply_as_grid_ufunc

    grid = Grid(xds)
    a = xds["temp"].assign_coords(tag=("YC", np.arange(N) * 1.0))
    b = xds["temp"].assign_coords(tag=("YC", np.arange(N) * 2.0))

    def add(x, y):
        return x + y

    out = apply_as_grid_ufunc(
        add, a, b,
        axis=[("X",), ("X",)],
        grid=grid,
        signature="(X:center),(X:center)->(X:center)",
    )
    assert isinstance(out, xr.DataArray)
    np.testing.assert_allclose(out["tag"].values, np.arange(N) * 1.0)


def test_keep_coords_false_warns_and_drops(xds):
    """keep_coords=False drops non-dim coords with a DeprecationWarning
    (reference grid_ufunc.py:1252-1258, test_grid.py:386-392)."""
    grid = Grid(xds)
    temp = xds["temp"].assign_coords(ylabel=("YC", np.arange(N) + 100.0))
    with pytest.warns(DeprecationWarning, match="keep_coords"):
        out = grid.diff(temp, "X", keep_coords=False)
    assert "ylabel" not in out.coords
    assert "XG" in out.coords

    out = grid.diff(temp, "X", keep_coords=True)
    assert "ylabel" in out.coords


def test_restore_input_dim_order_xarray(xds):
    """Outputs follow the input's dim order with the core dim renamed in
    place (reference grid_ufunc.py:57-104, GH #533)."""
    grid = Grid(xds)
    transposed = xds["temp"].transpose("XC", "YC")
    out = grid.diff(transposed, "X")
    assert out.dims == ("XG", "YC")


def test_transform_xarray_out(xds):
    nz = 6
    rs = np.random.RandomState(1)
    zds = xr.Dataset(coords={"zc": ("zc", np.arange(nz) + 0.5)})
    grid = Grid(
        zds, coords={"Z": {"center": "zc"}}, periodic=False,
        autoparse_metadata=False,
    )
    da = xr.DataArray(rs.rand(nz), dims=("zc",), name="temp")
    sigma = xr.DataArray(np.linspace(20.0, 28.0, nz), dims=("zc",), name="s")
    target = np.linspace(21.0, 27.0, 4)
    out = grid.transform(da, "Z", target, target_data=sigma)
    assert isinstance(out, xr.DataArray)
    assert out.dims == ("s",)
    np.testing.assert_allclose(out["s"].values, target)


def test_transform_auto_naming_fallback_coord_xarray(xds):
    """Twin of the stub-side test: the no-target_data fallback reuses the
    source dim name with the TARGET values as its coordinate, even when
    target length == source length (reference transform.py:422-449)."""
    nz = 6
    rs = np.random.RandomState(3)
    zds = xr.Dataset(coords={"zc": ("zc", np.arange(nz) + 0.5)})
    grid = Grid(
        zds, coords={"Z": {"center": "zc"}}, periodic=False,
        autoparse_metadata=False,
    )
    da = xr.DataArray(np.sort(rs.rand(nz)), dims=("zc",), name="temp")

    target_same = np.linspace(1.1, 4.9, nz)
    out = grid.transform(da, "Z", target_same)
    assert out.dims == ("zc",)
    np.testing.assert_allclose(out["zc"].values, target_same)

    target_dif = np.linspace(0.5, 5.5, 4)
    out2 = grid.transform(da, "Z", target_dif)
    np.testing.assert_allclose(out2["zc"].values, target_dif)


def test_untrimmed_ufunc_raises_trim_hint(xds):
    """Twin of the stub-side test: an untrimmed grid ufunc raises the
    reference's padding hint (reference grid_ufunc.py:1240-1248)."""
    from xgcm_tpu import apply_as_grid_ufunc

    grid = Grid(xds)

    def no_trim(x):
        return x

    with pytest.raises(ValueError, match="correctly trim"):
        apply_as_grid_ufunc(
            no_trim, xds["temp"],
            axis=[("X",)],
            grid=grid,
            signature="(X:center)->(X:center)",
            boundary_width={"X": (1, 1)},
        )


def test_reattach_conflicting_sizes_rewrap(xds):
    """Twin of the stub-side test: the adapter's rewrap branch against
    REAL xarray's 'conflicting sizes' ValueError."""
    from xgcm_tpu.adapters.xarray_adapter import reattach_coords

    grid = Grid(xds)
    bad = GriddedArray(np.zeros((N - 1, N)), ("YC", "XG"), name="z")
    with pytest.raises(ValueError, match="correctly trim"):
        reattach_coords(
            bad, grid, input_args=(), out_core_dim_names={"XG"},
            boundary_width={"X": (1, 1)},
        )
    with pytest.raises(ValueError, match="conflicting sizes"):
        reattach_coords(
            bad, grid, input_args=(), out_core_dim_names={"XG"},
            boundary_width=None,
        )
