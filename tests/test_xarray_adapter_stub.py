"""Adapter tests that run WITHOUT xarray installed.

tests/test_xarray_adapter.py validates the bridge against real xarray and
skips when it is absent (as in the build image).  These tests install the
duck-typed stub from tests/fake_xarray.py as ``sys.modules["xarray"]`` and
reload the adapter, so the bridge logic — Dataset/DataArray conversion,
op-entry auto-conversion (``as_native``), and the coordinate reattachment
rule of reference grid_ufunc.py:1195-1266 — is exercised in CI either way.
"""

import importlib
import sys

import numpy as np
import pytest

from xgcm_tpu import Grid, GriddedArray

from . import fake_xarray

N = 8


@pytest.fixture()
def xr():
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
def xds(xr):
    rs = np.random.RandomState(0)
    return xr.Dataset(
        {
            "temp": (("YC", "XC"), rs.rand(N, N)),
            "u": (("YC", "XG"), rs.rand(N, N)),
            "v": (("YG", "XC"), rs.rand(N, N)),
        },
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
    from xgcm_tpu.adapters.xarray_adapter import (
        dataset_from_xarray,
        dataset_to_xarray,
    )

    ds = dataset_from_xarray(xds)
    assert ds.dims == dict(xds.sizes)
    assert ds.coords["XC"].attrs["axis"] == "X"
    np.testing.assert_allclose(np.asarray(ds["temp"].data), xds["temp"].values)

    back = dataset_to_xarray(ds)
    assert dict(back.sizes) == dict(xds.sizes)
    assert back["XG"].attrs["c_grid_axis_shift"] == -0.5
    np.testing.assert_allclose(back["temp"].values, xds["temp"].values)


def test_grid_autoparses_stub_dataset(xds):
    grid = Grid(xds)
    assert grid.axes["X"].coords == {"center": "XC", "left": "XG"}
    assert grid.axes["Y"].coords == {"center": "YC", "left": "YG"}


def test_ops_accept_dataarrays_directly(xds, xr):
    from xgcm_tpu.adapters.xarray_adapter import dataarray_from_xarray

    grid = Grid(xds)
    native = dataarray_from_xarray(xds["temp"])

    # xarray-in -> xarray-out (the reference's contract); native-in stays
    # native
    implicit = grid.diff(xds["temp"], "X")
    explicit = grid.diff(native, "X")
    assert isinstance(implicit, xr.DataArray)
    assert isinstance(explicit, GriddedArray)
    assert implicit.dims == ("YC", "XG")
    np.testing.assert_allclose(
        np.asarray(implicit.data), np.asarray(explicit.data)
    )

    # dict (vector-component) input values convert too
    implicit = grid.interp({"X": xds["u"]}, "X")
    explicit = grid.interp({"X": dataarray_from_xarray(xds["u"])}, "X")
    assert isinstance(implicit, xr.DataArray)
    np.testing.assert_allclose(
        np.asarray(implicit.data), np.asarray(explicit.data)
    )

    # direct-use entry points (no _check_data_input on these paths)
    implicit = grid.cumsum(xds["temp"], "X")
    explicit = grid.cumsum(native, "X")
    assert isinstance(implicit, xr.DataArray)
    np.testing.assert_allclose(
        np.asarray(implicit.data), np.asarray(explicit.data)
    )

    like = grid.interp(native, "X")
    out = grid.interp_like(xds["temp"], like)
    np.testing.assert_allclose(np.asarray(out.data), np.asarray(like.data))


def test_xarray_out_coord_reattachment(xds, xr):
    """Grid coords go on the position-shifted core dim; input coords on
    non-core dims survive and OVERRIDE the grid's (reference
    grid_ufunc.py:1195-1266, GH #496)."""
    grid = Grid(xds)

    temp = xds["temp"]
    # a user-modified coordinate on the Y (non-core for an X-op) dim, plus
    # a non-dim coord riding on it
    recast_yc = xr.DataArray(np.arange(N) * 10.0, dims=("YC",), name="YC")
    temp = temp.assign_coords({"YC": recast_yc,
                               "ylabel": (("YC",), np.arange(N) + 100.0)})

    out = grid.diff(temp, "X", keep_coords=True)
    assert isinstance(out, xr.DataArray)
    assert set(out.dims) == {"YC", "XG"}
    # shifted core dim: coord comes from the GRID dataset
    np.testing.assert_allclose(
        np.asarray(out.coords["XG"].data), np.arange(N) * 1.0
    )
    # non-core dim: the INPUT's (modified) coord wins over the grid's
    np.testing.assert_allclose(
        np.asarray(out.coords["YC"].data), np.arange(N) * 10.0
    )
    # non-dim input coord on a non-core dim is preserved
    np.testing.assert_allclose(
        np.asarray(out.coords["ylabel"].data), np.arange(N) + 100.0
    )

    # keep_coords=False drops non-dim coords and warns its deprecation
    # (reference grid_ufunc.py:1252-1258)
    with pytest.warns(DeprecationWarning, match="keep_coords"):
        out2 = grid.diff(temp, "X", keep_coords=False)
    assert "ylabel" not in out2.coords
    assert "XG" in out2.coords


def test_xarray_out_calculus_and_reductions(xds, xr):
    """derivative / integrate / average / cumint round-trip to xarray;
    reductions keep augmented coords (reference test_grid.py:357-383)."""
    ds = xr.Dataset(
        {"tracer": (("YC", "XC"), np.random.RandomState(2).rand(N, N))},
        coords={
            "XC": ("XC", np.arange(N) + 0.5, {"axis": "X"}),
            "XG": ("XG", np.arange(N) * 1.0,
                   {"axis": "X", "c_grid_axis_shift": -0.5}),
            "YC": ("YC", np.arange(N) + 0.5, {"axis": "Y"}),
            "dx": ("XG", np.full(N, 2.0)),
        },
    )
    grid = Grid(
        ds,
        coords={"X": {"center": "XC", "left": "XG"}, "Y": {"center": "YC"}},
        metrics={("X",): ["dx"]},
        autoparse_metadata=False,
    )
    tr = ds["tracer"]

    d = grid.derivative(tr, "X")
    assert isinstance(d, xr.DataArray)
    np.testing.assert_allclose(
        np.asarray(d.data),
        np.asarray(grid.diff(tr, "X").data) / 2.0,
    )

    integ = grid.integrate(tr, "X")
    assert isinstance(integ, xr.DataArray)
    assert integ.dims == ("YC",)
    assert "YC" in integ.coords

    avg = grid.average(tr, "X")
    assert isinstance(avg, xr.DataArray)

    ci = grid.cumint(tr, "X", boundary="fill")
    assert isinstance(ci, xr.DataArray)
    assert "XG" in ci.dims


def test_vector_ops_accept_dataarrays(xds):
    from xgcm_tpu.adapters.xarray_adapter import dataarray_from_xarray

    grid = Grid(xds)
    with pytest.warns(DeprecationWarning):
        implicit = grid.interp_2d_vector({"X": xds["u"], "Y": xds["v"]})
    with pytest.warns(DeprecationWarning):
        explicit = grid.interp_2d_vector(
            {
                "X": dataarray_from_xarray(xds["u"]),
                "Y": dataarray_from_xarray(xds["v"]),
            }
        )
    for k in ("X", "Y"):
        np.testing.assert_allclose(
            np.asarray(implicit[k].data), np.asarray(explicit[k].data)
        )

    # other_component= kwarg values convert as well
    implicit = grid.diff(
        {"X": xds["u"]}, "X", other_component={"Y": xds["v"]}
    )
    explicit = grid.diff(
        {"X": dataarray_from_xarray(xds["u"])},
        "X",
        other_component={"Y": dataarray_from_xarray(xds["v"])},
    )
    np.testing.assert_allclose(
        np.asarray(implicit.data), np.asarray(explicit.data)
    )


def test_transform_accepts_dataarrays(xr):
    from xgcm_tpu.adapters.xarray_adapter import dataarray_from_xarray

    nz = 6
    rs = np.random.RandomState(1)
    ds = xr.Dataset(coords={"zc": ("zc", np.arange(nz) + 0.5)})
    grid = Grid(
        ds,
        coords={"Z": {"center": "zc"}},
        periodic=False,
        autoparse_metadata=False,
    )
    da = xr.DataArray(rs.rand(nz), dims=("zc",), name="temp")
    sigma = xr.DataArray(np.linspace(20.0, 28.0, nz), dims=("zc",), name="s")
    target = np.linspace(21.0, 27.0, 4)

    implicit = grid.transform(da, "Z", target, target_data=sigma)
    explicit = grid.transform(
        dataarray_from_xarray(da),
        "Z",
        target,
        target_data=dataarray_from_xarray(sigma),
    )
    np.testing.assert_allclose(
        np.asarray(implicit.data), np.asarray(explicit.data)
    )
    # xarray-in -> xarray-out with the target values as the new dim coord
    assert isinstance(implicit, xr.DataArray)
    assert implicit.dims == ("s",)
    np.testing.assert_allclose(np.asarray(implicit.coords["s"].data), target)

    [im] = grid.transform_multi([da], "Z", target, target_data=sigma)
    assert isinstance(im, xr.DataArray)
    np.testing.assert_allclose(
        np.asarray(im.data), np.asarray(explicit.data)
    )


def test_transform_auto_naming_fallback_coord(xr):
    """transform WITHOUT target_data reuses the source dim name and must
    attach the TARGET values as its coordinate (reference
    transform.py:422-449: target_dim defaults to target_data.name = the
    axis coordinate's own name) — including when the target happens to
    have the SAME length as the source, where a size-mismatch heuristic
    would silently keep the stale grid coordinate instead."""
    nz = 6
    rs = np.random.RandomState(3)
    ds = xr.Dataset(coords={"zc": ("zc", np.arange(nz) + 0.5)})
    grid = Grid(
        ds,
        coords={"Z": {"center": "zc"}},
        periodic=False,
        autoparse_metadata=False,
    )
    da = xr.DataArray(np.sort(rs.rand(nz)), dims=("zc",), name="temp")

    # same length as the source, different values
    target_same = np.linspace(1.1, 4.9, nz)
    out = grid.transform(da, "Z", target_same)
    assert out.dims == ("zc",)
    np.testing.assert_allclose(
        np.asarray(out.coords["zc"].data), target_same
    )

    # shorter target: the dim is resized AND carries the target values
    target_dif = np.linspace(0.5, 5.5, 4)
    out2 = grid.transform(da, "Z", target_dif)
    np.testing.assert_allclose(
        np.asarray(out2.coords["zc"].data), target_dif
    )

    # transform_multi routes through the same reattachment
    [om] = grid.transform_multi([da], "Z", target_same)
    np.testing.assert_allclose(
        np.asarray(om.coords["zc"].data), target_same
    )


def test_sharded_grid_accepts_dataarrays(xds, xr):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from xgcm_tpu.adapters.xarray_adapter import dataarray_from_xarray
    from xgcm_tpu.parallel import ShardedGrid, make_mesh

    grid = Grid(xds)
    mesh = make_mesh({"xm": 4, "ym": 2})
    sg = ShardedGrid(
        grid, mesh, {"XC": "xm", "XG": "xm", "YC": "ym", "YG": "ym"}
    )
    implicit = sg.diff(xds["temp"], "X")
    explicit = sg.diff(dataarray_from_xarray(xds["temp"]), "X")
    np.testing.assert_allclose(
        np.asarray(implicit.data), np.asarray(explicit.data)
    )

    [am] = sg.apply_many([dict(op="diff", args=xds["temp"], axis="X")])
    np.testing.assert_allclose(
        np.asarray(am.data), np.asarray(explicit.data)
    )


def test_to_xarray_reattaches_grid_coords(xds, xr):
    from xgcm_tpu.adapters.xarray_adapter import to_xarray

    grid = Grid(xds)
    out = grid.interp(xds["temp"], "X")
    xa = to_xarray(out, grid)
    assert isinstance(xa, xr.DataArray)
    assert "XG" in xa.coords and "YC" in xa.coords
    np.testing.assert_allclose(xa["XG"].values, xds["XG"].values)
    # a coord on a dim NOT in the result is not attached
    assert "XC" not in xa.coords

    # vector-op results (dicts) convert per component
    with pytest.warns(DeprecationWarning):
        vec = grid.interp_2d_vector({"X": xds["u"], "Y": xds["v"]})
    xvec = to_xarray(vec, grid)
    assert set(xvec) == {"X", "Y"}
    assert isinstance(xvec["X"], xr.DataArray)
    assert "XC" in xvec["X"].coords


def test_transform_merges_target_data_coords(xr):
    """Coordinates carried on an xarray target_data that live on dims the
    output keeps are merged into the result (the reference's xr.apply_ufunc
    merges coords from ALL inputs, transform.py:237-268) — with the data
    variable's own coords winning on conflict (first-input-wins)."""
    nz, nx = 6, 4
    rs = np.random.RandomState(2)
    ds = xr.Dataset(coords={"zc": ("zc", np.arange(nz) + 0.5)})
    grid = Grid(
        ds,
        coords={"Z": {"center": "zc"}},
        periodic=False,
        autoparse_metadata=False,
    )
    da = xr.DataArray(rs.rand(nz, nx), dims=("zc", "x"), name="temp")
    sigma = xr.DataArray(
        np.broadcast_to(np.linspace(20.0, 28.0, nz)[:, None], (nz, nx)).copy(),
        dims=("zc", "x"),
        name="s",
        coords={"lon": ("x", np.linspace(0.0, 3.0, nx))},
    )
    target = np.linspace(21.0, 27.0, 4)

    out = grid.transform(da, "Z", target, target_data=sigma)
    assert "lon" in out.coords, "target_data's non-core coord was dropped"
    np.testing.assert_allclose(
        np.asarray(out.coords["lon"].data), np.linspace(0.0, 3.0, nx)
    )

    # first-input-wins: the data variable's own values beat target_data's
    da2 = da.assign_coords({"lon": ("x", np.array([9.0, 9.0, 9.0, 9.0]))})
    out2 = grid.transform(da2, "Z", target, target_data=sigma)
    np.testing.assert_allclose(
        np.asarray(out2.coords["lon"].data), 9.0 * np.ones(nx)
    )

    [outm] = grid.transform_multi([da], "Z", target, target_data=sigma)
    assert "lon" in outm.coords


def test_first_input_wins_coord_precedence(xds, xr):
    """When several inputs carry the same non-core coord, the first
    input's version wins (reference #719 convention; 1:1 twin of
    test_xarray_adapter.py::test_first_input_wins_coord_precedence)."""
    from xgcm_tpu import apply_as_grid_ufunc

    grid = Grid(xds)
    a = xds["temp"].assign_coords({"tag": ("YC", np.arange(N) * 1.0)})
    b = xds["temp"].assign_coords({"tag": ("YC", np.arange(N) * 2.0)})

    def add(x, y):
        return x + y

    out = apply_as_grid_ufunc(
        add, a, b,
        axis=[("X",), ("X",)],
        grid=grid,
        signature="(X:center),(X:center)->(X:center)",
    )
    assert isinstance(out, xr.DataArray)
    np.testing.assert_allclose(
        np.asarray(out.coords["tag"].data), np.arange(N) * 1.0
    )


def test_stub_assign_coords_matches_real_xarray_semantics(xr):
    """The stub reproduces the two real-xarray assign_coords failure modes
    the adapter depends on: ValueError starting with 'conflicting sizes'
    on a size mismatch, and a ValueError on a brand-new dimension."""
    da = xr.DataArray(np.zeros((3, 4)), dims=("y", "x"))
    with pytest.raises(ValueError, match="^conflicting sizes"):
        da.assign_coords({"x": ("x", np.arange(5.0))})
    with pytest.raises(ValueError, match="new dimensions"):
        da.assign_coords({"t": ("time", np.arange(2.0))})
    # the happy paths: mapping and kwargs forms both work
    ok = da.assign_coords({"x": ("x", np.arange(4.0))})
    ok = ok.assign_coords(xlabel=("x", np.arange(4.0) + 10))
    assert "xlabel" in ok.coords


def test_untrimmed_ufunc_raises_trim_hint(xds, xr):
    """A grid ufunc that fails to trim its padding raises the reference's
    'does your grid ufunc correctly trim' hint (reference
    grid_ufunc.py:1240-1248)."""
    from xgcm_tpu import apply_as_grid_ufunc

    grid = Grid(xds)

    def no_trim(x):
        return x  # keeps the 2 padded elements

    with pytest.raises(ValueError, match="correctly trim"):
        apply_as_grid_ufunc(
            no_trim, xds["temp"],
            axis=[("X",)],
            grid=grid,
            signature="(X:center)->(X:center)",
            boundary_width={"X": (1, 1)},
        )


def test_reattach_conflicting_sizes_rewrap(xds, xr):
    """The adapter's assign_coords rewrap branch
    (xarray_adapter.py:141-150): a coord-size conflict with
    boundary_width set gains the padding hint; without boundary_width the
    original xarray error propagates unchanged."""
    from xgcm_tpu.adapters.xarray_adapter import reattach_coords

    grid = Grid(xds)
    # non-core dim YC is one element short: the grid's YC coord (size N)
    # conflicts at reattachment
    bad = GriddedArray(np.zeros((N - 1, N)), ("YC", "XG"), name="z")
    with pytest.raises(ValueError, match="correctly trim"):
        reattach_coords(
            bad, grid, input_args=(), out_core_dim_names={"XG"},
            boundary_width={"X": (1, 1)},
        )
    with pytest.raises(ValueError, match="^conflicting sizes"):
        reattach_coords(
            bad, grid, input_args=(), out_core_dim_names={"XG"},
            boundary_width=None,
        )
