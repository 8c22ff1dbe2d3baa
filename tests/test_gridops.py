"""Golden-value tests for every (op, position-pair, boundary) combination,
checked against the independent numpy oracle (the reference's golden-test
style for the op table, test_grid.py / test_grid_ufunc.py)."""

import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray

from .reference_impl import WIDTHS, apply_op, cumsum_op

N = 10


def make_grid(pos2dim, boundary="periodic", n=N):
    """Build a 1D grid whose X axis carries the given positions."""
    sizes = {"center": n, "left": n, "right": n, "inner": n - 1, "outer": n + 1}
    coords = {}
    for pos, dim in pos2dim.items():
        coords[dim] = (dim, np.arange(sizes[pos], dtype=float))
    ds = Dataset(coords=coords)
    grid = Grid(
        ds,
        coords={"X": pos2dim},
        boundary=boundary,
        autoparse_metadata=False,
    )
    return ds, grid


PAIRS = list(WIDTHS.keys())
OPS = ["diff", "interp", "min", "max"]
BOUNDARIES = ["periodic", "fill", "extend", "extrapolate"]


@pytest.mark.parametrize("boundary", BOUNDARIES)
@pytest.mark.parametrize("frm,to", PAIRS)
@pytest.mark.parametrize("op", OPS)
def test_op_golden(op, frm, to, boundary):
    dim_of = {"center": "xc", "left": "xg", "right": "xg", "inner": "xg", "outer": "xg"}
    pos2dim = {frm: dim_of[frm]} if frm == to else {
        frm: dim_of[frm],
        to: "xc" if to == "center" else "xg",
    }
    sizes = {"center": N, "left": N, "right": N, "inner": N - 1, "outer": N + 1}
    _, grid = make_grid(pos2dim, boundary=boundary)

    a = np.random.rand(sizes[frm])
    da = GriddedArray(a, (pos2dim[frm],))

    result = getattr(grid, op)(da, "X", to=to)
    expected = apply_op(op, a, frm, to, boundary=boundary)

    assert result.dims == (pos2dim[to],)
    np.testing.assert_allclose(np.asarray(result.data), expected)


@pytest.mark.parametrize("boundary", ["fill", "extend", "extrapolate"])
@pytest.mark.parametrize(
    "frm,to",
    [
        ("center", "left"),
        ("center", "right"),
        ("center", "inner"),
        ("center", "outer"),
        ("left", "center"),
        ("right", "center"),
        ("inner", "center"),
        ("outer", "center"),
    ],
)
def test_cumsum_golden(frm, to, boundary):
    dim_of = {"center": "xc", "left": "xg", "right": "xg", "inner": "xg", "outer": "xg"}
    pos2dim = {frm: dim_of[frm], to: "xc" if to == "center" else "xg"}
    sizes = {"center": N, "left": N, "right": N, "inner": N - 1, "outer": N + 1}
    _, grid = make_grid(pos2dim, boundary=boundary)

    a = np.random.rand(sizes[frm])
    da = GriddedArray(a, (pos2dim[frm],))

    result = grid.cumsum(da, "X", to=to)
    expected = cumsum_op(a, frm, to, boundary=boundary)

    assert result.dims == (pos2dim[to],)
    np.testing.assert_allclose(np.asarray(result.data), expected)


def test_cumsum_invalid_shift():
    _, grid = make_grid({"left": "xg", "right": "xr"})
    a = GriddedArray(np.random.rand(N), ("xg",))
    with pytest.raises(ValueError, match="not a valid position shift"):
        grid.cumsum(a, "X", to="right")


def test_2d_broadcast_dims_preserved():
    """Op along X must leave a leading broadcast dim untouched and preserve
    input dim order (reference GH #533 semantics)."""
    ds = Dataset(
        coords={
            "xc": ("xc", np.arange(N, dtype=float)),
            "xg": ("xg", np.arange(N, dtype=float)),
        },
        dims={"t": 3},
    )
    grid = Grid(
        ds,
        coords={"X": {"center": "xc", "left": "xg"}},
        autoparse_metadata=False,
    )
    a = np.random.rand(3, N)
    da = GriddedArray(a, ("t", "xc"))
    result = grid.diff(da, "X")
    assert result.dims == ("t", "xg")
    expected = apply_op("diff", a, "center", "left")
    np.testing.assert_allclose(np.asarray(result.data), expected)

    # also with core dim first: output order must follow input order
    da2 = GriddedArray(a.T.copy(), ("xc", "t"))
    result2 = grid.diff(da2, "X")
    assert result2.dims == ("xg", "t")
    np.testing.assert_allclose(np.asarray(result2.data), expected.T)


def test_multi_axis_sequencing():
    """diff over ['X', 'Y'] applies sequentially in order."""
    nx, ny = 6, 7
    ds = Dataset(
        coords={
            "xc": ("xc", np.arange(nx, dtype=float)),
            "xg": ("xg", np.arange(nx, dtype=float)),
            "yc": ("yc", np.arange(ny, dtype=float)),
            "yg": ("yg", np.arange(ny, dtype=float)),
        }
    )
    grid = Grid(
        ds,
        coords={
            "X": {"center": "xc", "left": "xg"},
            "Y": {"center": "yc", "left": "yg"},
        },
        autoparse_metadata=False,
    )
    a = np.random.rand(ny, nx)
    da = GriddedArray(a, ("yc", "xc"))
    result = grid.interp(da, ["X", "Y"])
    ex = apply_op("interp", a, "center", "left")  # along x (last axis)
    ex = apply_op("interp", np.moveaxis(ex, 0, -1), "center", "left")
    ex = np.moveaxis(ex, -1, 0)
    assert result.dims == ("yg", "xg")
    np.testing.assert_allclose(np.asarray(result.data), ex)


def test_fill_value_override():
    _, grid = make_grid({"center": "xc", "left": "xg"}, boundary="fill")
    a = np.random.rand(N)
    da = GriddedArray(a, ("xc",))
    result = grid.diff(da, "X", fill_value=5.0)
    expected = apply_op("diff", a, "center", "left", boundary="fill", fill_value=5.0)
    np.testing.assert_allclose(np.asarray(result.data), expected)


def test_boundary_override_per_call():
    _, grid = make_grid({"center": "xc", "left": "xg"}, boundary="periodic")
    a = np.random.rand(N)
    da = GriddedArray(a, ("xc",))
    result = grid.diff(da, "X", boundary="extend")
    expected = apply_op("diff", a, "center", "left", boundary="extend")
    np.testing.assert_allclose(np.asarray(result.data), expected)


def test_per_axis_boundary_dict_multi_axis():
    """Multi-axis op with different boundary per axis resolves each axis's
    BC independently (reference per-axis kwarg promotion)."""
    nx, ny = 6, 7
    ds = Dataset(
        coords={
            "xc": ("xc", np.arange(nx, dtype=float)),
            "xg": ("xg", np.arange(nx, dtype=float)),
            "yc": ("yc", np.arange(ny, dtype=float)),
            "yg": ("yg", np.arange(ny, dtype=float)),
        }
    )
    grid = Grid(
        ds,
        coords={
            "X": {"center": "xc", "left": "xg"},
            "Y": {"center": "yc", "left": "yg"},
        },
        autoparse_metadata=False,
    )
    a = np.random.rand(ny, nx)
    da = GriddedArray(a, ("yc", "xc"))
    result = grid.diff(
        da, ["X", "Y"],
        boundary={"X": "fill", "Y": "extend"},
        fill_value={"X": 3.0, "Y": 0.0},
    )
    ex = apply_op("diff", a, "center", "left", boundary="fill", fill_value=3.0)
    ex = apply_op(
        "diff", np.moveaxis(ex, 0, -1), "center", "left", boundary="extend"
    )
    ex = np.moveaxis(ex, -1, 0)
    np.testing.assert_allclose(np.asarray(result.data), ex)
