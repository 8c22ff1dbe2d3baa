"""Ports of the reference's grid-ufunc/Grid input-contract tests by exact
name, rewritten against the native API:

- TestInputErrorGridMethods / TestInputErrorApplyAsGridUfunc (reference
  test_grid.py:648-788): typed errors for malformed scalar/vector inputs
  at both entry points, including the multi-input ``other_component``
  count check.
- test_stores_ufunc_kwarg_info (reference test_grid_ufunc.py:299-315):
  the ``as_grid_ufunc`` decorator records the signature and rejects
  unknown kwargs with the reference's TypeError.
- test_apply_along_one_axis (reference test_grid_ufunc.py:479-513):
  a 2D array diffed along one axis only, via both the direct call and
  the decorator.
- test_preserves_input_dim_order (reference test_grid_ufunc.py:515-560,
  GH #533): the core dim keeps its slot in the output dim order even
  when it is not last, including when renamed by a position shift.
- test_zero_width_boundary (reference test_grid_ufunc.py:1094-1117):
  ``boundary_width=None`` means no padding at all.
"""

import numpy as np
import pytest

from xgcm_tpu import Grid, GriddedArray, apply_as_grid_ufunc, as_grid_ufunc
from xgcm_tpu.core.grid_ufunc import GridUFunc

from .datasets import datasets_grid_metric


@pytest.fixture()
def cgrid():
    ds, coords, _ = datasets_grid_metric("C")
    return Grid(ds, coords=coords, autoparse_metadata=False)


def _dummy():
    return GriddedArray(np.zeros(4), ("xt",))


class TestInputErrorGridMethods:
    def test_multiple_keys_vector_input(self, cgrid):
        msg = (
            "Vector components provided as dictionaries should contain "
            "exactly one key/value pair"
        )
        with pytest.raises(ValueError, match=msg):
            cgrid.diff({"X": _dummy(), "Y": _dummy()}, "X")

    def test_wrong_input_type_scalar(self, cgrid):
        msg = "All data arguments must be either a GriddedArray or Dictionary"
        with pytest.raises(TypeError, match=msg):
            cgrid.diff("not_a_dataarray", "X")

    def test_wrong_input_type_vector(self, cgrid):
        msg = "Dictionary inputs must have a GriddedArray as value"
        with pytest.raises(TypeError, match=msg):
            cgrid.diff({"X": "not_a_dataarray"}, "X")

    def test_wrong_axis_vector_input_axis(self, cgrid):
        msg = "Vector component with unknown axis provided. Grid has axes"
        with pytest.raises(ValueError, match=msg):
            cgrid.diff({"wrong": _dummy()}, "X")


class TestInputErrorApplyAsGridUfunc:
    def test_multiple_keys_vector_input(self, cgrid):
        msg = (
            "Vector components provided as dictionaries should contain "
            "exactly one key/value pair"
        )
        with pytest.raises(ValueError, match=msg):
            cgrid.apply_as_grid_ufunc(
                lambda x: x, {"X": _dummy(), "Y": _dummy()}, axis="X"
            )

    def test_wrong_input_type_scalar(self, cgrid):
        msg = "All data arguments must be either a GriddedArray or Dictionary"
        with pytest.raises(TypeError, match=msg):
            cgrid.apply_as_grid_ufunc(lambda x: x, "not_a_dataarray", axis="X")

    def test_wrong_input_type_vector(self, cgrid):
        msg = "Dictionary inputs must have a GriddedArray as value"
        with pytest.raises(TypeError, match=msg):
            cgrid.apply_as_grid_ufunc(
                lambda x: x, {"X": "not_a_dataarray"}, axis="X"
            )

    def test_wrong_axis_vector_input_axis(self, cgrid):
        msg = "Vector component with unknown axis provided. Grid has axes"
        with pytest.raises(ValueError, match=msg):
            cgrid.apply_as_grid_ufunc(lambda x: x, {"wrong": _dummy()}, axis="X")

    def test_vector_input_data_other_mismatch(self, cgrid):
        msg = (
            "When providing multiple input arguments, `other_component` "
            "needs to provide one dictionary per input"
        )
        with pytest.raises(ValueError, match=msg):
            cgrid.apply_as_grid_ufunc(
                lambda x: x,
                {"X": _dummy()},
                {"Y": _dummy()},
                {"Z": _dummy()},
                axis="X",
                other_component=[{"X": _dummy()}, {"Y": _dummy()}],
            )

    def test_wrong_input_type_vector_multi_input(self, cgrid):
        msg = "Dictionary inputs must have a GriddedArray as value"
        with pytest.raises(TypeError, match=msg):
            cgrid.apply_as_grid_ufunc(
                lambda x: x,
                {"X": _dummy()},
                {"Y": "not_a_data_array"},
                axis="X",
                other_component=[{"X": _dummy()}, {"Y": _dummy()}],
            )

    def test_wrong_axis_vector_input_axis_multi_input(self, cgrid):
        msg = "Vector component with unknown axis provided. Grid has axes"
        with pytest.raises(ValueError, match=msg):
            cgrid.apply_as_grid_ufunc(
                lambda x: x,
                {"X": _dummy()},
                {"wrong": _dummy()},
                axis="X",
                other_component=[{"X": _dummy()}, {"Y": _dummy()}],
            )


def test_stores_ufunc_kwarg_info():
    signature = "(X:center)->(X:left)"

    @as_grid_ufunc(signature=signature, boundary_width={"X": (1, 0)})
    def diff_center_to_left(a):
        return a[..., 1:] - a[..., :-1]

    assert isinstance(diff_center_to_left, GridUFunc)
    assert str(diff_center_to_left.signature) == signature

    with pytest.raises(TypeError, match="Unsupported keyword argument"):

        @as_grid_ufunc(signature=signature, junk="useless")
        def diff_center_to_left2(a):
            return a


def _grid_2d():
    nlon, nlat = 6, 5
    from xgcm_tpu import Dataset

    ds = Dataset(coords={
        "lon_c": ("lon_c", np.arange(nlon) + 0.5),
        "lon_g": ("lon_g", np.arange(nlon) * 1.0),
        "lat_c": ("lat_c", np.arange(nlat) + 0.5),
        "lat_g": ("lat_g", np.arange(nlat) * 1.0),
    })
    return Grid(
        ds,
        coords={
            "lon": {"center": "lon_c", "left": "lon_g"},
            "lat": {"center": "lat_c", "left": "lat_g"},
        },
        periodic=True,
        autoparse_metadata=False,
    )


def test_apply_along_one_axis():
    grid = _grid_2d()
    rng = np.random.RandomState(2)
    vals = rng.rand(5, 6)
    da = GriddedArray(vals, ("lat_c", "lon_c"))

    def diff_center_to_left(a):
        return a - np.roll(a, shift=-1, axis=-1)

    # roll(-1) pairs x[i] with x[i+1]; under the (X:center)->(X:left)
    # contract with zero boundary width the kernel sees the raw array
    expected = vals - np.roll(vals, shift=-1, axis=-1)

    result = apply_as_grid_ufunc(
        diff_center_to_left,
        da,
        axis=[("lon",)],
        grid=grid,
        signature="(lon:center)->(lon:left)",
    )
    assert result.dims == ("lat_c", "lon_g")
    np.testing.assert_allclose(np.asarray(result.data), expected)

    # decorator form
    @as_grid_ufunc(signature="(X:center)->(X:left)")
    def diff_center_to_left_d(a):
        return a - np.asarray(np.roll(a, shift=-1, axis=-1))

    result2 = diff_center_to_left_d(grid, da, axis=[("lon",)])
    assert result2.dims == ("lat_c", "lon_g")
    np.testing.assert_allclose(np.asarray(result2.data), expected)


def test_preserves_input_dim_order():
    """GH #533: the core dim keeps its slot even when not last."""
    nx, ny, nz = 4, 5, 6
    from xgcm_tpu import Dataset

    ds = Dataset(coords={
        "i": ("i", np.arange(nx) * 1.0),
        "j": ("j", np.arange(ny) * 1.0),
        "jg": ("jg", np.arange(ny) * 1.0),
        "k": ("k", np.arange(nz) * 1.0),
    })
    grid = Grid(
        ds,
        coords={"Y": {"center": "j", "left": "jg"}},
        periodic=True,
        autoparse_metadata=False,
    )
    da = GriddedArray(np.random.rand(nz, ny, nx), ("k", "j", "i"))

    out = grid.apply_as_grid_ufunc(
        lambda a: a,
        da,
        axis=[["Y"]],
        signature="(Y:center)->(Y:center)",
        boundary_width={"Y": (0, 0)},
    )
    assert out.dims == ("k", "j", "i")

    # position-shift rename keeps the slot too
    out_left = grid.apply_as_grid_ufunc(
        lambda a: a,
        da,
        axis=[["Y"]],
        signature="(Y:center)->(Y:left)",
        boundary_width={"Y": (0, 0)},
    )
    assert out_left.dims == ("k", "jg", "i")


def test_zero_width_boundary():
    """boundary_width=None pads nothing: the kernel sees the raw array
    (reference test_grid_ufunc.py:1094, where the kernel type-checks its
    input to prove no dask wrapping happened; here the analog is an
    exact-shape assertion inside the kernel)."""
    from xgcm_tpu import Dataset

    n = 9
    ds = Dataset(coords={
        "depth_c": ("depth_c", np.arange(n) + 0.5),
        "depth_g": ("depth_g", np.arange(n) * 1.0),
    })
    grid = Grid(
        ds,
        coords={"depth": {"center": "depth_c", "left": "depth_g"}},
        periodic=True,
        autoparse_metadata=False,
    )
    a = GriddedArray(np.sin(np.arange(n) * 2 * np.pi / n), ("depth_g",))

    def increment(x):
        assert x.shape[-1] == n  # no padding happened
        return x + 1

    result = apply_as_grid_ufunc(
        increment,
        a,
        axis=[("depth",)],
        grid=grid,
        signature="(depth:left)->(depth:left)",
        boundary_width=None,
    )
    np.testing.assert_allclose(
        np.asarray(result.data), np.asarray(a.data) + 1
    )
