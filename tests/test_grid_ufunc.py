"""Grid-ufunc engine tests: apply_as_grid_ufunc, as_grid_ufunc decorator,
ufunc selection, multi-output, error paths (mirrors the coverage areas of
reference test_grid_ufunc.py)."""

import numpy as np
import pytest
from typing import Annotated, Tuple

from xgcm_tpu import (
    Dataset,
    Grid,
    GriddedArray,
    GridUFuncSignature,
    apply_as_grid_ufunc,
    as_grid_ufunc,
)
from xgcm_tpu.core.grid import _select_grid_ufunc
from xgcm_tpu.core.grid_ufunc import GridUFunc

N = 10


@pytest.fixture()
def grid():
    ds = Dataset(
        coords={
            "xc": ("xc", np.arange(N, dtype=float)),
            "xg": ("xg", np.arange(N, dtype=float)),
            "yc": ("yc", np.arange(N, dtype=float)),
            "yg": ("yg", np.arange(N, dtype=float)),
        }
    )
    return Grid(
        ds,
        coords={
            "X": {"center": "xc", "left": "xg"},
            "Y": {"center": "yc", "left": "yg"},
        },
        autoparse_metadata=False,
    )


class TestApplyAsGridUFunc:
    def test_diff_via_raw_apply(self, grid):
        a = np.random.rand(N)
        da = GriddedArray(a, ("xc",))

        def diff(arr):
            return arr[..., 1:] - arr[..., :-1]

        out = apply_as_grid_ufunc(
            diff,
            da,
            axis=[("X",)],
            grid=grid,
            signature="(X:center)->(X:left)",
            boundary_width={"X": (1, 0)},
        )
        assert out.dims == ("xg",)
        expected = np.concatenate([[a[0] - a[-1]], np.diff(a)])
        np.testing.assert_allclose(np.asarray(out.data), expected)

    def test_dummy_axis_binding(self, grid):
        """Signature axis names are dummies: 'Z' binds to the real 'X'."""
        a = np.random.rand(N)
        da = GriddedArray(a, ("xc",))
        out = apply_as_grid_ufunc(
            lambda arr: arr[..., 1:] - arr[..., :-1],
            da,
            axis=[("X",)],
            grid=grid,
            signature="(Z:center)->(Z:left)",
            boundary_width={"Z": (1, 0)},
        )
        assert out.dims == ("xg",)

    def test_multi_output(self, grid):
        a = np.random.rand(N)
        da = GriddedArray(a, ("xc",))

        def diff_and_interp(arr):
            return arr[..., 1:] - arr[..., :-1], 0.5 * (arr[..., 1:] + arr[..., :-1])

        d, i = apply_as_grid_ufunc(
            diff_and_interp,
            da,
            axis=[("X",)],
            grid=grid,
            signature="(X:center)->(X:left),(X:left)",
            boundary_width={"X": (1, 0)},
        )
        assert d.dims == i.dims == ("xg",)

    def test_multi_input(self, grid):
        a, b = np.random.rand(N), np.random.rand(N)

        def add(x, y):
            return x + y

        out = apply_as_grid_ufunc(
            add,
            GriddedArray(a, ("xc",)),
            GriddedArray(b, ("xc",)),
            axis=[("X",), ("X",)],
            grid=grid,
            signature="(X:center),(X:center)->(X:center)",
        )
        np.testing.assert_allclose(np.asarray(out.data), a + b)

    def test_two_axis_ufunc(self, grid):
        a = np.random.rand(N, N)
        da = GriddedArray(a, ("yc", "xc"))

        def inner_diff(arr):
            # core dims at end in signature order: (yc, xc)
            return arr[..., 1:, 1:] - arr[..., :-1, :-1]

        out = apply_as_grid_ufunc(
            inner_diff,
            da,
            axis=[("Y", "X")],
            grid=grid,
            signature="(Y:center,X:center)->(Y:left,X:left)",
            boundary_width={"Y": (1, 0), "X": (1, 0)},
        )
        assert out.dims == ("yg", "xg")

    def test_no_grid_raises(self):
        with pytest.raises(ValueError, match="Must provide a grid"):
            apply_as_grid_ufunc(lambda a: a, axis=[("X",)], signature="(X:center)->(X:center)")

    def test_no_axis_raises(self, grid):
        da = GriddedArray(np.zeros(N), ("xc",))
        with pytest.raises(ValueError, match="Must provide an axis"):
            apply_as_grid_ufunc(
                lambda a: a, da, grid=grid, signature="(X:center)->(X:center)"
            )

    def test_wrong_position_raises(self, grid):
        da = GriddedArray(np.zeros(N), ("xg",))  # at left, signature says center
        with pytest.raises(ValueError, match="Mismatch between signature"):
            apply_as_grid_ufunc(
                lambda a: a,
                da,
                axis=[("X",)],
                grid=grid,
                signature="(X:center)->(X:center)",
            )

    def test_missing_position_raises(self, grid):
        da = GriddedArray(np.zeros(N), ("xc",))
        with pytest.raises(ValueError, match="does not exist in grid"):
            apply_as_grid_ufunc(
                lambda a: a,
                da,
                axis=[("X",)],
                grid=grid,
                signature="(X:outer)->(X:center)",
            )

    def test_axis_count_mismatch_raises(self, grid):
        da = GriddedArray(np.zeros(N), ("xc",))
        with pytest.raises(ValueError, match="does not match the number of data"):
            apply_as_grid_ufunc(
                lambda a: a,
                da,
                axis=[("X",), ("Y",)],
                grid=grid,
                signature="(X:center)->(X:center)",
            )

    def test_untripped_padding_caught(self, grid):
        """A ufunc that forgets to consume the padding triggers the
        conflicting-sizes error (reference grid_ufunc.py:1240-1248)."""
        da = GriddedArray(np.zeros(N), ("xc",))
        with pytest.raises(ValueError, match="correctly trim"):
            apply_as_grid_ufunc(
                lambda a: a,  # identity: keeps the padded length
                da,
                axis=[("X",)],
                grid=grid,
                signature="(X:center)->(X:left)",
                boundary_width={"X": (1, 0)},
            )

    def test_kwargs_passed_to_kernel(self, grid):
        da = GriddedArray(np.ones(N), ("xc",))
        out = apply_as_grid_ufunc(
            lambda a, scale=1.0: a * scale,
            da,
            axis=[("X",)],
            grid=grid,
            signature="(X:center)->(X:center)",
            scale=3.0,
        )
        np.testing.assert_allclose(np.asarray(out.data), 3.0)


class TestGridUFuncClass:
    def test_decorator_and_call(self, grid):
        @as_grid_ufunc(signature="(X:center)->(X:left)", boundary_width={"X": (1, 0)})
        def diff(a):
            return a[..., 1:] - a[..., :-1]

        a = np.random.rand(N)
        out = diff(grid, GriddedArray(a, ("xc",)), axis=[("X",)])
        assert out.dims == ("xg",)

    def test_repr(self):
        @as_grid_ufunc(signature="(X:center)->(X:left)")
        def f(a):
            return a

        assert "GridUFunc" in repr(f)

    def test_unsupported_kwarg_rejected(self):
        with pytest.raises(TypeError, match="Unsupported keyword"):
            as_grid_ufunc(signature="(X:center)->(X:left)", bogus=1)

    def test_grid_method_entry_point(self, grid):
        a = np.random.rand(N)
        out = grid.apply_as_grid_ufunc(
            lambda arr: arr[..., 1:] - arr[..., :-1],
            GriddedArray(a, ("xc",)),
            axis=[("X",)],
            signature="(X:center)->(X:left)",
            boundary_width={"X": (1, 0)},
        )
        assert out.dims == ("xg",)


class GridOpsMockUp:
    """Mock module namespace for _select_grid_ufunc (the reference's only
    mock, test_grid_ufunc.py:1336-1417)."""

    @staticmethod
    @as_grid_ufunc(signature="(X:center)->(X:left)")
    def diff_center_to_left(a):
        return a

    @staticmethod
    @as_grid_ufunc(signature="(X:center)->(X:right)")
    def diff_center_to_right(a):
        return a

    @staticmethod
    @as_grid_ufunc(signature="(X:center)->(X:left)")
    def interp_center_to_left(a):
        return a


class TestSelectGridUFunc:
    def test_selects_by_name_and_signature(self):
        sig = GridUFuncSignature.from_string("(X:center)->(X:left)")
        f, _ = _select_grid_ufunc("diff", sig, module=GridOpsMockUp)
        assert isinstance(f, GridUFunc)
        assert str(f.signature) == "(X:center)->(X:left)"

    def test_no_name_match(self):
        sig = GridUFuncSignature.from_string("(X:center)->(X:left)")
        with pytest.raises(NotImplementedError, match="pre-defined cumsum"):
            _select_grid_ufunc("cumsum", sig, module=GridOpsMockUp)

    def test_no_signature_match(self):
        sig = GridUFuncSignature.from_string("(X:inner)->(X:outer)")
        with pytest.raises(NotImplementedError, match="with signature"):
            _select_grid_ufunc("diff", sig, module=GridOpsMockUp)


class TestOtherComponentSequence:
    def test_mismatched_lengths_raise(self, grid):
        a = GriddedArray(np.random.rand(N), ("xc",))
        with pytest.raises(ValueError, match="one dictionary per input"):
            apply_as_grid_ufunc(
                lambda x, y: x + y,
                a, a,
                axis=[("X",), ("X",)],
                grid=grid,
                signature="(X:center),(X:center)->(X:center)",
                other_component=[{"Y": a}, {"Y": a}, {"Y": a}],
            )

    def test_default_none_broadcasts(self, grid):
        a = np.random.rand(N)
        out = apply_as_grid_ufunc(
            lambda x, y: x * y,
            GriddedArray(a, ("xc",)),
            GriddedArray(a, ("xc",)),
            axis=[("X",), ("X",)],
            grid=grid,
            signature="(X:center),(X:center)->(X:center)",
        )
        np.testing.assert_allclose(np.asarray(out.data), a * a)
