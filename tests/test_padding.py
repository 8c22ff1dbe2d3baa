"""Padding primitive tests (reference test_padding.py style: each BC checked
against a manually-constructed expected array)."""

import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.core.padding import pad

N = 6


@pytest.fixture()
def grid():
    ds = Dataset(
        coords={
            "xc": ("xc", np.arange(N, dtype=float)),
            "xg": ("xg", np.arange(N, dtype=float)),
            "yc": ("yc", np.arange(N + 1, dtype=float)),
            "yg": ("yg", np.arange(N + 1, dtype=float)),
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


class TestBasicPadding:
    def test_periodic(self, grid):
        a = np.random.rand(N)
        da = GriddedArray(a, ("xc",))
        out = pad(da, grid, {"X": (1, 1)}, boundary="periodic")
        expected = np.concatenate([[a[-1]], a, [a[0]]])
        np.testing.assert_allclose(np.asarray(out.data), expected)

    def test_fill(self, grid):
        a = np.random.rand(N)
        da = GriddedArray(a, ("xc",))
        out = pad(da, grid, {"X": (2, 1)}, boundary="fill", fill_value=3.0)
        expected = np.concatenate([[3.0, 3.0], a, [3.0]])
        np.testing.assert_allclose(np.asarray(out.data), expected)

    def test_extend(self, grid):
        a = np.random.rand(N)
        da = GriddedArray(a, ("xc",))
        out = pad(da, grid, {"X": (1, 2)}, boundary="extend")
        expected = np.concatenate([[a[0]], a, [a[-1], a[-1]]])
        np.testing.assert_allclose(np.asarray(out.data), expected)

    def test_extrapolate(self, grid):
        a = np.random.rand(N)
        da = GriddedArray(a, ("xc",))
        out = pad(da, grid, {"X": (2, 1)}, boundary="extrapolate")
        expected = np.concatenate([
            [a[0] - 2 * (a[1] - a[0]), a[0] - (a[1] - a[0])],
            a,
            [a[-1] + (a[-1] - a[-2])],
        ])
        np.testing.assert_allclose(np.asarray(out.data), expected)

    def test_default_boundary_is_periodic(self, grid):
        a = np.random.rand(N)
        da = GriddedArray(a, ("xc",))
        out = pad(da, grid, {"X": (1, 0)})
        np.testing.assert_allclose(
            np.asarray(out.data), np.concatenate([[a[-1]], a])
        )

    def test_mixed_boundaries_per_axis(self, grid):
        a = np.random.rand(N + 1, N)
        da = GriddedArray(a, ("yc", "xc"))
        out = pad(
            da,
            grid,
            {"X": (1, 1), "Y": (1, 1)},
            boundary={"X": "periodic", "Y": "fill"},
            fill_value={"X": 0.0, "Y": 9.0},
        )
        expected = np.pad(a, ((0, 0), (1, 1)), mode="wrap")
        expected = np.pad(
            expected, ((1, 1), (0, 0)), mode="constant", constant_values=9.0
        )
        np.testing.assert_allclose(np.asarray(out.data), expected)

    def test_zero_width_noop(self, grid):
        a = np.random.rand(N)
        da = GriddedArray(a, ("xc",))
        out = pad(da, grid, {"X": (0, 0)})
        assert out is da

    def test_none_width_noop(self, grid):
        a = np.random.rand(N)
        da = GriddedArray(a, ("xc",))
        assert pad(da, grid, None) is da

    def test_vector_dict_unpacked_on_basic_path(self, grid):
        a = np.random.rand(N)
        da = {"X": GriddedArray(a, ("xc",))}
        out = pad(da, grid, {"X": (1, 0)}, boundary="fill")
        np.testing.assert_allclose(
            np.asarray(out.data), np.concatenate([[0.0], a])
        )

    def test_jit_compatible(self, grid):
        import jax

        a = np.random.rand(N)

        @jax.jit
        def f(x):
            return pad(GriddedArray(x, ("xc",)), grid, {"X": (1, 1)}).data

        np.testing.assert_allclose(
            np.asarray(f(a)), np.concatenate([[a[-1]], a, [a[0]]])
        )
