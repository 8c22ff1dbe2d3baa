"""Grid construction and input-validation tests (mirrors the coverage areas
of reference test_grid.py: TestInvalidGrid, kwarg promotion, periodic
handling, repr, dispatch input errors)."""

import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray

from .datasets import dataset_1d_left, dataset_2d_left


class TestGridCreation:
    def test_basic(self):
        ds = dataset_1d_left()
        grid = Grid(
            ds, coords={"X": {"center": "XC", "left": "XG"}},
            autoparse_metadata=False,
        )
        assert list(grid.axes) == ["X"]
        assert grid.axes["X"].coords == {"center": "XC", "left": "XG"}

    def test_wrong_ds_type(self):
        with pytest.raises(TypeError, match="must be an xgcm_tpu.Dataset"):
            Grid("not a dataset", coords={"X": {"center": "XC"}})

    def test_no_coords_no_metadata(self):
        ds = Dataset(coords={"plain": ("plain", np.arange(4.0))})
        with pytest.raises(ValueError, match="Could not determine Axis names"):
            Grid(ds, autoparse_metadata=False)

    def test_missing_dim_in_coords(self):
        ds = dataset_1d_left()
        with pytest.raises(ValueError, match="Could not find dimension"):
            Grid(
                ds, coords={"X": {"center": "nope"}}, autoparse_metadata=False
            )

    def test_invalid_position(self):
        ds = dataset_1d_left()
        with pytest.raises(ValueError, match="Axis position must be one of"):
            Grid(
                ds, coords={"X": {"middle": "XC"}}, autoparse_metadata=False
            )

    def test_periodic_list(self):
        ds = dataset_2d_left()
        with pytest.warns(DeprecationWarning, match="periodic"):
            grid = Grid(
                ds,
                coords={
                    "X": {"center": "XC", "left": "XG"},
                    "Y": {"center": "YC", "left": "YG"},
                },
                periodic=["X"],
                autoparse_metadata=False,
            )
        assert grid.axes["X"].boundary == "periodic"
        assert grid.axes["Y"].boundary == "fill"

    def test_periodic_false_means_fill(self):
        # reference grid.py:195 gates the deprecation on truthiness, so
        # periodic=False must NOT warn (and neither may anything else)
        ds = dataset_1d_left()
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("error")
            grid = Grid(
                ds,
                coords={"X": {"center": "XC", "left": "XG"}},
                periodic=False,
                autoparse_metadata=False,
            )
        assert grid.axes["X"].boundary == "fill"

    def test_boundary_beats_periodic(self):
        ds = dataset_1d_left()
        grid = Grid(
            ds,
            coords={"X": {"center": "XC", "left": "XG"}},
            boundary="extend",
            autoparse_metadata=False,
        )
        assert grid.axes["X"].boundary == "extend"

    def test_per_axis_boundary_dict(self):
        ds = dataset_2d_left()
        grid = Grid(
            ds,
            coords={
                "X": {"center": "XC", "left": "XG"},
                "Y": {"center": "YC", "left": "YG"},
            },
            boundary={"X": "periodic", "Y": "extend"},
            autoparse_metadata=False,
        )
        assert grid.axes["X"].boundary == "periodic"
        assert grid.axes["Y"].boundary == "extend"

    def test_repr(self):
        ds = dataset_1d_left()
        grid = Grid(
            ds, coords={"X": {"center": "XC", "left": "XG"}},
            autoparse_metadata=False,
        )
        r = repr(grid)
        assert "xgcm_tpu.Grid" in r and "X Axis" in r and "XC" in r

    def test_axis_repr(self):
        ds = dataset_1d_left()
        grid = Grid(
            ds, coords={"X": {"center": "XC", "left": "XG"}},
            autoparse_metadata=False,
        )
        assert "xgcm_tpu.Axis" in repr(grid.axes["X"])


class TestKwargPromotion:
    def test_scalar_promoted(self):
        ds = dataset_2d_left()
        grid = Grid(
            ds,
            coords={
                "X": {"center": "XC", "left": "XG"},
                "Y": {"center": "YC", "left": "YG"},
            },
            autoparse_metadata=False,
        )
        out = grid._map_kwargs_over_axes("fill")
        assert out == {"X": "fill", "Y": "fill"}

    def test_dict_passthrough(self):
        ds = dataset_2d_left()
        grid = Grid(
            ds,
            coords={
                "X": {"center": "XC", "left": "XG"},
                "Y": {"center": "YC", "left": "YG"},
            },
            autoparse_metadata=False,
        )
        out = grid._map_kwargs_over_axes({"X": "fill"})
        assert out == {"X": "fill"}

    def test_defaults_completed(self):
        ds = dataset_2d_left()
        grid = Grid(
            ds,
            coords={
                "X": {"center": "XC", "left": "XG"},
                "Y": {"center": "YC", "left": "YG"},
            },
            boundary={"X": "extend", "Y": "fill"},
            autoparse_metadata=False,
        )
        completed = grid._complete_user_kwargs_using_axis_defaults(
            {"X": "periodic"}, "boundary"
        )
        assert completed == {"X": "periodic", "Y": "fill"}


class TestDispatchInputErrors:
    @pytest.fixture()
    def grid(self):
        ds = dataset_1d_left()
        return Grid(
            ds, coords={"X": {"center": "XC", "left": "XG"}},
            autoparse_metadata=False,
        )

    def test_bad_data_type(self, grid):
        with pytest.raises(TypeError, match="must be either a GriddedArray"):
            grid.diff(np.arange(4.0), "X")

    def test_vector_dict_two_entries(self, grid):
        da = GriddedArray(np.zeros(4), ("XC",))
        with pytest.raises(ValueError, match="exactly one key/value pair"):
            grid.diff({"X": da, "Y": da}, "X")

    def test_vector_dict_unknown_axis(self, grid):
        da = GriddedArray(np.zeros(4), ("XC",))
        with pytest.raises(ValueError, match="unknown axis"):
            grid.diff({"Q": da}, "X")

    def test_vector_dict_bad_value(self, grid):
        with pytest.raises(TypeError, match="must have a GriddedArray"):
            grid.diff({"X": np.zeros(4)}, "X")

    def test_unknown_axis(self, grid):
        da = GriddedArray(np.zeros(100), ("XC",))
        with pytest.raises(KeyError):
            grid.diff(da, "Q")

    def test_invalid_to_position(self, grid):
        da = GriddedArray(np.zeros(100), ("XC",))
        with pytest.raises((NotImplementedError, ValueError, KeyError)):
            grid.diff(da, "X", to="outer")  # grid has no outer position


class TestCoordsFor:
    def test_matching_coords_returned(self):
        ds = dataset_2d_left()
        grid = Grid(
            ds,
            coords={
                "X": {"center": "XC", "left": "XG"},
                "Y": {"center": "YC", "left": "YG"},
            },
            autoparse_metadata=False,
        )
        da = GriddedArray(np.asarray(ds["data_c"].data), ("YC", "XC"))
        out = grid.diff(da, "X")
        coords = grid.coords_for(out)
        assert set(coords) == {"XG", "YC"}
        np.testing.assert_allclose(
            np.asarray(coords["XG"].data), np.asarray(ds.coords["XG"].data)
        )


class TestMoreReferenceParity:
    def test_duplicate_values(self):
        """A dim may serve only one (axis, position) — reference
        test_grid.py:55-71 TestInvalidGrid.test_duplicate_values."""
        ds = Dataset(coords={"xt": ("xt", np.arange(4) + 0.5)})
        with pytest.raises(ValueError, match="more than one axis position"):
            Grid(
                ds, coords={"ax1": {"left": "xt", "right": "xt"}},
                autoparse_metadata=False,
            )
        with pytest.raises(ValueError, match="more than one axis position"):
            Grid(
                ds,
                coords={"ax1": {"left": "xt"}, "ax2": {"right": "xt"}},
                autoparse_metadata=False,
            )

    def test_raise_on_operation_not_valid_for_same_position(self):
        """diff to the SAME position has no predefined ufunc — reference
        test_grid.py:104-110."""
        ds = Dataset(coords={"XC": ("XC", np.arange(5) + 0.5)})
        grid = Grid(
            ds, coords={"X": {"center": "XC"}}, autoparse_metadata=False
        )
        da = GriddedArray(np.arange(5.0), ("XC",))
        with pytest.raises(
            NotImplementedError,
            match="Could not find any pre-defined diff grid ufuncs",
        ):
            grid.diff(da, "X", to="center")

    def test_grid_boundary_invalid_value(self):
        ds = dataset_1d_left()
        with pytest.raises(ValueError, match="boundary must be one of"):
            Grid(
                ds, coords={"X": {"center": "XC", "left": "XG"}},
                boundary="bogus", autoparse_metadata=False,
            )

    def test_fill_value_wrong_type(self):
        ds = dataset_1d_left()
        with pytest.raises(TypeError, match="fill value must be"):
            Grid(
                ds, coords={"X": {"center": "XC", "left": "XG"}},
                fill_value="zero", autoparse_metadata=False,
            )

    def test_two_face_dims_rejected(self):
        ds = dataset_1d_left()
        fc = {"f1": {0: {"X": (None, None)}}, "f2": {0: {"X": (None, None)}}}
        with pytest.raises(ValueError, match="Only one face dimension"):
            Grid(
                ds, coords={"X": {"center": "XC", "left": "XG"}},
                face_connections=fc, autoparse_metadata=False,
            )

    def test_default_shift_override(self):
        ds = dataset_1d_left()
        grid = Grid(
            ds, coords={"X": {"center": "XC", "left": "XG"}},
            default_shifts={"X": {"center": "left"}},
            autoparse_metadata=False,
        )
        assert grid.axes["X"].default_shifts["center"] == "left"

    def test_interp_like_missing_axis_skipped(self):
        """interp_like skips axes absent from either array
        (reference grid.py:571-583)."""
        from .datasets import dataset_2d_left

        ds = dataset_2d_left()
        grid = Grid(
            ds,
            coords={
                "X": {"center": "XC", "left": "XG"},
                "Y": {"center": "YC", "left": "YG"},
            },
            autoparse_metadata=False,
        )
        # array that has only an X dim: the Y axis must be skipped silently
        arr = GriddedArray(np.random.rand(ds.dims["XC"]), ("XC",))
        like = GriddedArray(np.random.rand(ds.dims["XG"]), ("XG",))
        out = grid.interp_like(arr, like, boundary="extend")
        assert out.dims == ("XG",)


class TestVectorDictNoFaceConnections:
    """Reference GH #581 (test_grid.py:258-283): diff_2d_vector /
    interp_2d_vector accept {axis: array} dicts on grids WITHOUT face
    connections, and equal the corresponding scalar ops per component."""

    @pytest.mark.parametrize("func", ["diff_2d_vector", "interp_2d_vector"])
    @pytest.mark.parametrize("boundary", ["fill", "extend"])
    def test_matches_scalar_ops(self, func, boundary):
        from .datasets import datasets_grid_metric

        ds, coords, _ = datasets_grid_metric("C")
        grid = Grid(ds, coords=coords, periodic=True, autoparse_metadata=False)
        scalar = getattr(grid, func.replace("_2d_vector", ""))
        u, v = ds["u"], ds["v"]
        expected = {
            "X": scalar(u, "X", boundary=boundary),
            "Y": scalar(v, "Y", boundary=boundary),
        }
        result = getattr(grid, func)({"X": u, "Y": v}, boundary=boundary)
        for k in ("X", "Y"):
            assert result[k].dims == expected[k].dims
            np.testing.assert_allclose(
                np.asarray(result[k].data), np.asarray(expected[k].data)
            )
