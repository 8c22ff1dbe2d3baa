"""Axis behaviour tests (mirrors reference test_axis.py coverage)."""

import numpy as np
import pytest

from xgcm_tpu import Axis, Dataset, GriddedArray

from .datasets import dataset_1d_left, dataset_1d_outer


class TestAxisCreation:
    def test_basic(self):
        ds = dataset_1d_left()
        ax = Axis(ds, "X", coords={"center": "XC", "left": "XG"})
        assert ax.name == "X"
        assert ax.coords == {"center": "XC", "left": "XG"}
        assert ax.default_shifts == {"center": "left", "left": "center"}
        assert ax.boundary == "periodic"
        assert ax.fill_value == 0.0
        assert ax.periodic

    def test_invalid_position(self):
        ds = dataset_1d_left()
        with pytest.raises(ValueError, match="Axis position must be one of"):
            Axis(ds, "X", coords={"middle": "XC"})

    def test_missing_dim(self):
        ds = dataset_1d_left()
        with pytest.raises(ValueError, match="Could not find dimension"):
            Axis(ds, "X", coords={"center": "nope"})

    def test_bad_name_type(self):
        ds = dataset_1d_left()
        with pytest.raises(TypeError, match="name argument must be"):
            Axis(ds, 123, coords={"center": "XC"})

    def test_bad_ds_type(self):
        with pytest.raises(TypeError, match="ds argument must be"):
            Axis("not a dataset", "X", coords={"center": "XC"})

    def test_bad_boundary(self):
        ds = dataset_1d_left()
        with pytest.raises(ValueError, match="boundary must be one of"):
            Axis(ds, "X", coords={"center": "XC"}, boundary="bogus")

    def test_bad_fill_value(self):
        ds = dataset_1d_left()
        with pytest.raises(TypeError, match="fill value must be"):
            Axis(ds, "X", coords={"center": "XC"}, fill_value="zero")

    def test_override_defaults(self):
        """User default_shifts and boundary beat the inferred ones
        (reference test_axis.py TestInit.test_override_defaults)."""
        ds = dataset_1d_left()
        ax = Axis(
            ds, "foo", coords={"center": "XC", "left": "XG"},
            default_shifts={"left": "inner", "center": "outer"},
            boundary="fill",
        )
        assert ax.name == "foo"
        assert ax.default_shifts == {"left": "inner", "center": "outer"}
        assert ax.boundary == "fill"

    def test_get_axis_dim_num(self):
        """reference test_axis.py::test_get_axis_dim_num."""
        ds = dataset_1d_left()
        ax = Axis(ds, "X", coords={"center": "XC", "left": "XG"})
        da = GriddedArray(np.zeros((3, ds.dims["XG"])), ("t", "XG"))
        assert ax._get_axis_dim_num(da) == da.get_axis_num("XG") == 1

    def test_default_shift_to_self_rejected(self):
        ds = dataset_1d_left()
        with pytest.raises(ValueError, match="Can't set the default shift"):
            Axis(
                ds,
                "X",
                coords={"center": "XC", "left": "XG"},
                default_shifts={"center": "center"},
            )

    def test_fallback_shift_order(self):
        # outer present but left absent: center defaults to outer fallback order
        ds = dataset_1d_outer()
        ax = Axis(ds, "X", coords={"center": "XC", "outer": "XG"})
        assert ax.default_shifts["center"] == "outer"
        assert ax.default_shifts["outer"] == "center"

    def test_custom_default_shifts(self):
        ds = dataset_1d_left()
        ax = Axis(
            ds,
            "X",
            coords={"center": "XC", "left": "XG"},
            default_shifts={"center": "left"},
        )
        assert ax.default_shifts["center"] == "left"


class TestPositionLookup:
    def test_get_position_name(self):
        ds = dataset_1d_left()
        ax = Axis(ds, "X", coords={"center": "XC", "left": "XG"})
        pos, dim = ax._get_position_name(ds["data_c"])
        assert (pos, dim) == ("center", "XC")
        pos, dim = ax._get_position_name(ds["data_g"])
        assert (pos, dim) == ("left", "XG")

    def test_no_matching_dim(self):
        ds = dataset_1d_left()
        ax = Axis(ds, "X", coords={"center": "XC", "left": "XG"})
        stranger = GriddedArray(np.zeros(4), ("t",))
        with pytest.raises(KeyError, match="were found in axis coords"):
            ax._get_position_name(stranger)

    def test_two_matching_dims(self):
        ds = dataset_1d_left()
        ax = Axis(ds, "X", coords={"center": "XC", "left": "XG"})
        both = GriddedArray(np.zeros((4, 4)), ("XC", "XG"))
        with pytest.raises(KeyError, match="more than 1 axis dimension"):
            ax._get_position_name(both)

    def test_axis_dim_num(self):
        ds = dataset_1d_left()
        ax = Axis(ds, "X", coords={"center": "XC", "left": "XG"})
        arr = GriddedArray(np.zeros((3, ds.dims["XC"])), ("t", "XC"))
        assert ax._get_axis_dim_num(arr) == 1
