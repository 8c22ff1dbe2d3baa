"""Axis tests ported by exact reference name
(/root/reference/xgcm/test/test_axis.py), rewritten against the native
API.  ``test_assert_axes_equal`` is an empty ``...`` stub in the
reference; here it exercises a real axis-equality helper.
"""

import numpy as np
import pytest

from xgcm_tpu.core.axis import Axis

from .datasets import dataset_1d_left


def _assert_axes_equal(ax1, ax2):
    assert ax1.name == ax2.name
    assert ax1.coords == ax2.coords
    assert ax1.default_shifts == ax2.default_shifts
    assert ax1.boundary == ax2.boundary
    assert ax1.fill_value == ax2.fill_value


class TestInit:
    def test_default_init(self):
        ds = dataset_1d_left()
        axis = Axis(name="X", ds=ds, coords={"center": "XC", "left": "XG"})

        # test attributes
        assert axis.name == "X"
        assert axis.coords == {"center": "XC", "left": "XG"}

        # test default values of attributes
        assert axis.default_shifts == {"left": "center", "center": "left"}
        assert axis.boundary == "periodic"

    def test_inconsistent_dims(self):
        """xgcm coord names not present in dataset dims"""
        ds = dataset_1d_left()
        with pytest.raises(ValueError, match="Could not find dimension"):
            Axis(name="X", ds=ds, coords={"center": "lat", "left": "lon"})

    def test_invalid_args(self):
        ds = dataset_1d_left()

        # invalid defaults
        with pytest.raises(ValueError, match="Can't set the default"):
            Axis(
                name="foo",
                ds=ds,
                coords={"center": "XC", "left": "XG"},
                default_shifts={"left": "left", "center": "center"},
            )

        with pytest.raises(ValueError, match="boundary must be one of"):
            Axis(
                name="foo",
                ds=ds,
                coords={"center": "XC", "left": "XG"},
                boundary="blargh",
            )


def test_assert_axes_equal():
    # empty stub in the reference; real assertions here
    ds = dataset_1d_left()
    a = Axis(name="X", ds=ds, coords={"center": "XC", "left": "XG"})
    b = Axis(name="X", ds=ds, coords={"center": "XC", "left": "XG"})
    _assert_axes_equal(a, b)

    c = Axis(
        name="X", ds=ds, coords={"center": "XC", "left": "XG"}, boundary="fill"
    )
    with pytest.raises(AssertionError):
        _assert_axes_equal(a, c)
