"""Metadata-parser tests ported by exact reference name
(/root/reference/xgcm/test/test_metadata_parsers.py TestSGRID), rewritten
against the native API.  The ``all_sgrid`` fixture parametrizes over the
reference's three SGRID flavours (2D, 2D+vertical, 3D) with expected axes
tables, mirroring reference datasets.py:185-418/541-547.
"""

import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid
from xgcm_tpu.parsers import metadata, sgrid

from .datasets import dataset_1d_left
from .test_parsers import sgrid_2d_ds, sgrid_3d_ds


def _sgrid_2d_vert_ds():
    ds = sgrid_2d_ds()
    nz = 6
    return Dataset(
        coords={
            **{k: (v.dims, np.asarray(v.data)) for k, v in ds.coords.items()},
            "zc": ("zc", np.arange(nz) + 0.5),
            "zo": ("zo", np.arange(nz + 1) * 1.0),
        },
        data_vars={
            "grid": (
                (),
                np.array(0),
                {
                    **ds["grid"].attrs,
                    "vertical_dimensions": "zc: zo (padding: none)",
                },
            )
        },
        attrs=dict(ds.attrs),
    )


_SGRID_CASES = {
    "sgrid2D": (
        sgrid_2d_ds,
        {
            "X": {"center": "cell_x", "outer": "node_x"},
            "Y": {"center": "cell_y", "outer": "node_y"},
        },
    ),
    "sgrid2D+vert": (
        _sgrid_2d_vert_ds,
        {
            "X": {"center": "cell_x", "outer": "node_x"},
            "Y": {"center": "cell_y", "outer": "node_y"},
            "Z": {"center": "zc", "outer": "zo"},
        },
    ),
    "sgrid3D": (
        sgrid_3d_ds,
        {
            "X": {"center": "cell_x", "outer": "node_x"},
            "Y": {"center": "cell_y", "outer": "node_y"},
            "Z": {"center": "cell_z", "outer": "node_z"},
        },
    ),
}


@pytest.fixture(params=list(_SGRID_CASES))
def all_sgrid(request):
    maker, expected_axes = _SGRID_CASES[request.param]
    return maker(), {"axes": expected_axes}


class TestSGRID:
    def test_valid_sgrid(self, all_sgrid):
        # Check valid SGRID datasets are identified as such
        ds, _ = all_sgrid
        assert sgrid.assert_valid_sgrid(ds)

    def test_invalid_sgrid(self):
        # Check non-valid SGRID datasets are identified as such
        assert not sgrid.assert_valid_sgrid(dataset_1d_left(periodic=False))

    def test_valid_get_grid(self, all_sgrid):
        # Check valid SGRID datasets have correct variable returned
        ds, _ = all_sgrid
        assert ds[sgrid.get_sgrid_grid(ds)].attrs.get("cf_role") == "grid_topology"

    def test_invalid_get_grid(self):
        # Check invalid SGRID datasets raise error
        msg = "Could not find identify SGRID grid in input dataset."
        with pytest.raises(ValueError, match=msg):
            sgrid.get_sgrid_grid(dataset_1d_left(periodic=False))

    def test_4D_sgrid(self):
        # SGRID is designed for 1-3 spatial dimensions
        ds = Dataset(
            data_vars={
                "grid": (
                    (),
                    np.array(1, dtype="int32"),
                    {
                        "cf_role": "grid_topology",
                        "topology_dimension": 4,
                    },
                ),
            },
            attrs={"Conventions": "SGRID-0.3"},
        )
        msg = (
            "SGRID expected dataset with 1-3 spatial dimensions but got 4"
        )
        with pytest.raises(ValueError, match=msg):
            Grid(ds)

    def test_get_all_axes(self, all_sgrid):
        ds, expected = all_sgrid
        assert sgrid.get_all_axes(ds) == expected["axes"].keys()

    def test_get_axis_positions_and_coords(self, all_sgrid):
        ds, expected = all_sgrid
        for ax in sgrid.get_all_axes(ds):
            assert (
                sgrid.get_axis_positions_and_coords(ds, ax)
                == expected["axes"][ax]
            )

    def test_parse_sgrid(self, all_sgrid):
        ds, expected = all_sgrid
        _, parsed_kwargs = metadata.parse_sgrid(ds)
        assert parsed_kwargs["coords"] == expected["axes"]
