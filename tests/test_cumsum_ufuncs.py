"""The gridops cumsum GridUFunc entries (pad-after-func path) must agree
with Grid.cumsum's special path (reference gridops.py:222-279 vs
grid.py:1038-1190)."""

import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.core import gridops

N = 9


def make_grid(pos2dim, boundary):
    sizes = {"center": N, "left": N, "right": N, "inner": N - 1, "outer": N + 1}
    coords = {
        dim: (dim, np.arange(sizes[pos], dtype=float))
        for pos, dim in pos2dim.items()
    }
    ds = Dataset(coords=coords)
    return Grid(
        ds, coords={"X": pos2dim}, boundary=boundary, autoparse_metadata=False
    )


CASES = [
    ("cumsum_center_to_left", {"center": "xc", "left": "xg"}, "xc", "left"),
    ("cumsum_left_to_center", {"left": "xg", "center": "xc"}, "xg", "center"),
    ("cumsum_center_to_right", {"center": "xc", "right": "xg"}, "xc", "right"),
    ("cumsum_right_to_center", {"right": "xg", "center": "xc"}, "xg", "center"),
    ("cumsum_center_to_outer", {"center": "xc", "outer": "xg"}, "xc", "outer"),
    ("cumsum_outer_to_center", {"outer": "xg", "center": "xc"}, "xg", "center"),
    ("cumsum_center_to_inner", {"center": "xc", "inner": "xg"}, "xc", "inner"),
    ("cumsum_inner_to_center", {"inner": "xg", "center": "xc"}, "xg", "center"),
]


@pytest.mark.parametrize("ufunc_name,pos2dim,in_dim,to", CASES)
def test_gridops_cumsum_matches_grid_cumsum(ufunc_name, pos2dim, in_dim, to):
    sizes = {"center": N, "left": N, "right": N, "inner": N - 1, "outer": N + 1}
    frm = [p for p, d in pos2dim.items() if d == in_dim][0]
    grid = make_grid(pos2dim, boundary="fill")
    a = np.random.rand(sizes[frm])
    da = GriddedArray(a, (in_dim,))

    via_grid = grid.cumsum(da, "X", to=to, boundary="fill", fill_value=0.0)
    ufunc = getattr(gridops, ufunc_name)
    via_ufunc = ufunc(
        grid, da, axis=[("X",)], boundary="fill", fill_value=0.0
    )

    assert via_ufunc.dims == via_grid.dims
    np.testing.assert_allclose(
        np.asarray(via_ufunc.data), np.asarray(via_grid.data)
    )
