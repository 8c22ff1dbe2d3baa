"""Generalized face-sharding tests: faces-per-device blocks, dummy-padded
uneven face counts (13-face LLC on 8 devices), and non-square faces for
straight connections.

Reference analog: the rotated/flipped halo rules of padding.py:70-335 on
the LLC topology that motivates the library (README.rst LLC4320), checked
as sharded == single-device equivalence (the dask-vs-eager analog).
"""

import jax
import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.parallel import (
    ShardedGrid,
    make_mesh,
    shard_gridded,
    sharded_face_op,
)

from .datasets import cubed_sphere_dataset, llc_dataset


def _match(s, e):
    assert s.dims == e.dims
    np.testing.assert_allclose(np.asarray(s.data), np.asarray(e.data))


class TestLLC:
    def test_llc_table_mutually_consistent(self):
        ds, fc = llc_dataset(n=4)
        Grid(ds, face_connections=fc)  # validator raises if inconsistent

    @pytest.mark.parametrize("n_devices", [8, 4, 13 % 8 + 6])  # 8, 4, 11
    @pytest.mark.parametrize("axis", ["X", "Y"])
    def test_llc_sharded_equals_single_device(self, n_devices, axis):
        n_devices = min(n_devices, len(jax.devices()))
        ds, fc = llc_dataset(n=4)
        grid = Grid(ds, face_connections=fc)
        da = ds["data_c"]
        mesh = make_mesh({"f": n_devices}, devices=jax.devices()[:n_devices])
        sh = shard_gridded(da, mesh, {"face": "f"}, uneven_ok=("face",))  # 13 % k != 0
        s = sharded_face_op(
            grid, "diff", sh, axis, mesh, "f", "X", "Y", boundary="fill"
        )
        e = grid.diff(da, axis, boundary="fill")
        _match(s, e)

    def test_llc_vector_components(self):
        ds, fc = llc_dataset(n=4)
        grid = Grid(ds, face_connections=fc)
        u, v = ds["u"], ds["v"]
        mesh = make_mesh({"f": 8}, devices=jax.devices()[:8])
        s = sharded_face_op(
            grid, "diff", {"X": u}, "X", mesh, "f", "X", "Y",
            boundary="fill", other_component={"Y": v},
        )
        e = grid.diff(
            {"X": u}, "X", boundary="fill", other_component={"Y": v}
        )
        _match(s, e)

    def test_llc_through_sharded_grid(self):
        ds, fc = llc_dataset(n=4)
        grid = Grid(ds, face_connections=fc)
        mesh = make_mesh({"f": 8}, devices=jax.devices()[:8])
        sg = ShardedGrid(grid, mesh, {"face": "f"})
        da = ds["data_c"]
        s = sg.interp(sg.shard(da), "Y", boundary="extend")
        e = grid.interp(da, "Y", boundary="extend")
        _match(s, e)


class TestFacesPerDeviceBlocks:
    @pytest.mark.parametrize("n_devices", [2, 3, 6, 8])
    @pytest.mark.parametrize("axis", ["X", "Y"])
    def test_cubed_sphere_any_device_count(self, n_devices, axis):
        """6 faces over 2/3 devices (3 or 2 faces each), 6 (one each), and
        8 (dummy-padded to 8)."""
        ds, fc = cubed_sphere_dataset(n=4)
        grid = Grid(ds, face_connections=fc)
        da = ds["data_c"]
        mesh = make_mesh({"f": n_devices}, devices=jax.devices()[:n_devices])
        sh = shard_gridded(da, mesh, {"face": "f"})
        s = sharded_face_op(
            grid, "diff", sh, axis, mesh, "f", "X", "Y", boundary="extend"
        )
        e = grid.diff(da, axis, boundary="extend")
        _match(s, e)

    def test_cubed_sphere_vector_two_faces_per_device(self):
        ds, fc = cubed_sphere_dataset(n=4)
        grid = Grid(ds, face_connections=fc)
        mesh = make_mesh({"f": 3}, devices=jax.devices()[:3])
        u, v = ds["u"], ds["v"]
        s = sharded_face_op(
            grid, "interp", {"Y": v}, "Y", mesh, "f", "X", "Y",
            boundary="fill", other_component={"X": u},
        )
        e = grid.interp(
            {"Y": v}, "Y", boundary="fill", other_component={"X": u}
        )
        _match(s, e)


def _nonsquare_ring(ny=6, nx=10, reversed_link=False):
    ds = Dataset(
        coords={
            "x": ("x", np.arange(nx) + 0.5, {"axis": "X"}),
            "xl": ("xl", np.arange(nx) * 1.0,
                   {"axis": "X", "c_grid_axis_shift": -0.5}),
            "y": ("y", np.arange(ny) + 0.5, {"axis": "Y"}),
            "yl": ("yl", np.arange(ny) * 1.0,
                   {"axis": "Y", "c_grid_axis_shift": -0.5}),
            "face": ("face", np.arange(4)),
        }
    )
    if reversed_link:
        fc = {"face": {
            0: {"X": (None, (1, "X", False))},
            1: {"X": ((0, "X", False), (2, "X", True))},
            2: {"X": ((3, "X", False), (1, "X", True))},
            3: {"X": (None, (2, "X", False))},
        }}
    else:
        fc = {"face": {
            0: {"X": ((3, "X", False), (1, "X", False))},
            1: {"X": ((0, "X", False), (2, "X", False))},
            2: {"X": ((1, "X", False), (3, "X", False))},
            3: {"X": ((2, "X", False), (0, "X", False))},
        }}
    grid = Grid(ds, face_connections=fc)
    da = GriddedArray(np.random.rand(4, ny, nx), ("face", "y", "x"), name="c")
    return grid, da


class TestNonSquareFaces:
    @pytest.mark.parametrize("axis", ["X", "Y"])
    @pytest.mark.parametrize("boundary", ["fill", "extend", "periodic"])
    def test_straight_ring(self, axis, boundary):
        grid, da = _nonsquare_ring()
        mesh = make_mesh({"f": 4}, devices=jax.devices()[:4])
        sh = shard_gridded(da, mesh, {"face": "f"})
        s = sharded_face_op(
            grid, "interp", sh, axis, mesh, "f", "X", "Y", boundary=boundary
        )
        e = grid.interp(da, axis, boundary=boundary)
        _match(s, e)

    def test_reversed_straight_links(self):
        grid, da = _nonsquare_ring(reversed_link=True)
        mesh = make_mesh({"f": 4}, devices=jax.devices()[:4])
        sh = shard_gridded(da, mesh, {"face": "f"})
        s = sharded_face_op(
            grid, "diff", sh, "X", mesh, "f", "X", "Y", boundary="fill"
        )
        e = grid.diff(da, "X", boundary="fill")
        _match(s, e)

    def test_swap_requires_square(self):
        ny, nx = 6, 10
        ds = Dataset(
            coords={
                "x": ("x", np.arange(nx) + 0.5, {"axis": "X"}),
                "xl": ("xl", np.arange(nx) * 1.0,
                       {"axis": "X", "c_grid_axis_shift": -0.5}),
                "y": ("y", np.arange(ny) + 0.5, {"axis": "Y"}),
                "yl": ("yl", np.arange(ny) * 1.0,
                       {"axis": "Y", "c_grid_axis_shift": -0.5}),
                "face": ("face", np.arange(2)),
            }
        )
        fc = {"face": {
            0: {"X": (None, (1, "Y", False))},
            1: {"Y": ((0, "X", False), None)},
        }}
        grid = Grid(ds, face_connections=fc)
        da = GriddedArray(
            np.random.rand(2, ny, nx), ("face", "y", "x"), name="c"
        )
        mesh = make_mesh({"f": 2}, devices=jax.devices()[:2])
        sh = shard_gridded(da, mesh, {"face": "f"})
        with pytest.raises(ValueError, match="square"):
            sharded_face_op(
                grid, "diff", sh, "X", mesh, "f", "X", "Y", boundary="fill"
            )
