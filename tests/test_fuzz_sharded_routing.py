"""Randomised sweep of ShardedGrid dispatch across layouts and meshes.

Every (op, layout, mesh mapping) combination must take SOME route —
explicit core-dim halos, face exchange, batch-local shard_map, or the
GSPMD fall-through — and equal the single-device Grid result.  This
fuzzes the routing seams the targeted tests pin individually."""

import itertools

import jax
import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.parallel import ShardedGrid, make_mesh, shard_gridded

from .datasets import cubed_sphere_dataset

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

NX, NY, NZ = 16, 8, 8


def _plain_grid():
    ds = Dataset(coords={
        "xc": ("xc", np.arange(NX) + 0.5, {"axis": "X"}),
        "xg": ("xg", np.arange(NX) * 1.0,
               {"axis": "X", "c_grid_axis_shift": -0.5}),
        "yc": ("yc", np.arange(NY) + 0.5, {"axis": "Y"}),
        "yg": ("yg", np.arange(NY) * 1.0,
               {"axis": "Y", "c_grid_axis_shift": -0.5}),
        "z": ("z", np.arange(NZ) * 1.0, {"axis": "Z"}),
    })
    return Grid(ds)


# mesh mappings exercising: core-dim sharding, batch sharding, both,
# 2-D decomposition, and nothing relevant sharded
PLAIN_MAPPINGS = [
    {"xc": "a", "xg": "a"},
    {"z": "a"},
    {"xc": "a", "xg": "a", "z": "b"},
    {"yc": "a", "yg": "a", "xc": "b", "xg": "b"},
    {"yc": "a", "yg": "a"},
]
OPS = ["interp", "diff", "min", "max", "cumsum"]


@pytest.mark.parametrize(
    "op,mapping",
    list(itertools.product(OPS, range(len(PLAIN_MAPPINGS)))),
    ids=lambda v: str(v),
)
def test_plain_grid_routing_fuzz(op, mapping):
    mapping = PLAIN_MAPPINGS[mapping]
    grid = _plain_grid()
    rng = np.random.RandomState(hash((op, tuple(sorted(mapping)))) % 2**31)
    da = GriddedArray(
        rng.rand(NZ, NY, NX), ("z", "yc", "xc"), name="q"
    )
    mesh = make_mesh({"a": 4, "b": 2})
    sg = ShardedGrid(grid, mesh, mapping)
    sh = shard_gridded(da, mesh, {d: m for d, m in mapping.items()
                                  if d in da.dims})
    expected = getattr(grid, op)(da, "X", boundary="fill")
    out = getattr(sg, op)(sh, "X", boundary="fill")
    assert out.dims == expected.dims
    np.testing.assert_allclose(
        np.asarray(out.data), np.asarray(expected.data), rtol=1e-12
    )


FACE_MAPPINGS = [
    {"face": "a"},
    {"face": "a", "y": "b", "yl": "b"},
    {"y": "a", "yl": "a"},          # in-face sharded, face NOT: GSPMD
    {},                              # nothing sharded
]


@pytest.mark.parametrize(
    "op,mapping",
    list(itertools.product(["interp", "diff"], range(len(FACE_MAPPINGS)))),
    ids=lambda v: str(v),
)
def test_face_grid_routing_fuzz(op, mapping):
    mapping = FACE_MAPPINGS[mapping]
    ds, fc = cubed_sphere_dataset(n=8)
    grid = Grid(ds, face_connections=fc)
    da = ds["data_c"]
    mesh = make_mesh({"a": 2, "b": 4})
    sg = ShardedGrid(grid, mesh, mapping)
    sh = shard_gridded(da, mesh, {d: m for d, m in mapping.items()
                                  if d in da.dims})
    for axis in ("X", "Y"):
        expected = getattr(grid, op)(da, axis, boundary="fill")
        out = getattr(sg, op)(sh, axis, boundary="fill")
        assert out.dims == expected.dims
        np.testing.assert_allclose(
            np.asarray(out.data), np.asarray(expected.data), rtol=1e-12
        )


@pytest.mark.parametrize("mapping_idx", [0, 1])
def test_face_grid_extrapolate_boundary(mapping_idx):
    """extrapolate BC through the face-sharded routes (face-only and
    face x interior) — the one BC mode the face tests did not sweep."""
    mapping, meshspec = [
        ({"face": "f"}, {"f": 6}),
        ({"face": "f", "y": "ym"}, {"f": 2, "ym": 4}),
    ][mapping_idx]
    ds, fc = cubed_sphere_dataset(n=8)
    grid = Grid(ds, face_connections=fc)
    da = ds["data_c"]
    mesh = make_mesh(meshspec)
    sg = ShardedGrid(grid, mesh, mapping)
    sh = shard_gridded(da, mesh, {d: m for d, m in mapping.items()
                                  if d in da.dims})
    for op in ("diff", "interp"):
        for axis in ("X", "Y"):
            expected = getattr(grid, op)(da, axis, boundary="extrapolate")
            out = getattr(sg, op)(sh, axis, boundary="extrapolate")
            np.testing.assert_allclose(
                np.asarray(out.data), np.asarray(expected.data), rtol=1e-12
            )
