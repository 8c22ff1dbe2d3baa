"""Sharded == unsharded equivalence tests on an 8-virtual-device CPU mesh —
the TPU analog of the reference's dask-vs-eager oracle (reference
test_grid.py:241-253, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.parallel import (
    make_mesh,
    shard_gridded,
    sharded_cumsum,
    sharded_face_op,
    sharded_op,
)

from .datasets import cubed_sphere_dataset

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

N = 64
NY = 16


@pytest.fixture()
def grid():
    ds = Dataset(
        coords={
            "xc": ("xc", np.arange(N, dtype=float)),
            "xg": ("xg", np.arange(N, dtype=float)),
            "xr": ("xr", np.arange(N, dtype=float)),
            "yc": ("yc", np.arange(NY, dtype=float)),
            "yg": ("yg", np.arange(NY, dtype=float)),
        }
    )
    return Grid(
        ds,
        coords={
            "X": {"center": "xc", "left": "xg", "right": "xr"},
            "Y": {"center": "yc", "left": "yg"},
        },
        autoparse_metadata=False,
    )


@pytest.mark.parametrize("boundary", ["periodic", "fill", "extend", "extrapolate"])
@pytest.mark.parametrize("op", ["diff", "interp", "min", "max"])
def test_sharded_op_matches_single_device(grid, op, boundary):
    mesh = make_mesh({"x": 8})
    a = np.random.rand(NY, N)
    da = GriddedArray(a, ("yc", "xc"))
    expected = getattr(grid, op)(da, "X", boundary=boundary, fill_value=2.5)

    da_sharded = shard_gridded(da, mesh, {"xc": "x"})
    result = sharded_op(
        grid, op, da_sharded, "X", mesh, {"xc": "x"},
        boundary=boundary, fill_value=2.5,
    )
    assert result.dims == expected.dims
    np.testing.assert_allclose(np.asarray(result.data), np.asarray(expected.data))


@pytest.mark.parametrize("frm_to", [("center", "left"), ("center", "right")])
@pytest.mark.parametrize(
    "boundary", ["fill", "extend", "periodic", "extrapolate"]
)
def test_sharded_cumsum_matches(grid, frm_to, boundary):
    # regression: the periodic wrap of the shifting pairs must read the
    # TRIMMED cumsum's last element (cs[-2]), like the reference's
    # trim-before-pad order — the ring halo of the untrimmed data
    # wrapped cs[-1]
    frm, to = frm_to
    mesh = make_mesh({"x": 8})
    a = np.random.rand(NY, N)
    da = GriddedArray(a, ("yc", "xc"))
    expected = grid.cumsum(da, "X", to=to, boundary=boundary)

    da_sharded = shard_gridded(da, mesh, {"xc": "x"})
    result = sharded_cumsum(
        grid, da_sharded, "X", mesh, {"xc": "x"}, to=to, boundary=boundary
    )
    assert result.dims == expected.dims
    np.testing.assert_allclose(
        np.asarray(result.data), np.asarray(expected.data), rtol=1e-12
    )


def test_gspmd_auto_sharding_matches(grid):
    """The zero-effort path: jit with sharded inputs must agree with eager
    (XLA inserts the halo collectives automatically)."""
    mesh = make_mesh({"x": 8})
    a = np.random.rand(NY, N)
    da = GriddedArray(a, ("yc", "xc"))
    expected = grid.diff(da, "X", boundary="periodic")

    @jax.jit
    def f(x):
        return grid.diff(GriddedArray(x, ("yc", "xc")), "X", boundary="periodic").data

    sharded = shard_gridded(da, mesh, {"xc": "x"})
    out = f(sharded.data)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected.data))


def test_batch_dim_sharding_free(grid):
    """Broadcast-dim data parallelism (reference component #16) is free:
    shard the y (non-core) dim and run the op on X."""
    mesh = make_mesh({"b": 8})
    a = np.random.rand(NY, N)
    da = GriddedArray(a, ("yc", "xc"))
    expected = grid.interp(da, "X")
    sharded = shard_gridded(da, mesh, {"yc": "b"})

    @jax.jit
    def f(x):
        return grid.interp(GriddedArray(x, ("yc", "xc")), "X").data

    np.testing.assert_allclose(np.asarray(f(sharded.data)), np.asarray(expected.data))


class TestFaceSharded:
    @pytest.mark.parametrize("op", ["diff", "interp"])
    @pytest.mark.parametrize("axis", ["X", "Y"])
    def test_cubed_sphere_matches_single_device(self, op, axis):
        ds, fc = cubed_sphere_dataset(n=8)
        grid = Grid(ds, face_connections=fc, periodic=False)
        mesh = make_mesh({"f": 6})

        a = np.random.rand(6, 8, 8)
        da = GriddedArray(a, ("face", "y", "x"))
        expected = getattr(grid, op)(da, axis, boundary="fill")

        da_sharded = shard_gridded(da, mesh, {"face": "f"})
        result = sharded_face_op(
            grid, op, da_sharded, axis, mesh, "f", "X", "Y", boundary="fill"
        )
        assert result.dims == expected.dims
        np.testing.assert_allclose(
            np.asarray(result.data), np.asarray(expected.data)
        )

    def test_face_index_diff_sharded(self):
        """The cubed-sphere neighbour-difference golden values, computed
        with the face dim sharded across 6 devices."""
        ds, fc = cubed_sphere_dataset(n=8)
        grid = Grid(ds, face_connections=fc, periodic=False)
        mesh = make_mesh({"f": 6})
        face_field = GriddedArray(
            np.broadcast_to(
                np.arange(6, dtype=float)[:, None, None], (6, 8, 8)
            ).copy(),
            ("face", "y", "x"),
        )
        sharded = shard_gridded(face_field, mesh, {"face": "f"})
        out = sharded_face_op(
            grid, "diff", sharded, "X", mesh, "f", "X", "Y", boundary="fill"
        )
        arr = np.asarray(out.data)
        np.testing.assert_allclose(arr[:, 0, 0], [-3, 1, 1, 1, 1, 2])
        np.testing.assert_allclose(arr[:, -1, 0], [-3, 1, 1, 1, 1, 2])


def test_single_shard_mesh_periodic_halo():
    """A size-1 mesh axis must self-wrap periodic halos (regression: the
    periodic-width guard rejected every halo when n == 1)."""
    from xgcm_tpu.parallel import ShardedGrid, make_mesh, shard_gridded

    ds = Dataset(coords={
        "xc": ("xc", np.arange(16, dtype=float)),
        "xg": ("xg", np.arange(16) - 0.5),
    })
    grid = Grid(
        ds, coords={"X": {"center": "xc", "left": "xg"}},
        autoparse_metadata=False,
    )
    da = GriddedArray(np.random.RandomState(0).rand(16), ("xc",))
    mesh = make_mesh({"x": 1})
    sgrid = ShardedGrid(grid, mesh, {"xc": "x", "xg": "x"})
    sh = shard_gridded(da, mesh, {"xc": "x"})
    out = sgrid.diff(sh, "X", boundary="periodic")
    expected = grid.diff(da, "X", boundary="periodic")
    np.testing.assert_allclose(np.asarray(out.data), np.asarray(expected.data))
