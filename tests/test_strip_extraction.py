"""The lane-major column-strip extraction helpers must be value-identical
to the plain column slice they replace.

``x[..., :, col]`` into a lanes-major strip table lets XLA's layout
assignment relayout the whole parent array (a full-size {1,2,0} copy per op
call, observed in the LLC4320 vorticity HLO); the helpers extract the same
values by slicing one 128-lane tile block and one-hot-SELECTING it before
the reduce (never multiplying — 0*NaN would poison the strip through any
non-finite value sharing the window).  These tests pin the value contract
for every shape class the dispatch distinguishes, including non-finite
data and the end-to-end NaN footprint of face halos."""

import numpy as np
import pytest

import jax.numpy as jnp

from xgcm_tpu.ops.fused import _column_as_row, _edge_strips, _inward_line

pytestmark = pytest.mark.quick


@pytest.mark.parametrize("nx", [8, 100, 128, 200, 256, 540, 4320 // 8])
@pytest.mark.parametrize("dtype", [np.float32, np.float64, jnp.bfloat16])
def test_column_as_row_matches_slice(nx, dtype):
    rng = np.random.RandomState(int(nx))
    x = jnp.asarray(rng.rand(3, 16, nx)).astype(dtype)
    for col in {0, 1, nx // 2, nx - 2, nx - 1}:
        got = _column_as_row(x, col)
        want = x[..., :, col]
        assert got.dtype == x.dtype
        np.testing.assert_array_equal(
            np.asarray(got, np.float64), np.asarray(want, np.float64)
        )


def test_column_as_row_nonfinite_neighbours_do_not_leak():
    """NaN/inf anywhere in the 128-lane window must NOT poison the
    extracted column (0*NaN = NaN killed the multiply-by-one-hot
    formulation); NaN AT the column must come through.  (Documented
    caveat: a selected -0.0 returns as the value-equal +0.0.)"""
    rng = np.random.RandomState(1)
    nx = 300
    x = rng.rand(2, 16, nx).astype(np.float32)
    x[0, 3, 5] = np.nan       # near column 0, same window
    x[1, 7, 1] = np.inf
    x[0, 9, nx - 4] = -np.inf  # near column nx-1, same window
    x[1, 2, 0] = np.nan        # AT column 0
    x[0, 5, 0] = -0.0          # comes back +0.0 (value-equal)
    xj = jnp.asarray(x)
    for col in (0, nx - 1):
        got = np.asarray(_column_as_row(xj, col))
        want = x[..., :, col]
        np.testing.assert_array_equal(got, want)


def test_cubed_sphere_halo_unpoisoned_by_interior_nan():
    """End-to-end: an interior NaN (land-mask style) 5 cells from a face
    edge must produce exactly the NaN footprint of the generic engine —
    not a whole NaN halo column on the neighbouring face."""
    from xgcm_tpu import Grid, GriddedArray

    from .datasets import cubed_sphere_dataset

    # n >= 128 so the windowed one-hot path (not the small-array slice
    # fallback) is the one driven end-to-end
    ds, fc = cubed_sphere_dataset(n=256)
    grid = Grid(ds, face_connections=fc, periodic=False)
    from xgcm_tpu.core import gridops

    # interior NaN near the left edge: shares column 0's 128-lane window
    a = np.random.RandomState(2).rand(6, 256, 256)
    a[0, 10, 5] = np.nan
    da = GriddedArray(a, ("face", "y", "x"))
    fused = grid.diff(da, "X", to="left", boundary="fill")
    generic = gridops.diff_center_to_left(
        grid, da, axis=[("X",)], boundary="fill"
    )
    np.testing.assert_array_equal(
        np.asarray(fused.data), np.asarray(generic.data)
    )
    assert int(np.isnan(np.asarray(fused.data)).sum()) == 2

    # NaN ON an edge whose face sources halos from a DIFFERENT side: the
    # side-selection one-hot must not leak it into the picked strip
    b = np.random.RandomState(3).rand(6, 256, 256)
    b[0, 0, 7] = np.nan  # Y-left edge row of face 0
    db = GriddedArray(b, ("face", "y", "x"))
    fused_b = grid.diff(db, "X", to="left", boundary="fill")
    generic_b = gridops.diff_center_to_left(
        grid, db, axis=[("X",)], boundary="fill"
    )
    np.testing.assert_array_equal(
        np.asarray(fused_b.data), np.asarray(generic_b.data)
    )
    # every axis/direction, both ops, with edge NaNs on several faces
    c = np.random.RandomState(4).rand(6, 256, 256)
    c[1, 0, 3] = np.nan
    c[2, 255, 9] = np.nan
    c[3, 4, 0] = np.nan
    c[4, 8, 255] = np.nan
    dc = GriddedArray(c, ("face", "y", "x"))
    for op, fn in (("diff", gridops.diff_center_to_left),
                   ("interp", gridops.interp_center_to_left)):
        for ax in ("X", "Y"):
            got = getattr(grid, op)(dc, ax, to="left", boundary="extend")
            want = fn(grid, dc, axis=[(ax,)], boundary="extend")
            np.testing.assert_array_equal(
                np.asarray(got.data), np.asarray(want.data)
            )


def test_sharded_face_halo_unpoisoned_by_edge_nan():
    """Sharded == single-device with NaNs ON face edges: the windowed
    one-hot strip pool and the per-edge plan must reproduce the exact
    NaN footprint of the eager path."""
    import jax

    from xgcm_tpu import Grid, GriddedArray
    from xgcm_tpu.parallel import make_mesh, shard_gridded, sharded_face_op

    from .datasets import cubed_sphere_dataset

    ds, fc = cubed_sphere_dataset(n=144)  # >= 128: windowed one-hot path
    grid = Grid(ds, face_connections=fc, periodic=False)
    a = np.random.RandomState(5).rand(6, 144, 144)
    a[0, 0, 7] = np.nan    # Y-left edge
    a[1, 3, 0] = np.nan    # X-left edge
    a[2, 143, 2] = np.nan  # Y-right edge
    da = GriddedArray(a, ("face", "y", "x"))
    n_dev = min(6, len(jax.devices()))
    mesh = make_mesh({"f": n_dev}, devices=jax.devices()[:n_dev])
    sh = shard_gridded(da, mesh, {"face": "f"}, uneven_ok=("face",))
    s = sharded_face_op(
        grid, "diff", sh, "X", mesh, "f", "X", "Y", boundary="fill"
    )
    e = grid.diff(da, "X", boundary="fill")
    assert s.dims == e.dims
    np.testing.assert_array_equal(np.asarray(s.data), np.asarray(e.data))


def test_sharded_cols_lane_major_nonfinite():
    from xgcm_tpu.parallel.face_sharded import _cols_lane_major

    x = np.random.RandomState(3).rand(3, 12, 260).astype(np.float32)
    x[0, 3, 5] = np.nan   # in window of column 0, not selected
    x[1, 4, 0] = np.inf   # at column 0
    got = np.asarray(_cols_lane_major(jnp.asarray(x), jnp.asarray([0, 1])))
    want = np.swapaxes(x[..., :, [0, 1]], -1, -2)
    np.testing.assert_array_equal(got, want)


def test_column_as_row_batched_and_integer():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 5, 12, 300).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(_column_as_row(x, 299)), np.asarray(x[..., :, 299])
    )
    xi = jnp.asarray(rng.randint(-50, 50, (3, 8, 256)))
    np.testing.assert_array_equal(
        np.asarray(_column_as_row(xi, 7)), np.asarray(xi[..., :, 7])
    )


@pytest.mark.parametrize("n", [6, 128, 384])
def test_edge_strips_match_naive_stack(n):
    rng = np.random.RandomState(n)
    x = jnp.asarray(rng.rand(4, n, n).astype(np.float32))
    got = _edge_strips(x, n, n)
    want = jnp.stack(
        [x[..., :, 0], x[..., :, n - 1], x[..., 0, :], x[..., n - 1, :]],
        axis=-2,
    )
    assert got.shape == (4, 4, n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_edge_strips_rejects_rectangular_faces():
    x = jnp.zeros((2, 8, 16), jnp.float32)
    with pytest.raises(ValueError):
        _edge_strips(x, 8, 16)


@pytest.mark.parametrize("side", [0, 1, 2, 3])
@pytest.mark.parametrize("n", [6, 256])
def test_inward_line_matches_slices(side, n):
    rng = np.random.RandomState(side)
    x = jnp.asarray(rng.rand(3, n, n).astype(np.float32))
    want = {
        0: x[..., :, 1], 1: x[..., :, n - 2],
        2: x[..., 1, :], 3: x[..., n - 2, :],
    }[side]
    np.testing.assert_array_equal(
        np.asarray(_inward_line(x, side, n, n)), np.asarray(want)
    )


def test_sharded_cols_lane_major_matches_take():
    """The face_sharded twin: windowed one-hot extraction == take+swapaxes
    for contiguous ascending and descending index bundles; out-of-range
    indices (other shards' columns, masked by the caller) come back as
    exact zeros."""
    from xgcm_tpu.parallel.face_sharded import _cols_lane_major

    rng = np.random.RandomState(7)
    for nxl in (300, 100):
        x = jnp.asarray(rng.rand(3, 40, nxl).astype(np.float32))
        for idx in ([0, 1, 2], [nxl - 1, nxl - 2, nxl - 3], [nxl // 2]):
            lidx = jnp.asarray(idx)
            want = jnp.swapaxes(jnp.take(x, lidx, axis=-1), -1, -2)
            got = _cols_lane_major(x, lidx)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # out-of-range bundles reduce to exact zeros
        for idx in ([-2, -1, 0], [nxl - 1, nxl, nxl + 1]):
            lidx = jnp.asarray(idx)
            got = np.asarray(_cols_lane_major(x, lidx))
            ok = [0 <= i < nxl for i in idx]
            for k, inr in enumerate(ok):
                if inr:
                    np.testing.assert_array_equal(
                        got[..., k, :], np.asarray(x[..., :, idx[k]])
                    )
                else:
                    np.testing.assert_array_equal(
                        got[..., k, :], np.zeros_like(got[..., k, :])
                    )


def test_sharded_cumsum_nan_propagates_forward_only():
    """Distributed cumsum: a NaN on a LATER shard must not leak backward
    into earlier shards' offsets (the prefix totals are selected, not
    multiplied by a 0/1 rank mask — 0*NaN would flow backward on TPU).
    The mapping is dim-keyed so the explicit sharded_cumsum engine (not
    the GSPMD fallback) is the path under test, asserted by a spy."""
    import jax

    import xgcm_tpu as xt
    from xgcm_tpu.parallel import ShardedGrid
    from xgcm_tpu.parallel import sharded_grid as sg_mod
    from jax.sharding import Mesh

    n1 = 64
    ds1 = xt.Dataset(coords={
        "XC": ("XC", np.arange(n1) + 0.5, {"axis": "X"}),
        "XG": ("XG", np.arange(n1) * 1.0,
               {"axis": "X", "c_grid_axis_shift": -0.5}),
    })
    g1 = xt.Grid(ds1, periodic=["X"])
    n_dev = min(8, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("x",))
    sg = ShardedGrid(g1, mesh, {"XC": "x", "XG": "x"})

    calls = []
    orig = sg_mod.sharded_cumsum

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    sg_mod.sharded_cumsum = spy
    try:
        a_np = np.random.RandomState(0).rand(n1)
        a_np[60] = np.nan  # lands on the LAST of 8 shards
        a = xt.GriddedArray(a_np, ("XC",))
        e = np.asarray(g1.cumsum(a, "X").data)
        s = np.asarray(sg.cumsum(a, "X").data)
    finally:
        sg_mod.sharded_cumsum = orig
    assert calls, "mapping did not route through sharded_cumsum"
    # exact NaN footprint (forward-only), values to distributed-sum
    # associativity
    np.testing.assert_array_equal(np.isnan(s), np.isnan(e))
    assert int(np.isnan(s).sum()) == n1 - 60
    np.testing.assert_allclose(s, e, rtol=1e-12)


def test_sharded_cumsum_bool_matches_single_device():
    """Bool cumsum counts (land-mask style): the distributed prefix
    offset must keep the CUMSUM's int dtype — casting it back to the
    BLOCK's bool dtype clamps every cross-shard offset to 0/1."""
    import jax

    import xgcm_tpu as xt
    from xgcm_tpu.parallel import ShardedGrid
    from jax.sharding import Mesh

    n1 = 64
    ds1 = xt.Dataset(coords={
        "XC": ("XC", np.arange(n1) + 0.5, {"axis": "X"}),
        "XG": ("XG", np.arange(n1) * 1.0,
               {"axis": "X", "c_grid_axis_shift": -0.5}),
    })
    g1 = xt.Grid(ds1, periodic=["X"])
    n_dev = min(8, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("x",))
    sg = ShardedGrid(g1, mesh, {"XC": "x", "XG": "x"})
    a = xt.GriddedArray(
        np.random.RandomState(1).rand(n1) > 0.3, ("XC",)
    )
    e = np.asarray(g1.cumsum(a, "X").data)
    s = np.asarray(sg.cumsum(a, "X").data)
    assert s.dtype == e.dtype
    np.testing.assert_array_equal(s, e)


def test_sharded_cumsum_int_dtypes_match_single_device():
    """Small-int cumsum keeps the input dtype like single-device: the
    periodic-wrap total (jnp.sum promotes small ints to the widest int)
    must be cast back or the promotion spreads to the whole output."""
    import jax

    import xgcm_tpu as xt
    from xgcm_tpu.parallel import ShardedGrid
    from jax.sharding import Mesh

    n1 = 64
    ds1 = xt.Dataset(coords={
        "XC": ("XC", np.arange(n1) + 0.5, {"axis": "X"}),
        "XG": ("XG", np.arange(n1) * 1.0,
               {"axis": "X", "c_grid_axis_shift": -0.5}),
    })
    g1 = xt.Grid(ds1, periodic=["X"])
    n_dev = min(8, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("x",))
    sg = ShardedGrid(g1, mesh, {"X": "x"})
    for dt in (np.int8, np.int16, np.int32):
        a = xt.GriddedArray(
            (np.random.RandomState(3).rand(n1) * 3).astype(dt), ("XC",)
        )
        e = np.asarray(g1.cumsum(a, "X").data)
        s = np.asarray(sg.cumsum(a, "X").data)
        assert s.dtype == e.dtype, (dt, s.dtype, e.dtype)
        np.testing.assert_array_equal(s, e)


def test_sharded_grid_accepts_axis_name_keys():
    """An axis-name key ("X") must expand to the axis's dims and route
    through the explicit sharded engine, not silently shard nothing."""
    import jax

    import xgcm_tpu as xt
    from xgcm_tpu.parallel import ShardedGrid
    from jax.sharding import Mesh

    n1 = 32
    ds1 = xt.Dataset(coords={
        "XC": ("XC", np.arange(n1) + 0.5, {"axis": "X"}),
        "XG": ("XG", np.arange(n1) * 1.0,
               {"axis": "X", "c_grid_axis_shift": -0.5}),
    })
    g1 = xt.Grid(ds1, periodic=["X"])
    n_dev = min(8, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("x",))
    sg = ShardedGrid(g1, mesh, {"X": "x"})
    assert sg.dim_to_mesh_axis == {"XC": "x", "XG": "x"}
    a = xt.GriddedArray(np.random.RandomState(2).rand(n1), ("XC",))
    np.testing.assert_allclose(
        np.asarray(sg.diff(a, "X").data),
        np.asarray(g1.diff(a, "X").data),
        rtol=1e-12,
    )
    # explicit dim keys beat axis expansions regardless of mapping order
    for m in ({"XG": None, "X": "x"}, {"X": "x", "XG": None}):
        assert ShardedGrid(g1, mesh, m).dim_to_mesh_axis == {
            "XC": "x", "XG": None,
        }
    # mesh-axis VALUES are validated (a typo'd value is a silent
    # GSPMD-fallback perf bug otherwise)
    import pytest
    with pytest.raises(ValueError, match="mesh axis"):
        ShardedGrid(g1, mesh, {"XC": "nope"})
