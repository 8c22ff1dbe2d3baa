"""Sharded NON-face axes on face-connected grids must ride ring halos.

Regression tests for a silent-wrongness bug: `_face_pad_fn` (and the
apply_many `_pad_at` face branch) padded every non-face axis with the
LOCAL boundary condition, so an axis that was itself sharded (e.g. a Z
axis mapped to its own mesh axis) received the GLOBAL BC at its
shard-interior edges instead of its neighbour shard's data — sharded
results silently diverged from the single-device engine at shard
boundaries.  The non-face engine (`_ring_pad_fn`) and the non-face
apply_many branch already split sharded vs unsharded axes; these tests
pin the face branches to the same split."""

import jax
import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.parallel import ShardedGrid, make_mesh, shard_gridded

from .datasets import cubed_sphere_dataset


def _cs_with_z(n=8, nz=8):
    """Cubed-sphere faces with an extra (non-face-connected) Z axis."""
    _, fc = cubed_sphere_dataset(n=n)
    rng = np.random.RandomState(3)
    ds = Dataset(
        coords={
            "x": ("x", np.arange(n) + 0.5, {"axis": "X"}),
            "xl": ("xl", np.arange(n) * 1.0,
                   {"axis": "X", "c_grid_axis_shift": -0.5}),
            "y": ("y", np.arange(n) + 0.5, {"axis": "Y"}),
            "yl": ("yl", np.arange(n) * 1.0,
                   {"axis": "Y", "c_grid_axis_shift": -0.5}),
            "z": ("z", np.arange(nz) + 0.5, {"axis": "Z"}),
            "zl": ("zl", np.arange(nz) * 1.0,
                   {"axis": "Z", "c_grid_axis_shift": -0.5}),
            "face": ("face", np.arange(6)),
        },
        data_vars={
            "data_c": (
                ("face", "z", "y", "x"),
                rng.rand(6, nz, n, n),
            ),
        },
    )
    return ds, fc


def smooth3(a):
    """Width-(1,1) 3-point running mean along the last axis."""
    return (a[..., :-2] + a[..., 1:-1] + a[..., 2:]) / 3.0


def cross_xz(a):
    """Width-(1,1) on BOTH of the last two axes (X then Z): a 5-point
    cross mean that needs face-strip halos AND Z-ring halos at once."""
    mid = a[..., 1:-1, 1:-1]
    return (
        mid
        + a[..., :-2, 1:-1] + a[..., 2:, 1:-1]
        + a[..., 1:-1, :-2] + a[..., 1:-1, 2:]
    ) / 5.0


def _match(s, e, **kw):
    assert s.dims == e.dims
    np.testing.assert_allclose(np.asarray(s.data), np.asarray(e.data), **kw)


@pytest.mark.parametrize("boundary", ["fill", "extend"])
def test_sharded_z_axis_on_face_grid(boundary):
    """A Z-width ufunc with Z sharded 4-way: interior shard edges must
    carry neighbour data, not the global BC."""
    ds, fc = _cs_with_z()
    grid = Grid(ds, face_connections=fc)
    da = ds["data_c"]
    mesh = make_mesh({"f": 2, "zm": 4}, devices=jax.devices()[:8])
    sg = ShardedGrid(grid, mesh, {"face": "f", "z": "zm"})
    kw = dict(
        axis=[("Z",)],
        signature="(Z:center)->(Z:center)",
        boundary_width={"Z": (1, 1)},
        boundary=boundary,
    )
    sh = shard_gridded(da, mesh, {"face": "f", "z": "zm"})
    s = sg.apply_as_grid_ufunc(smooth3, sh, **kw)
    e = grid.apply_as_grid_ufunc(smooth3, da, **kw)
    _match(s, e, rtol=1e-12)


def test_sharded_z_and_face_axis_combined():
    """X (face-connected) and Z (ring) widths in ONE ufunc."""
    ds, fc = _cs_with_z()
    grid = Grid(ds, face_connections=fc)
    da = ds["data_c"]
    mesh = make_mesh({"f": 2, "zm": 4}, devices=jax.devices()[:8])
    sg = ShardedGrid(grid, mesh, {"face": "f", "z": "zm"})
    kw = dict(
        axis=[("X", "Z")],
        signature="(X:center,Z:center)->(X:center,Z:center)",
        boundary_width={"X": (1, 1), "Z": (1, 1)},
        boundary="fill",
    )
    sh = shard_gridded(da, mesh, {"face": "f", "z": "zm"})
    s = sg.apply_as_grid_ufunc(cross_xz, sh, **kw)
    e = grid.apply_as_grid_ufunc(cross_xz, da, **kw)
    _match(s, e, rtol=1e-12)


def test_unsharded_z_still_local():
    """Z not mapped to a mesh axis keeps the plain local pad."""
    ds, fc = _cs_with_z()
    grid = Grid(ds, face_connections=fc)
    da = ds["data_c"]
    mesh = make_mesh({"f": 6}, devices=jax.devices()[:6])
    sg = ShardedGrid(grid, mesh, {"face": "f"})
    kw = dict(
        axis=[("Z",)],
        signature="(Z:center)->(Z:center)",
        boundary_width={"Z": (1, 1)},
        boundary="extend",
    )
    s = sg.apply_as_grid_ufunc(smooth3, sg.shard(da), **kw)
    e = grid.apply_as_grid_ufunc(smooth3, da, **kw)
    _match(s, e, rtol=1e-12)


def test_apply_many_sharded_z_on_face_grid():
    """The apply_many face branch takes the same ring-halo split."""
    ds, fc = _cs_with_z()
    grid = Grid(ds, face_connections=fc)
    da = ds["data_c"]
    mesh = make_mesh({"f": 2, "zm": 4}, devices=jax.devices()[:8])
    sg = ShardedGrid(grid, mesh, {"face": "f", "z": "zm"})
    sh = shard_gridded(da, mesh, {"face": "f", "z": "zm"})
    specs = [
        dict(
            func=smooth3, args=sh, axis=[("Z",)],
            signature="(Z:center)->(Z:center)",
            boundary_width={"Z": (1, 1)}, boundary="extend",
        ),
        dict(
            func=cross_xz, args=sh, axis=[("X", "Z")],
            signature="(X:center,Z:center)->(X:center,Z:center)",
            boundary_width={"X": (1, 1), "Z": (1, 1)}, boundary="fill",
        ),
    ]
    outs = sg.apply_many(specs)
    e0 = grid.apply_as_grid_ufunc(
        smooth3, da, axis=[("Z",)],
        signature="(Z:center)->(Z:center)",
        boundary_width={"Z": (1, 1)}, boundary="extend",
    )
    e1 = grid.apply_as_grid_ufunc(
        cross_xz, da, axis=[("X", "Z")],
        signature="(X:center,Z:center)->(X:center,Z:center)",
        boundary_width={"X": (1, 1), "Z": (1, 1)}, boundary="fill",
    )
    _match(outs[0], e0, rtol=1e-12)
    _match(outs[1], e1, rtol=1e-12)


def test_sharded_z_without_face_mapping():
    """Face dim NOT mesh-mapped, Z (non-connected) sharded: faces are
    local to every shard, so the ring route serves the Z halos."""
    ds, fc = _cs_with_z()
    grid = Grid(ds, face_connections=fc)
    da = ds["data_c"]
    mesh = make_mesh({"zm": 8}, devices=jax.devices()[:8])
    sg = ShardedGrid(grid, mesh, {"z": "zm"})
    kw = dict(
        axis=[("Z",)],
        signature="(Z:center)->(Z:center)",
        boundary_width={"Z": (1, 1)},
        boundary="extend",
    )
    sh = shard_gridded(da, mesh, {"z": "zm"})
    s = sg.apply_as_grid_ufunc(smooth3, sh, **kw)
    e = grid.apply_as_grid_ufunc(smooth3, da, **kw)
    _match(s, e, rtol=1e-12)


def test_sharded_inface_without_face_mapping_raises_clearly():
    """Direct engine use with a sharded face-connected dim and no face
    mapping gets the explicit error (the ShardedGrid API falls back to
    GSPMD instead — tests/test_fuzz_sharded_routing.py)."""
    from xgcm_tpu.parallel.sharded_ufunc import sharded_apply_as_grid_ufunc

    ds, fc = _cs_with_z()
    grid = Grid(ds, face_connections=fc)
    da = ds["data_c"]
    mesh = make_mesh({"ym": 8}, devices=jax.devices()[:8])
    sh = shard_gridded(da, mesh, {"y": "ym"})
    with pytest.raises(NotImplementedError, match="face-connected dims"):
        sharded_apply_as_grid_ufunc(
            smooth3, sh, axis=[("Y",)], grid=grid,
            signature="(Y:center)->(Y:center)",
            mesh=mesh, dim_to_mesh_axis={"y": "ym"},
            boundary_width={"Y": (1, 1)}, boundary="fill",
        )


def test_sharded_z_with_face_axis_widths_without_face_mapping():
    """Face dim unmapped, Z core-sharded, widths on BOTH X (face-connected,
    local) and Z (ring): the faces-local engine route must assemble real
    cross-face halos for X (regression: the per-shard grid dropped the
    connection table, silently substituting the basic BC at face edges)."""
    ds, fc = _cs_with_z()
    grid = Grid(ds, face_connections=fc)
    da = ds["data_c"]
    mesh = make_mesh({"zm": 8}, devices=jax.devices()[:8])
    sg = ShardedGrid(grid, mesh, {"z": "zm"})
    kw = dict(
        axis=[("X", "Z")],
        signature="(X:center,Z:center)->(X:center,Z:center)",
        boundary_width={"X": (1, 1), "Z": (1, 1)},
        boundary="fill",
    )
    sh = shard_gridded(da, mesh, {"z": "zm"})
    s = sg.apply_as_grid_ufunc(cross_xz, sh, **kw)
    e = grid.apply_as_grid_ufunc(cross_xz, da, **kw)
    _match(s, e, rtol=1e-12)
