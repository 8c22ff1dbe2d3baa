"""ShardedGrid mirrors the full Grid method surface.

The reference Grid's op surface (grid.py:826-1542) includes the vector
convenience wrappers, interp_like, and the metrics accessors; ShardedGrid
must expose the same set so distributed analysis code is a drop-in
replacement for single-device code.
"""

import jax
import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid
from xgcm_tpu.parallel import ShardedGrid, make_mesh, shard_gridded

from .datasets import cubed_sphere_dataset

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

N = 8


@pytest.fixture()
def cgrid_ds():
    rng = np.random.RandomState(7)
    return Dataset(
        coords={
            "xc": ("xc", np.arange(N) + 0.5, {"axis": "X"}),
            "xg": ("xg", np.arange(N) * 1.0,
                   {"axis": "X", "c_grid_axis_shift": -0.5}),
            "yc": ("yc", np.arange(N) + 0.5, {"axis": "Y"}),
            "yg": ("yg", np.arange(N) * 1.0,
                   {"axis": "Y", "c_grid_axis_shift": -0.5}),
        },
        data_vars={
            "u": (("yc", "xg"), rng.rand(N, N)),
            "v": (("yg", "xc"), rng.rand(N, N)),
            "tr": (("yc", "xc"), rng.rand(N, N)),
            "dxc": (("yc", "xc"), np.full((N, N), 2.0)),
        },
    )


def _sharded_pair(ds):
    grid = Grid(ds)
    mesh = make_mesh({"xm": 4, "ym": 2})
    sg = ShardedGrid(
        grid, mesh, {"xc": "xm", "xg": "xm", "yc": "ym", "yg": "ym"}
    )
    return grid, sg, mesh


@pytest.mark.parametrize("name", ["diff_2d_vector", "interp_2d_vector"])
def test_vector_wrappers_match_grid(cgrid_ds, name):
    grid, sg, mesh = _sharded_pair(cgrid_ds)
    u, v = cgrid_ds["u"], cgrid_ds["v"]
    vec = {"X": u, "Y": v}
    with pytest.warns(DeprecationWarning):
        expected = getattr(grid, name)(vec, boundary="fill")
    svec = {
        "X": shard_gridded(u, mesh, {"xg": "xm", "yc": "ym"}),
        "Y": shard_gridded(v, mesh, {"xc": "xm", "yg": "ym"}),
    }
    with pytest.warns(DeprecationWarning):
        out = getattr(sg, name)(svec, boundary="fill")
    assert set(out) == set(expected)
    for k in expected:
        assert out[k].dims == expected[k].dims
        np.testing.assert_allclose(
            np.asarray(out[k].data), np.asarray(expected[k].data)
        )


def test_interp_like_matches_grid(cgrid_ds):
    grid, sg, mesh = _sharded_pair(cgrid_ds)
    u, tr = cgrid_ds["u"], cgrid_ds["tr"]
    expected = grid.interp_like(u, tr, boundary="extend")
    u_sh = shard_gridded(u, mesh, {"xg": "xm", "yc": "ym"})
    out = sg.interp_like(u_sh, tr, boundary="extend")
    assert out.dims == expected.dims
    np.testing.assert_allclose(
        np.asarray(out.data), np.asarray(expected.data)
    )
    # already on like's positions: identity
    same = sg.interp_like(u_sh, u_sh)
    assert same is u_sh


def test_metrics_delegation(cgrid_ds):
    grid, sg, mesh = _sharded_pair(cgrid_ds)
    sg.set_metrics(("X",), ["dxc"])
    tr = cgrid_ds["tr"]
    m = sg.get_metric(tr, ("X",))
    np.testing.assert_allclose(np.asarray(m.data), 2.0)
    # and the calculus methods that consume them agree with the plain Grid
    got = sg.derivative(shard_gridded(tr, mesh, {"xc": "xm"}), "X")
    want = grid.derivative(tr, "X")
    np.testing.assert_allclose(
        np.asarray(got.data), np.asarray(want.data)
    )


def test_coords_for_delegation(cgrid_ds):
    grid, sg, _ = _sharded_pair(cgrid_ds)
    tr = cgrid_ds["tr"]
    assert set(sg.coords_for(tr)) == set(grid.coords_for(tr))


def test_vector_wrappers_on_face_sharded_grid():
    """The wrappers route each component through the face-sharded engine
    when the face dim is mesh-mapped."""
    ds, fc = cubed_sphere_dataset(n=N)
    grid = Grid(ds, face_connections=fc)
    u, v = ds["u"], ds["v"]
    vec = {"X": u, "Y": v}
    with pytest.warns(DeprecationWarning):
        expected = grid.interp_2d_vector(vec, boundary="fill")
    mesh = make_mesh({"f": 2, "ym": 4}, devices=jax.devices()[:8])
    sg = ShardedGrid(grid, mesh, {"face": "f", "y": "ym", "yl": "ym"})
    svec = {
        "X": shard_gridded(u, mesh, {"face": "f", "y": "ym"}),
        "Y": shard_gridded(v, mesh, {"face": "f", "yl": "ym"}),
    }
    with pytest.warns(DeprecationWarning):
        out = sg.interp_2d_vector(svec, boundary="fill")
    for k in expected:
        assert out[k].dims == expected[k].dims
        np.testing.assert_allclose(
            np.asarray(out[k].data), np.asarray(expected[k].data),
            rtol=1e-12,
        )
