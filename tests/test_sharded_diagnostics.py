"""Fused sharded diagnostics: one shard_map == sequential sharded ops ==
single-device Grid ops (the multi-op halo-amortisation pattern for
LLC4320-scale analysis)."""

import jax
import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.parallel import ShardedGrid, make_mesh
from xgcm_tpu.parallel.diagnostics import sharded_cgrid_diagnostics

NX, NY = 32, 16


@pytest.fixture
def grid():
    ds = Dataset(
        coords={
            "xc": ("xc", np.arange(NX) + 0.5),
            "xg": ("xg", np.arange(NX) * 1.0),
            "yc": ("yc", np.arange(NY) + 0.5),
            "yg": ("yg", np.arange(NY) * 1.0),
        }
    )
    return Grid(
        ds,
        coords={
            "X": {"center": "xc", "left": "xg"},
            "Y": {"center": "yc", "left": "yg"},
        },
        autoparse_metadata=False,
    )


@pytest.fixture
def uv():
    u = GriddedArray(np.random.rand(NY, NX), ("yc", "xg"), name="u")
    v = GriddedArray(np.random.rand(NY, NX), ("yg", "xc"), name="v")
    return u, v


def _expected(grid, u, v, boundary, fill_value=None):
    kw = dict(boundary=boundary, fill_value=fill_value)
    zeta = grid.diff(v, "X", **kw) - grid.diff(u, "Y", **kw)
    div = grid.diff(u, "X", to="center", **kw) + grid.diff(
        v, "Y", to="center", **kw
    )
    u_c = grid.interp(u, "X", to="center", **kw)
    v_c = grid.interp(v, "Y", to="center", **kw)
    ke = 0.5 * (u_c * u_c + v_c * v_c)
    return zeta, div, ke


@pytest.mark.parametrize("boundary", ["periodic", "fill", "extend"])
def test_fused_equals_sequential_x_sharded(grid, uv, boundary):
    u, v = uv
    mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])
    mapping = {"xc": "x", "xg": "x"}
    z, d, k = sharded_cgrid_diagnostics(
        grid, u, v, mesh, mapping, boundary=boundary, fill_value=1.5
    )
    ez, ed, ek = _expected(grid, u, v, boundary, 1.5)
    for got, exp in ((z, ez), (d, ed), (k, ek)):
        assert got.dims == exp.dims
        np.testing.assert_allclose(np.asarray(got.data), np.asarray(exp.data))


def test_fused_equals_sequential_2d_mesh(grid, uv):
    u, v = uv
    mesh = make_mesh({"x": 4, "y": 2}, devices=jax.devices()[:8])
    mapping = {"xc": "x", "xg": "x", "yc": "y", "yg": "y"}
    z, d, k = sharded_cgrid_diagnostics(
        grid, u, v, mesh, mapping, boundary="periodic"
    )
    ez, ed, ek = _expected(grid, u, v, "periodic")
    for got, exp in ((z, ez), (d, ed), (k, ek)):
        np.testing.assert_allclose(np.asarray(got.data), np.asarray(exp.data))


def test_fused_equals_sequential_sharded_ops(grid, uv):
    """Fused program == the chain of ShardedGrid ops it replaces."""
    u, v = uv
    mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])
    mapping = {"xc": "x", "xg": "x"}
    sg = ShardedGrid(grid, mesh, mapping)
    z, d, k = sharded_cgrid_diagnostics(
        grid, u, v, mesh, mapping, boundary="periodic"
    )
    sz = sg.diff(v, "X", boundary="periodic") - sg.diff(
        u, "Y", boundary="periodic"
    )
    sd = sg.diff(u, "X", to="center", boundary="periodic") + sg.diff(
        v, "Y", to="center", boundary="periodic"
    )
    u_c = sg.interp(u, "X", to="center", boundary="periodic")
    v_c = sg.interp(v, "Y", to="center", boundary="periodic")
    sk = 0.5 * (u_c * u_c + v_c * v_c)
    for got, exp in ((z, sz), (d, sd), (k, sk)):
        np.testing.assert_allclose(np.asarray(got.data), np.asarray(exp.data))


def test_batch_dims_ride_along(grid):
    u = GriddedArray(np.random.rand(3, NY, NX), ("t", "yc", "xg"), name="u")
    v = GriddedArray(np.random.rand(3, NY, NX), ("t", "yg", "xc"), name="v")
    mesh = make_mesh({"b": 2, "x": 4}, devices=jax.devices()[:8])
    mapping = {"xc": "x", "xg": "x"}
    z, d, k = sharded_cgrid_diagnostics(
        grid, u, v, mesh, mapping, boundary="extend"
    )
    ez, ed, ek = _expected(grid, u, v, "extend")
    for got, exp in ((z, ez), (d, ed), (k, ek)):
        assert got.dims == exp.dims
        np.testing.assert_allclose(np.asarray(got.data), np.asarray(exp.data))


def test_wrong_staggering_rejected(grid):
    u = GriddedArray(np.random.rand(NY, NX), ("yc", "xc"), name="u")
    v = GriddedArray(np.random.rand(NY, NX), ("yg", "xc"), name="v")
    mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="C-grid staggering"):
        sharded_cgrid_diagnostics(grid, u, v, mesh, {"xc": "x", "xg": "x"})
