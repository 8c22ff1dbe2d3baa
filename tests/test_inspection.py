"""Communication-budget regression bounds via utils.count_collectives.

The reference planned a dask task-count regression test but left it as a
permanently-xfail'd placeholder (reference test_grid_ufunc.py:1084-1088).
These tests deliver the TPU-native analog: exact collective budgets for
the sharded ops, so a refactor that silently doubles halo traffic fails
CI.
"""

import jax
import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.parallel import ShardedGrid, make_mesh
from xgcm_tpu.utils import count_collectives

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4 virtual devices"
)


def _cgrid(nx=16, ny=16):
    ds = Dataset(coords={
        "xc": ("xc", np.arange(nx) + 0.5, {"axis": "X"}),
        "xg": ("xg", np.arange(nx) * 1.0,
               {"axis": "X", "c_grid_axis_shift": -0.5}),
        "yc": ("yc", np.arange(ny) + 0.5, {"axis": "Y"}),
        "yg": ("yg", np.arange(ny) * 1.0,
               {"axis": "Y", "c_grid_axis_shift": -0.5}),
    })
    grid = Grid(ds)
    rng = np.random.RandomState(3)
    u = GriddedArray(rng.rand(ny, nx), ("yc", "xg"), name="u")
    v = GriddedArray(rng.rand(ny, nx), ("yg", "xc"), name="v")
    return grid, u, v


def test_single_diff_budget():
    """One sharded diff at boundary_width (1,0) = exactly 1 ppermute (the
    left neighbour only), nothing else."""
    grid, u, v = _cgrid()
    mesh = make_mesh({"x": 2, "y": 2}, devices=jax.devices()[:4])
    sg = ShardedGrid(grid, mesh, {"xc": "x", "xg": "x", "yc": "y",
                                  "yg": "y"})

    def f(vd):
        return sg.diff(GriddedArray(vd, v.dims), "X").data

    counts = count_collectives(f, v.data)
    assert counts.get("ppermute", 0) == 1, counts
    assert counts["total"] == 1, counts


def test_vorticity_expression_budget():
    """zeta = diff(v,X) - diff(u,Y): two independent one-sided ring
    exchanges — the budget a halo-width regression would blow."""
    grid, u, v = _cgrid()
    mesh = make_mesh({"x": 2, "y": 2}, devices=jax.devices()[:4])
    sg = ShardedGrid(grid, mesh, {"xc": "x", "xg": "x", "yc": "y",
                                  "yg": "y"})

    def f(ud, vd):
        uu = GriddedArray(ud, u.dims)
        vv = GriddedArray(vd, v.dims)
        return (sg.diff(vv, "X") - sg.diff(uu, "Y")).data

    counts = count_collectives(f, u.data, v.data)
    assert counts["total"] == 2, counts


def test_static_count_through_scan():
    """Counts are per-trace: a collective inside a scan body counts once."""
    mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    def step(x):
        return jax.lax.ppermute(
            x, "x", [(i, (i + 1) % 4) for i in range(4)]
        )

    sharded_step = shard_map(
        step, mesh=mesh, in_specs=P("x"), out_specs=P("x")
    )

    def f(x):
        return jax.lax.scan(lambda c, _: (sharded_step(c), None), x,
                            None, length=5)[0]

    counts = count_collectives(f, np.zeros(8, np.float32))
    assert counts["total"] == 1, counts
