"""Face-sharded vector-component halo exchange vs the single-device path."""

import jax
import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.parallel import make_mesh, shard_gridded, sharded_face_op

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs 2 virtual devices"
)

N = 8

FC_XY = {"face": {0: {"X": (None, (1, "Y", False))}, 1: {"Y": ((0, "X", False), None)}}}


@pytest.fixture()
def ds():
    return Dataset(
        coords={
            "x": ("x", np.arange(N, dtype=float), {"axis": "X"}),
            "xl": ("xl", np.arange(N) - 0.5, {"axis": "X", "c_grid_axis_shift": -0.5}),
            "y": ("y", np.arange(N, dtype=float), {"axis": "Y"}),
            "yl": ("yl", np.arange(N) - 0.5, {"axis": "Y", "c_grid_axis_shift": -0.5}),
            "face": ("face", np.arange(2)),
        },
        data_vars={
            "u": (("face", "y", "xl"), np.random.rand(2, N, N)),
            "v": (("face", "yl", "x"), np.random.rand(2, N, N)),
        },
    )


@pytest.mark.parametrize("op", ["interp", "diff"])
def test_vector_sharded_matches_single_device(ds, op):
    grid = Grid(ds, face_connections=FC_XY, periodic=False)
    mesh = make_mesh({"f": 2})
    u, v = ds["u"], ds["v"]

    expected = getattr(grid, op)(
        {"Y": v}, "X", other_component={"X": u}, boundary="fill",
        fill_value=0.0,
    )

    v_sh = shard_gridded(v, mesh, {"face": "f"})
    u_sh = shard_gridded(u, mesh, {"face": "f"})
    out = sharded_face_op(
        grid, op, {"Y": v_sh}, "X", mesh, "f", "X", "Y",
        boundary="fill", fill_value=0.0, other_component={"X": u_sh},
    )
    assert out.dims == expected.dims
    np.testing.assert_allclose(np.asarray(out.data), np.asarray(expected.data))


def test_tangential_sign_flip_sharded(ds):
    """The all-ones invariant (reference test_faceconnections.py:206-240)
    must hold with faces sharded across devices."""
    grid = Grid(
        ds, face_connections=FC_XY, boundary="fill", fill_value=1,
        periodic=False,
    )
    mesh = make_mesh({"f": 2})
    u_mod = np.array([-2.0, -1.0])[:, None, None]
    u = ds["u"].with_data(np.zeros((2, N, N)) + u_mod)
    v = ds["v"].with_data(np.ones((2, N, N)))

    out = sharded_face_op(
        grid, "interp",
        {"Y": shard_gridded(v, mesh, {"face": "f"})},
        "X", mesh, "f", "X", "Y",
        other_component={"X": shard_gridded(u, mesh, {"face": "f"})},
    )
    np.testing.assert_allclose(np.asarray(out.data), 1.0)


def test_missing_other_component_raises(ds):
    grid = Grid(ds, face_connections=FC_XY, periodic=False)
    mesh = make_mesh({"f": 2})
    with pytest.raises(ValueError, match="requires `other_component`"):
        sharded_face_op(
            grid, "interp", {"Y": ds["v"]}, "X", mesh, "f", "X", "Y"
        )


@pytest.mark.parametrize("op", ["interp", "diff"])
def test_vector_through_sharded_grid_proxy(ds, op):
    """ShardedGrid routes vector-dict inputs with other_component through
    sharded_face_op when the face dim is mesh-mapped."""
    from xgcm_tpu.parallel import ShardedGrid

    grid = Grid(ds, face_connections=FC_XY, periodic=False)
    mesh = make_mesh({"f": 2})
    u, v = ds["u"], ds["v"]

    expected = getattr(grid, op)(
        {"Y": v}, "X", other_component={"X": u}, boundary="fill",
        fill_value=0.0,
    )

    sgrid = ShardedGrid(grid, mesh, {"face": "f"})
    v_sh = shard_gridded(v, mesh, {"face": "f"})
    u_sh = shard_gridded(u, mesh, {"face": "f"})
    out = getattr(sgrid, op)(
        {"Y": v_sh}, "X", other_component={"X": u_sh}, boundary="fill",
        fill_value=0.0,
    )
    assert out.dims == expected.dims
    np.testing.assert_allclose(np.asarray(out.data), np.asarray(expected.data))
