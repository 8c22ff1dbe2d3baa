"""Face-connection tests ported by exact reference name
(/root/reference/xgcm/test/test_faceconnections.py:130-470), rewritten
against the native API.  Behavioural coverage also lives in
tests/test_faceconnections.py; this file pins the reference's test names
so the invalid-input contract, the rotated/sign-flipped halo expectations,
the cubed-sphere neighbour table, and the GH #704/#708 lazy-path
regressions are checkable name-for-name.

Strict improvements, noted per test:

- ``test_connection_errors`` is an empty ``pass`` stub in the reference;
  here it asserts the mutual-consistency errors.
- the ``_dask`` / ``_dask_multichunk`` variants (GH #704/#708 dask
  regressions) run the vector ops under ``jax.jit`` — the lazy-execution
  analog — and must match the eager numpy oracle exactly.
"""

import jax
import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.core.padding import pad

from .datasets import cubed_sphere_dataset

N = 8


@pytest.fixture()
def ds():
    return Dataset(
        coords={
            "x": ("x", np.arange(N, dtype=float), {"axis": "X"}),
            "xl": (
                "xl",
                np.arange(N) - 0.5,
                {"axis": "X", "c_grid_axis_shift": -0.5},
            ),
            "y": ("y", np.arange(N, dtype=float), {"axis": "Y"}),
            "yl": (
                "yl",
                np.arange(N) - 0.5,
                {"axis": "Y", "c_grid_axis_shift": -0.5},
            ),
            "face": ("face", np.arange(2)),
        },
        data_vars={
            "data_c": (("face", "y", "x"), np.random.rand(2, N, N)),
            "u": (("face", "xl", "y"), np.random.rand(2, N, N)),
            "v": (("face", "x", "yl"), np.random.rand(2, N, N)),
        },
    )


@pytest.fixture()
def ds_face_connections_x_to_x():
    return {
        "face": {0: {"X": (None, (1, "X", False))}, 1: {"X": ((0, "X", False), None)}}
    }


@pytest.fixture()
def ds_face_connections_x_to_y():
    return {
        "face": {0: {"X": (None, (1, "Y", False))}, 1: {"Y": ((0, "X", False), None)}}
    }


def test_connection_errors(ds):
    # empty stub in the reference; real assertions here: a one-sided or
    # mismatched link must fail the mutual-consistency check
    with pytest.raises(ValueError, match="Face link mismatch"):
        Grid(
            ds,
            face_connections={
                "face": {
                    0: {"X": (None, (1, "X", False))},
                    1: {"X": ((0, "X", True), None)},
                }
            },
        )


def test_create_connected_grid_error_wrong_facedim(
    ds, ds_face_connections_x_to_x
):
    fc = {"something_else": ds_face_connections_x_to_x["face"]}
    with pytest.raises(
        ValueError, match="does not exist in the dataset"
    ):
        Grid(ds, face_connections=fc)


def test_diff_interp_connected_grid_x_to_x(ds, ds_face_connections_x_to_x):
    # simplest scenario with one face connection
    grid = Grid(ds, face_connections=ds_face_connections_x_to_x, periodic=False)
    c = np.asarray(ds["data_c"].data)
    diff_x = np.asarray(grid.diff(ds["data_c"], "X", boundary="fill").data)
    interp_x = np.asarray(grid.interp(ds["data_c"], "X", boundary="fill").data)

    # make sure the face connection got applied correctly
    np.testing.assert_allclose(diff_x[1, :, 0], c[1, :, 0] - c[0, :, -1])
    np.testing.assert_allclose(
        interp_x[1, :, 0], 0.5 * (c[1, :, 0] + c[0, :, -1])
    )

    # make sure the left boundary got applied correctly
    np.testing.assert_allclose(diff_x[0, :, 0], c[0, :, 0] - 0.0)
    np.testing.assert_allclose(interp_x[0, :, 0], 0.5 * (c[0, :, 0] + 0.0))


def test_diff_interp_connected_grid_x_to_y(ds, ds_face_connections_x_to_y):
    # one face connection, rotated
    grid = Grid(ds, face_connections=ds_face_connections_x_to_y)
    c = np.asarray(ds["data_c"].data)

    diff_y = np.asarray(grid.diff(ds["data_c"], "Y", boundary="fill").data)
    interp_y = np.asarray(grid.interp(ds["data_c"], "Y", boundary="fill").data)

    # non-same-axis connections require rotation: face1's bottom halo is
    # face0's last column, reversed
    np.testing.assert_allclose(
        diff_y[1, 0, :].ravel(), c[1, 0, :].ravel() - c[0, ::-1, -1].ravel()
    )
    np.testing.assert_allclose(
        interp_y[1, 0, :].ravel(),
        0.5 * (c[1, 0, :].ravel() + c[0, ::-1, -1].ravel()),
    )


@pytest.mark.parametrize("boundary", ["periodic", "fill"])
def test_vector_connected_grid_x_to_y(ds, ds_face_connections_x_to_y, boundary):
    # one face connection, rotated
    grid = Grid(
        ds,
        face_connections=ds_face_connections_x_to_y,
        boundary=boundary,
        fill_value=1,
        periodic=False,
    )
    u_mod = np.array([-2.0, -1.0])[:, None, None]
    v_mod = np.array([1.0, 1.0])[:, None, None]
    u = ds["u"].with_data(np.zeros((2, N, N)) + u_mod)
    v = ds["v"].with_data(np.zeros((2, N, N)) + v_mod)

    # v is the interesting variable: this connection sign-flips the partner
    # component (GH #410); all interpolated values must be exactly 1
    v_out = grid.interp({"Y": v}, "X", other_component={"X": u})
    np.testing.assert_allclose(np.asarray(v_out.data), 1.0)


@pytest.mark.parametrize("no_coords", [True, False])
def test_vector_diff_interp_connected_grid_x_to_y(
    ds, ds_face_connections_x_to_y, no_coords
):
    if no_coords:
        # GH #595/#531: the op must work when the connected dims carry no
        # coordinate variables
        stripped = Dataset(
            coords={"face": ("face", np.arange(2))},
            data_vars={k: (ds[k].dims, np.asarray(ds[k].data)) for k in
                       ("data_c", "u", "v")},
        )
        grid = Grid(
            stripped,
            coords={
                "X": {"center": "x", "left": "xl"},
                "Y": {"center": "y", "left": "yl"},
            },
            face_connections=ds_face_connections_x_to_y,
            autoparse_metadata=False,
        )
        u_in, v_in = stripped["u"], stripped["v"]
    else:
        grid = Grid(ds, face_connections=ds_face_connections_x_to_y)
        u_in, v_in = ds["u"], ds["v"]

    u = np.asarray(u_in.data)
    v = np.asarray(v_in.data)

    vector_center = grid.interp_2d_vector(
        {"X": u_in, "Y": v_in}, to="center", boundary="fill", fill_value=100
    )
    u_c_interp = np.asarray(vector_center["X"].data)

    vector_diff = grid.diff_2d_vector(
        {"X": u_in, "Y": v_in}, to="center", boundary="fill", fill_value=100
    )
    u_c_diff = np.asarray(vector_diff["X"].data)

    # first point should be normal
    np.testing.assert_allclose(
        u_c_interp[0, 0, :], 0.5 * (u[0, 0, :] + u[0, 1, :])
    )
    np.testing.assert_allclose(u_c_diff[0, 0, :], u[0, 1, :] - u[0, 0, :])

    # last point should be fancy (rotated partner component)
    np.testing.assert_allclose(
        u_c_interp[0, -1, :], 0.5 * (u[0, -1, :] + v[1, ::-1, 0])
    )
    np.testing.assert_allclose(u_c_diff[0, -1, :], -u[0, -1, :] + v[1, ::-1, 0])

    # tangent vectors not implemented (reference parity)
    with pytest.raises(NotImplementedError):
        _ = grid.interp_2d_vector(
            {"X": v_in, "Y": u_in}, to="left", boundary="fill"
        )
    with pytest.raises(NotImplementedError):
        _ = grid.interp_2d_vector({"X": v_in, "Y": u_in}, boundary="fill")


def _run_vector_jitted(grid, method, u_in, v_in):
    """GH #704/#708 analog: the lazy (traced) path must equal eager."""

    @jax.jit
    def f(u_data, v_data):
        out = getattr(grid, method)(
            {"X": GriddedArray(u_data, u_in.dims), "Y": GriddedArray(v_data, v_in.dims)},
            to="center",
            boundary="fill",
            fill_value=100,
        )
        return out["X"].data

    return np.asarray(f(u_in.data, v_in.data))


@pytest.mark.parametrize("method", ["interp_2d_vector", "diff_2d_vector"])
def test_vector_diff_interp_connected_grid_x_to_y_dask(
    ds, ds_face_connections_x_to_y, method
):
    """GH #704 analog: vector components through the lazy (jit-traced) path
    must match the eager numpy oracle exactly."""
    grid = Grid(ds, face_connections=ds_face_connections_x_to_y)
    u = np.asarray(ds["u"].data)
    v = np.asarray(ds["v"].data)

    u_c = _run_vector_jitted(grid, method, ds["u"], ds["v"])

    if method == "interp_2d_vector":
        np.testing.assert_allclose(u_c[0, 0, :], 0.5 * (u[0, 0, :] + u[0, 1, :]))
        np.testing.assert_allclose(
            u_c[0, -1, :], 0.5 * (u[0, -1, :] + v[1, ::-1, 0])
        )
    else:
        np.testing.assert_allclose(u_c[0, 0, :], u[0, 1, :] - u[0, 0, :])
        np.testing.assert_allclose(u_c[0, -1, :], -u[0, -1, :] + v[1, ::-1, 0])


@pytest.mark.parametrize("method", ["interp_2d_vector", "diff_2d_vector"])
def test_vector_diff_interp_connected_grid_x_to_y_dask_multichunk(
    ds, ds_face_connections_x_to_y, method
):
    """GH #708 analog: same op with the core dim SHARDED over a mesh (the
    multi-chunk analog); must equal the eager result bit-for-bit."""
    from xgcm_tpu.parallel import make_mesh, shard_gridded

    grid = Grid(ds, face_connections=ds_face_connections_x_to_y)
    eager = getattr(grid, method)(
        {"X": ds["u"], "Y": ds["v"]}, to="center", boundary="fill", fill_value=100
    )["X"]

    mesh = make_mesh({"b": 2}, devices=jax.devices()[:2])
    u_sh = shard_gridded(ds["u"], mesh, {"face": "b"})
    v_sh = shard_gridded(ds["v"], mesh, {"face": "b"})
    u_c = _run_vector_jitted(grid, method, u_sh, v_sh)

    np.testing.assert_array_equal(u_c, np.asarray(eager.data))


def test_create_cubed_sphere_grid():
    cs, cubed_sphere_connections = cubed_sphere_dataset()
    _ = Grid(cs, face_connections=cubed_sphere_connections)


def test_diff_interp_cubed_sphere():
    cs, cubed_sphere_connections = cubed_sphere_dataset(n=4)
    grid = Grid(cs, face_connections=cubed_sphere_connections)
    n = 4
    face = GriddedArray(
        np.broadcast_to(np.arange(6.0)[:, None, None], (6, n, n)).copy(),
        ("face", "y", "x"),
    )

    face_diff_x = np.asarray(grid.diff(face, "X").data)
    np.testing.assert_allclose(face_diff_x[:, 0, 0], [-3, 1, 1, 1, 1, 2])
    np.testing.assert_allclose(face_diff_x[:, -1, 0], [-3, 1, 1, 1, 1, 2])

    face_diff_y = np.asarray(grid.diff(face, "Y").data)
    np.testing.assert_allclose(face_diff_y[:, 0, 0], [-4, -3, -2, -1, 2, 5])
    np.testing.assert_allclose(face_diff_y[:, 0, -1], [-4, -3, -2, -1, 2, 5])


def test_cubed_sphere_scalar_pad_connected_halos():
    # GH #712 regression: every connected halo cell must read the neighbor
    # face the connection table declares (deterministic edge ordering).
    cs, cubed_sphere_connections = cubed_sphere_dataset(n=4)
    grid = Grid(cs, face_connections=cubed_sphere_connections)
    nf, n = 6, 4
    face_field = GriddedArray(
        np.broadcast_to(np.arange(nf, dtype=float)[:, None, None], (nf, n, n)).copy(),
        ("face", "y", "x"),
    )
    padded = np.asarray(
        pad(
            face_field,
            grid,
            {"X": (1, 1), "Y": (1, 1)},
            boundary={"X": "fill", "Y": "fill"},
            fill_value=np.nan,
        ).data
    )

    for f in range(nf):
        conn = cubed_sphere_connections["face"][f]
        (left_x, right_x), (down_y, up_y) = conn["X"], conn["Y"]
        np.testing.assert_array_equal(padded[f, 1:-1, 0], left_x[0])
        np.testing.assert_array_equal(padded[f, 1:-1, -1], right_x[0])
        np.testing.assert_array_equal(padded[f, 0, 1:-1], down_y[0])
        np.testing.assert_array_equal(padded[f, -1, 1:-1], up_y[0])


class TestErrors:
    def test_vector_missing_other_component(self, ds, ds_face_connections_x_to_y):
        grid = Grid(ds, face_connections=ds_face_connections_x_to_y)
        msg = "Padding vector components requires `other_component` input"
        with pytest.raises(ValueError, match=msg):
            grid.diff({"X": ds["u"]}, "X", other_component=None)


@pytest.mark.parametrize("face_coord_dim", [True, False])
def test_create_connected_grid(ds, ds_face_connections_x_to_x, face_coord_dim):
    if face_coord_dim:
        # face dim present only through the data vars, no coordinate variable
        ds = Dataset(
            coords={k: (v.dims, np.asarray(v.data), dict(v.attrs))
                    for k, v in ds.coords.items() if k != "face"},
            data_vars={k: (ds[k].dims, np.asarray(ds[k].data))
                       for k in ("data_c", "u", "v")},
        )

    # simplest scenario with one face connection
    grid = Grid(ds, face_connections=ds_face_connections_x_to_x)

    xaxis = grid.axes["X"]
    assert xaxis._facedim == "face"
    assert xaxis._face_connections[0][1][0] == 1
    assert xaxis._face_connections[0][1][1] is xaxis
    assert xaxis._face_connections[1][0][0] == 0
    assert xaxis._face_connections[1][0][1] is xaxis
