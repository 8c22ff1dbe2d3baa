"""Everything-under-jit equivalence sweep: each public op must produce the
same values inside jax.jit as eagerly (the whole framework's core contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray

N = 12


@pytest.fixture()
def grid():
    ds = Dataset(
        coords={
            "xc": ("xc", np.arange(N, dtype=float)),
            "xg": ("xg", np.arange(N, dtype=float)),
            "yc": ("yc", np.arange(N, dtype=float)),
            "yg": ("yg", np.arange(N, dtype=float)),
            "dx": (("xg",), np.random.rand(N) + 1.0),
            "area": (("yc", "xc"), np.random.rand(N, N) + 1.0),
        }
    )
    return Grid(
        ds,
        coords={
            "X": {"center": "xc", "left": "xg"},
            "Y": {"center": "yc", "left": "yg"},
        },
        metrics={("X",): ["dx"], ("X", "Y"): ["area"]},
        autoparse_metadata=False,
    )


@pytest.mark.parametrize("op", ["interp", "diff", "min", "max"])
@pytest.mark.parametrize("boundary", ["periodic", "fill", "extend"])
def test_ops_jit_equals_eager(grid, op, boundary):
    a = np.random.rand(N, N)
    da = GriddedArray(a, ("yc", "xc"))
    eager = getattr(grid, op)(da, "X", boundary=boundary, fill_value=1.5)

    @jax.jit
    def f(x):
        return getattr(grid, op)(
            GriddedArray(x, ("yc", "xc")), "X", boundary=boundary,
            fill_value=1.5,
        ).data

    np.testing.assert_allclose(np.asarray(f(a)), np.asarray(eager.data))


def test_cumsum_jit(grid):
    a = np.random.rand(N)
    da = GriddedArray(a, ("xc",))
    eager = grid.cumsum(da, "X", to="left", boundary="fill")

    @jax.jit
    def f(x):
        return grid.cumsum(
            GriddedArray(x, ("xc",)), "X", to="left", boundary="fill"
        ).data

    np.testing.assert_allclose(np.asarray(f(a)), np.asarray(eager.data))


def test_metric_ops_jit(grid):
    a = np.random.rand(N, N)
    da = GriddedArray(a, ("yc", "xc"))
    eager_i = grid.integrate(da, ("X", "Y"))
    eager_d = grid.derivative(da, "X")

    @jax.jit
    def f(x):
        g = GriddedArray(x, ("yc", "xc"))
        return grid.integrate(g, ("X", "Y")).data, grid.derivative(g, "X").data

    ji, jd = f(a)
    np.testing.assert_allclose(np.asarray(ji), np.asarray(eager_i.data))
    np.testing.assert_allclose(np.asarray(jd), np.asarray(eager_d.data))


def test_transform_jit():
    nz = 10
    ds = Dataset(coords={"zc": ("zc", np.arange(nz) + 0.5)})
    gridz = Grid(
        ds, coords={"Z": {"center": "zc"}}, periodic=False,
        autoparse_metadata=False,
    )
    data = np.random.rand(nz)
    sigma = np.linspace(20, 28, nz)
    target = np.linspace(21, 27, 5)

    eager = gridz.transform(
        GriddedArray(data, ("zc",), name="q"),
        "Z", target,
        target_data=GriddedArray(sigma, ("zc",), name="s"),
    )

    @jax.jit
    def f(d, s, t):
        return gridz.transform(
            GriddedArray(d, ("zc",), name="q"), "Z", t,
            target_data=GriddedArray(s, ("zc",), name="s"),
            target_dim="s",
        ).data

    np.testing.assert_allclose(
        np.asarray(f(data, sigma, target)), np.asarray(eager.data),
        equal_nan=True,
    )


def test_face_connected_jit():
    from .datasets import cubed_sphere_dataset

    ds, fc = cubed_sphere_dataset(n=4)
    grid = Grid(ds, face_connections=fc, periodic=False)
    a = np.random.rand(6, 4, 4)
    da = GriddedArray(a, ("face", "y", "x"))
    eager = grid.diff(da, "X", boundary="fill")

    @jax.jit
    def f(x):
        return grid.diff(
            GriddedArray(x, ("face", "y", "x")), "X", boundary="fill"
        ).data

    np.testing.assert_allclose(np.asarray(f(a)), np.asarray(eager.data))
