"""High-level fused diagnostics op (XLA fallback path on CPU)."""

import numpy as np

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.ops.diagnostics import cgrid_diagnostics

N = 16


def test_matches_grid_ops():
    ds = Dataset(
        coords={
            "xc": ("xc", np.arange(N, dtype=float)),
            "xg": ("xg", np.arange(N, dtype=float)),
            "yc": ("yc", np.arange(N, dtype=float)),
            "yg": ("yg", np.arange(N, dtype=float)),
        }
    )
    grid = Grid(
        ds,
        coords={
            "X": {"center": "xc", "left": "xg"},
            "Y": {"center": "yc", "left": "yg"},
        },
        autoparse_metadata=False,
    )
    rng = np.random.RandomState(0)
    u = GriddedArray(rng.rand(N, N), ("yc", "xg"), name="u")
    v = GriddedArray(rng.rand(N, N), ("yg", "xc"), name="v")

    zeta, div, ke = cgrid_diagnostics(grid, u, v)

    zeta_ref = grid.diff(v, "X") - grid.diff(u, "Y")
    div_ref = grid.diff(u, "X", to="center") + grid.diff(v, "Y", to="center")
    u_c = grid.interp(u, "X", to="center")
    v_c = grid.interp(v, "Y", to="center")
    ke_ref = 0.5 * (u_c * u_c + v_c * v_c)

    assert zeta.dims == zeta_ref.dims == ("yg", "xg")
    assert div.dims == ("yc", "xc")
    np.testing.assert_allclose(np.asarray(zeta.data), np.asarray(zeta_ref.data))
    np.testing.assert_allclose(np.asarray(div.data), np.asarray(div_ref.data))
    np.testing.assert_allclose(np.asarray(ke.data), np.asarray(ke_ref.data))


def test_with_metrics():
    ds = Dataset(
        coords={
            "xc": ("xc", np.arange(N, dtype=float)),
            "xg": ("xg", np.arange(N, dtype=float)),
            "yc": ("yc", np.arange(N, dtype=float)),
            "yg": ("yg", np.arange(N, dtype=float)),
        }
    )
    grid = Grid(
        ds,
        coords={
            "X": {"center": "xc", "left": "xg"},
            "Y": {"center": "yc", "left": "yg"},
        },
        autoparse_metadata=False,
    )
    rng = np.random.RandomState(1)
    u = GriddedArray(rng.rand(N, N), ("yc", "xg"))
    v = GriddedArray(rng.rand(N, N), ("yg", "xc"))
    inv_dx = GriddedArray(rng.rand(N) + 1, ("xg",))
    inv_dy = GriddedArray(rng.rand(N) + 1, ("yg",))

    zeta, _, _ = cgrid_diagnostics(grid, u, v, inv_dx=inv_dx, inv_dy=inv_dy)
    expected = grid.diff(v, "X") * inv_dx - grid.diff(u, "Y") * inv_dy
    np.testing.assert_allclose(
        np.asarray(zeta.data), np.asarray(expected.transpose("yg", "xg").data)
    )
