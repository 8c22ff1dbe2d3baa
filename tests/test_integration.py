"""Capstone integration checks combining topology, metrics, ops and
transform — physical invariants a correct framework must satisfy."""

import jax
import jax.numpy as jnp
import numpy as np

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.grids import cubed_sphere_grid, mitgcm_c_grid


class TestPhysicalInvariants:
    def test_constant_field_has_zero_gradient_across_faces(self):
        """A globally constant field must have exactly zero diff everywhere
        on the cubed sphere — any halo orientation/sign error breaks this."""
        ds, grid = cubed_sphere_grid(n=6)
        c = GriddedArray(np.full((6, 6, 6), 3.25), ("face", "y", "x"))
        for ax in ("X", "Y"):
            d = grid.diff(c, ax)
            np.testing.assert_array_equal(np.asarray(d.data), 0.0)

    def test_interp_of_constant_is_constant(self):
        ds, grid = cubed_sphere_grid(n=6)
        c = GriddedArray(np.full((6, 6, 6), -1.5), ("face", "y", "x"))
        for ax in ("X", "Y"):
            i = grid.interp(c, ax)
            np.testing.assert_array_equal(np.asarray(i.data), -1.5)

    def test_telescoping_sum_periodic(self):
        """Periodic diff sums to zero along the axis (telescoping)."""
        ds, grid = mitgcm_c_grid(nx=24, ny=8)
        t = GriddedArray(np.random.rand(8, 24), ("YC", "XC"))
        d = grid.diff(t, "X")  # periodic in X
        np.testing.assert_allclose(
            np.asarray(d.sum("XG").data), 0.0, atol=1e-12
        )

    def test_global_integral_conserved_under_conservative_transform(self):
        ds, grid = mitgcm_c_grid(nx=12, ny=6, nz=8)
        rng = np.random.RandomState(0)
        q = GriddedArray(rng.rand(8, 6, 12), ("Z", "YC", "XC"), name="q")
        sigma = GriddedArray(
            24 + 4 * np.sort(rng.rand(8, 6, 12), axis=0),
            ("Z", "YC", "XC"),
            name="sigma",
        )
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            out = grid.transform(
                q, "Z", np.linspace(20, 32, 9), target_data=sigma,
                method="conservative",
            )
        np.testing.assert_allclose(
            float(np.nansum(np.asarray(out.data))),
            float(np.sum(np.asarray(q.data))),
            rtol=1e-5,
        )

    def test_average_of_constant_is_constant(self):
        ds, grid = mitgcm_c_grid(nx=16, ny=8)
        c = GriddedArray(np.full((8, 16), 7.0), ("YC", "XC"))
        a = grid.average(c, ("X", "Y"))
        np.testing.assert_allclose(float(a.data), 7.0, rtol=1e-12)

    def test_cumsum_last_equals_sum(self):
        n = 16
        ds = Dataset(
            coords={
                "xc": ("xc", np.arange(n, dtype=float)),
                "xr": ("xr", np.arange(n) + 1.0),
            }
        )
        grid = Grid(
            ds, coords={"X": {"center": "xc", "right": "xr"}},
            boundary="fill", autoparse_metadata=False,
        )
        t = GriddedArray(np.random.rand(8, n), ("y", "xc"))
        cs = grid.cumsum(t, "X", to="right")
        np.testing.assert_allclose(
            np.asarray(cs.isel({"xr": -1}).data),
            np.asarray(t.sum("xc").data),
            rtol=1e-12,
        )

    def test_whole_pipeline_under_one_jit(self):
        """Topology + metrics + transform fused into a single XLA program."""
        ds, grid = cubed_sphere_grid(n=8)

        @jax.jit
        def step(x):
            da = GriddedArray(x, ("face", "y", "x"))
            zx = grid.diff(da, "X")
            zy = grid.diff(da, "Y")
            e = grid.interp(da, "X", boundary="extend")
            return jnp.sum(zx.data**2) + jnp.sum(zy.data**2) + jnp.sum(e.data)

        val = float(step(np.random.rand(6, 8, 8)))
        assert np.isfinite(val)
