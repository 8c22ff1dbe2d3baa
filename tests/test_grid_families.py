"""Model-grid-family factory tests: each family constructs a working grid
with the right staggering and runs the standard diagnostic ops."""

import numpy as np
import pytest

from xgcm_tpu import GriddedArray
from xgcm_tpu.grids import (
    cubed_sphere_grid,
    mitgcm_c_grid,
    mom6_symmetric_grid,
    nemo_c_grid,
)


class TestMITgcm:
    def test_staggering(self):
        ds, grid = mitgcm_c_grid(nx=16, ny=8, nz=4)
        assert grid.axes["X"].coords == {"center": "XC", "left": "XG"}
        assert grid.axes["X"].boundary == "periodic"
        assert grid.axes["Y"].boundary == "extend"

    def test_vorticity_pipeline(self):
        ds, grid = mitgcm_c_grid(nx=16, ny=8)
        u = GriddedArray(np.random.rand(8, 16), ("YC", "XG"))
        v = GriddedArray(np.random.rand(8, 16), ("YG", "XC"))
        zeta = grid.diff(v, "X") - grid.diff(u, "Y")
        assert zeta.dims == ("YG", "XG")

    def test_area_integral(self):
        ds, grid = mitgcm_c_grid(nx=16, ny=8)
        t = GriddedArray(np.ones((8, 16)), ("YC", "XC"))
        total = grid.integrate(t, ("X", "Y"))
        ra = np.asarray(ds["rA"].data)
        np.testing.assert_allclose(float(total.data), ra.sum(), rtol=1e-6)


class TestNEMO:
    def test_right_staggering(self):
        ds, grid = nemo_c_grid(nx=16, ny=8, nz=4)
        assert grid.axes["X"].coords == {"center": "x_c", "right": "x_r"}
        # default shift from center must go to right
        assert grid.axes["X"].default_shifts["center"] == "right"

    def test_ops(self):
        ds, grid = nemo_c_grid(nx=16, ny=8, nz=4)
        t = GriddedArray(np.random.rand(8, 16), ("y_c", "x_c"))
        out = grid.interp(t, "X")
        assert out.dims == ("y_c", "x_r")
        d = grid.derivative(t, "X")
        assert d.dims == ("y_c", "x_r")


class TestMOM6:
    def test_outer_staggering(self):
        ds, grid = mom6_symmetric_grid(nx=16, ny=8)
        assert grid.axes["X"].coords == {"center": "xh", "outer": "xq"}
        assert ds.dims["xq"] == 17

    def test_center_to_outer(self):
        ds, grid = mom6_symmetric_grid(nx=16, ny=8)
        t = GriddedArray(np.random.rand(8, 16), ("yh", "xh"))
        out = grid.interp(t, "X")  # default shift center -> outer
        assert out.dims == ("yh", "xq")
        assert out.sizes["xq"] == 17


class TestCubedSphere:
    def test_topology_valid_and_ops_run(self):
        ds, grid = cubed_sphere_grid(n=4)
        field = GriddedArray(
            np.broadcast_to(
                np.arange(6, dtype=float)[:, None, None], (6, 4, 4)
            ).copy(),
            ("face", "y", "x"),
        )
        d = grid.diff(field, "X")
        np.testing.assert_allclose(
            np.asarray(d.data)[:, 0, 0], [-3, 1, 1, 1, 1, 2]
        )


class TestLLCGrid:
    def test_topology_valid_and_matches_fixture_table(self):
        from xgcm_tpu.grids import LLC_CONNECTIONS, llc_grid

        from .datasets import llc_dataset

        ds, grid = llc_grid(n=4)
        assert ds.dims["face"] == 13
        # package table and independently-written test fixture table agree
        _, fixture_fc = llc_dataset(n=4)
        assert LLC_CONNECTIONS == fixture_fc

    def test_ops_run_across_the_cap(self):
        from xgcm_tpu.grids import llc_grid

        ds, grid = llc_grid(n=4)
        field = GriddedArray(np.random.rand(13, 4, 4), ("face", "y", "x"))
        for axis in ("X", "Y"):
            out = grid.diff(field, axis, boundary="fill")
            assert out.sizes["face"] == 13


class TestFamilyPipelines:
    def test_mitgcm_derivative_and_cumint(self):
        ds, grid = mitgcm_c_grid(nx=12, ny=6, nz=4)
        th = GriddedArray(np.random.rand(4, 6, 12), ("Z", "YC", "XC"))
        d = grid.derivative(th, "X")
        assert d.dims == ("Z", "YC", "XG")
        ci = grid.cumint(th, "Z", boundary="extend")
        assert ci.dims == ("Zl", "YC", "XC")

    def test_mitgcm_transform(self):
        ds, grid = mitgcm_c_grid(nx=8, ny=4, nz=6)
        rng = np.random.RandomState(0)
        th = GriddedArray(rng.rand(6, 4, 8), ("Z", "YC", "XC"), name="t")
        rho = GriddedArray(
            24 + 4 * np.sort(rng.rand(6, 4, 8), axis=0),
            ("Z", "YC", "XC"),
            name="sigma",
        )
        out = grid.transform(th, "Z", np.linspace(24.5, 28, 5), target_data=rho)
        assert out.dims == ("YC", "XC", "sigma")

    def test_nemo_cumint(self):
        ds, grid = nemo_c_grid(nx=8, ny=4, nz=6)
        th = GriddedArray(np.random.rand(6, 4, 8), ("z_c", "y_c", "x_c"))
        ci = grid.cumint(th, "Z", boundary="extend")
        assert ci.dims == ("z_l", "y_c", "x_c")
