"""Vertical transform tests, layered like the reference suite
(test_transform.py:1-6): low-level kernels vs numpy oracles, then
Grid.transform behaviour (naming, flipping, masking, conservation)."""

import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.ops.transform import interp_1d_conservative, interp_1d_linear


def conservative_oracle(phi, theta, bins):
    """Straightforward per-column implementation of the conservative-binning
    spec (overlap-weighted accumulation with NaN handling)."""
    phi = np.asarray(phi, dtype=float)
    theta = np.asarray(theta, dtype=float)
    bins = np.asarray(bins, dtype=float)
    out = np.full(len(bins) - 1, np.nan)
    for i in range(phi.shape[-1]):
        t1, t2 = theta[i], theta[i + 1]
        if np.isnan(t1) and np.isnan(t2):
            continue
        if np.isnan(t1):
            tmin = tmax = t2
        elif np.isnan(t2):
            tmin = tmax = t1
        else:
            tmin, tmax = min(t1, t2), max(t1, t2)
        for j in range(len(bins) - 1):
            if np.isnan(phi[i]):
                continue
            b1, b2 = bins[j], bins[j + 1]
            if b1 > tmax or b2 < tmin:
                continue
            if tmax == tmin:
                contrib = phi[i]
            else:
                contrib = (
                    (min(tmax, b2) - max(tmin, b1)) / (tmax - tmin) * phi[i]
                )
            out[j] = contrib if np.isnan(out[j]) else out[j] + contrib
    return out


class TestLinearKernel:
    def test_matches_np_interp_increasing(self):
        n, m = 30, 7
        theta = np.sort(np.random.rand(n)) * 10
        phi = np.random.rand(n)
        target = np.linspace(0, 10, m)
        out = interp_1d_linear(phi, theta, target)
        np.testing.assert_allclose(np.asarray(out), np.interp(target, theta, phi))

    def test_decreasing_flipped(self):
        n = 20
        theta = np.sort(np.random.rand(n))[::-1].copy() * 10
        phi = np.random.rand(n)
        target = np.linspace(1, 9, 5)
        out = interp_1d_linear(phi, theta, target)
        np.testing.assert_allclose(
            np.asarray(out), np.interp(target, theta[::-1], phi[::-1])
        )

    def test_mask_edges(self):
        theta = np.arange(10.0)
        phi = np.random.rand(10)
        target = np.array([-1.0, 0.0, 5.0, 9.0, 20.0])
        out = np.asarray(interp_1d_linear(phi, theta, target, mask_edges=True))
        assert np.isnan(out[0]) and np.isnan(out[-1])
        np.testing.assert_allclose(out[1:-1], np.interp(target[1:-1], theta, phi))

    def test_no_mask_edges_repeats(self):
        theta = np.arange(10.0)
        phi = np.random.rand(10)
        target = np.array([-1.0, 20.0])
        out = np.asarray(interp_1d_linear(phi, theta, target, mask_edges=False))
        np.testing.assert_allclose(out, [phi[0], phi[-1]])

    def test_logarithmic(self):
        theta = np.array([1.0, 10.0, 100.0, 1000.0])
        phi = np.arange(4.0)
        target = np.array([31.62278])  # 10**1.5 -> halfway in log space
        out = np.asarray(
            interp_1d_linear(phi, theta, target, logarithmic=True)
        )
        np.testing.assert_allclose(out, [1.5], rtol=1e-5)

    def test_nan_bottomed_column_masked(self):
        """Ocean-style column: valid values on top, NaN below the sea floor.
        In-range targets interpolate over the valid part; out-of-range
        targets are masked (the reference's mask_edges contract)."""
        theta = np.array([1.0, 2.0, 3.0, 4.0, np.nan, np.nan])
        phi = np.array([10.0, 20.0, 30.0, 40.0, np.nan, np.nan])
        target = np.array([0.5, 1.5, 3.5, 4.5])
        out = np.asarray(
            interp_1d_linear(phi, theta, target, mask_edges=True)
        )
        assert np.isnan(out[0]) and np.isnan(out[-1])
        np.testing.assert_allclose(out[1:3], [15.0, 35.0])

    def test_batched_columns(self):
        b, n, m = 5, 20, 6
        theta = np.sort(np.random.rand(b, n), axis=-1) * 10
        phi = np.random.rand(b, n)
        target = np.linspace(0, 10, m)
        out = np.asarray(interp_1d_linear(phi, theta, target))
        for i in range(b):
            np.testing.assert_allclose(out[i], np.interp(target, theta[i], phi[i]))


class TestConservativeKernel:
    def test_matches_oracle(self):
        n = 12
        theta = np.sort(np.random.rand(n + 1)) * 10
        phi = np.random.rand(n)
        bins = np.linspace(-1, 11, 8)
        out = np.asarray(interp_1d_conservative(phi, theta, bins))
        np.testing.assert_allclose(out, conservative_oracle(phi, theta, bins))

    def test_conserves_total(self):
        n = 15
        theta = np.sort(np.random.rand(n + 1)) * 10
        phi = np.random.rand(n)
        bins = np.linspace(-5, 15, 9)  # covers full range
        out = np.asarray(interp_1d_conservative(phi, theta, bins))
        np.testing.assert_allclose(np.nansum(out), phi.sum())

    def test_nan_phi_excluded(self):
        theta = np.arange(6.0)
        phi = np.array([1.0, np.nan, 2.0, 3.0, 4.0])
        bins = np.linspace(0, 5, 4)
        out = np.asarray(interp_1d_conservative(phi, theta, bins))
        np.testing.assert_allclose(out, conservative_oracle(phi, theta, bins))

    def test_nan_theta_homogeneous_cell(self):
        theta = np.array([0.0, 1.0, np.nan, 3.0, 4.0])
        phi = np.array([1.0, 1.0, 1.0, 1.0])
        bins = np.linspace(0, 4, 5)
        out = np.asarray(interp_1d_conservative(phi, theta, bins))
        np.testing.assert_allclose(out, conservative_oracle(phi, theta, bins))

    def test_all_nan_column_stays_nan(self):
        theta = np.full(5, np.nan)
        phi = np.random.rand(4)
        bins = np.linspace(0, 4, 5)
        out = np.asarray(interp_1d_conservative(phi, theta, bins))
        assert np.all(np.isnan(out))

    def test_decreasing_target_flipped(self):
        n = 10
        theta = np.sort(np.random.rand(n + 1)) * 10
        phi = np.random.rand(n)
        bins = np.linspace(-1, 11, 7)
        fwd = np.asarray(interp_1d_conservative(phi, theta, bins))
        rev = np.asarray(interp_1d_conservative(phi, theta, bins[::-1].copy()))
        np.testing.assert_allclose(rev, fwd[::-1])

    def test_non_monotonic_target_raises(self):
        theta = np.arange(5.0)
        phi = np.random.rand(4)
        with pytest.raises(ValueError, match="not monotonic"):
            interp_1d_conservative(phi, theta, np.array([0.0, 2.0, 1.0]))

    def test_non_monotonic_theta_allowed(self):
        """Conservative handles non-monotonic stratification per cell."""
        theta = np.array([0.0, 2.0, 1.0, 3.0])
        phi = np.array([1.0, 1.0, 1.0])
        bins = np.linspace(0, 3, 4)
        out = np.asarray(interp_1d_conservative(phi, theta, bins))
        np.testing.assert_allclose(out, conservative_oracle(phi, theta, bins))


NZ = 12


@pytest.fixture()
def zgrid():
    zc = np.arange(NZ) + 0.5
    zo = np.arange(NZ + 1, dtype=float)
    ds = Dataset(
        coords={
            "zc": ("zc", zc),
            "zo": ("zo", zo),
        }
    )
    grid = Grid(
        ds,
        coords={"Z": {"center": "zc", "outer": "zo"}},
        periodic=False,
        autoparse_metadata=False,
    )
    return ds, grid


class TestGridTransform:
    def test_periodic_axis_rejected(self):
        ds = Dataset(coords={"zc": ("zc", np.arange(4.0))})
        grid = Grid(
            ds, coords={"Z": {"center": "zc"}}, autoparse_metadata=False
        )
        da = GriddedArray(np.random.rand(4), ("zc",))
        with pytest.raises(ValueError, match="non-periodic"):
            grid.transform(da, "Z", np.array([1.0, 2.0]))

    def test_linear_named_output(self, zgrid):
        ds, grid = zgrid
        da = GriddedArray(np.random.rand(NZ), ("zc",), name="temp")
        sigma = GriddedArray(
            np.linspace(20, 28, NZ), ("zc",), name="sigma"
        )
        target = np.linspace(21, 27, 5)
        out = grid.transform(da, "Z", target, target_data=sigma)
        assert out.name == "temp_transformed"
        assert out.dims == ("sigma",)
        np.testing.assert_allclose(
            np.asarray(out.data),
            np.interp(target, np.asarray(sigma.data), np.asarray(da.data)),
        )

    def test_linear_default_target_data_is_dim_coord(self, zgrid):
        """target_data=None: transform onto the axis dim coordinate itself."""
        ds, grid = zgrid
        da = GriddedArray(np.random.rand(NZ), ("zc",), name="temp")
        target = np.array([2.2, 5.5, 8.8])
        out = grid.transform(da, "Z", target, mask_edges=False)
        np.testing.assert_allclose(
            np.asarray(out.data),
            np.interp(target, np.asarray(ds["zc"].data), np.asarray(da.data)),
        )

    def test_nameless_target_data_warns(self, zgrid):
        ds, grid = zgrid
        da = GriddedArray(np.random.rand(NZ), ("zc",), name="temp")
        sigma = GriddedArray(np.linspace(20, 28, NZ), ("zc",))
        with pytest.warns(UserWarning, match="TRANSFORMED_DIMENSION"):
            out = grid.transform(da, "Z", np.linspace(21, 27, 5), target_data=sigma)
        assert out.dims == ("TRANSFORMED_DIMENSION",)

    def test_conservative_requires_outer(self):
        ds = Dataset(
            coords={"zc": ("zc", np.arange(4.0)), "zl": ("zl", np.arange(4.0))}
        )
        grid = Grid(
            ds,
            coords={"Z": {"center": "zc", "left": "zl"}},
            periodic=False,
            autoparse_metadata=False,
        )
        da = GriddedArray(np.random.rand(4), ("zc",), name="q")
        with pytest.raises(RuntimeError, match="`outer` coordinates"):
            grid.transform(da, "Z", np.array([0.0, 1.0]), method="conservative")

    def test_conservative_on_bounds(self, zgrid):
        ds, grid = zgrid
        da = GriddedArray(np.random.rand(NZ), ("zc",), name="q")
        sigma_outer = GriddedArray(
            np.linspace(20, 30, NZ + 1), ("zo",), name="sigma"
        )
        bins = np.linspace(19, 31, 7)
        out = grid.transform(
            da, "Z", bins, target_data=sigma_outer, method="conservative"
        )
        assert out.dims == ("sigma",)
        assert out.shape == (6,)
        np.testing.assert_allclose(np.nansum(np.asarray(out.data)), float(np.sum(da.data)))

    def test_conservative_center_target_data_interped_with_warning(self, zgrid):
        ds, grid = zgrid
        da = GriddedArray(np.random.rand(NZ), ("zc",), name="q")
        sigma_center = GriddedArray(
            np.linspace(20, 28, NZ), ("zc",), name="sigma"
        )
        bins = np.linspace(15, 35, 6)
        with pytest.warns(UserWarning, match="not located on the cell bounds"):
            out = grid.transform(
                da, "Z", bins, target_data=sigma_center, method="conservative"
            )
        np.testing.assert_allclose(np.nansum(np.asarray(out.data)), float(np.sum(da.data)))

    def test_multidim_columns(self, zgrid):
        """3D data with per-column target_data."""
        ds, grid = zgrid
        ny, nx = 3, 4
        da = GriddedArray(
            np.random.rand(ny, nx, NZ), ("y", "x", "zc"), name="temp"
        )
        sigma = GriddedArray(
            np.sort(np.random.rand(ny, nx, NZ), axis=-1) * 8 + 20,
            ("y", "x", "zc"),
            name="sigma",
        )
        target = np.linspace(21, 27, 5)
        out = grid.transform(da, "Z", target, target_data=sigma, mask_edges=False)
        assert out.dims == ("y", "x", "sigma")
        for j in range(ny):
            for i in range(nx):
                np.testing.assert_allclose(
                    np.asarray(out.data)[j, i],
                    np.interp(
                        target,
                        np.asarray(sigma.data)[j, i],
                        np.asarray(da.data)[j, i],
                    ),
                )

    def test_target_data_extra_dims_rejected(self, zgrid):
        ds, grid = zgrid
        da = GriddedArray(np.random.rand(NZ), ("zc",), name="q")
        sigma = GriddedArray(
            np.random.rand(5, NZ), ("ens", "zc"), name="sigma"
        )
        with pytest.raises(ValueError, match="additional dimensions"):
            grid.transform(da, "Z", np.array([1.0, 2.0]), target_data=sigma)

    def test_bad_input_types(self, zgrid):
        ds, grid = zgrid
        with pytest.raises(ValueError, match="`da` needs to be"):
            grid.transform("not an array", "Z", np.array([1.0]))

    def test_target_exactly_at_valid_max_of_nan_column(self):
        """Target equal to the column's nanmax must return the value there,
        not fall through to the masked/zero path."""
        theta = np.array([1.0, 2.0, 3.0, 4.0, np.nan])
        phi = np.array([10.0, 20.0, 30.0, 40.0, np.nan])
        out = np.asarray(
            interp_1d_linear(phi, theta, np.array([4.0]), mask_edges=True)
        )
        np.testing.assert_allclose(out, [40.0])

    def test_all_nan_column_returns_nan(self):
        theta = np.full(5, np.nan)
        phi = np.full(5, np.nan)
        out = np.asarray(
            interp_1d_linear(phi, theta, np.array([1.0, 2.0]), mask_edges=False)
        )
        assert np.all(np.isnan(out))


class TestTransformMulti:
    """grid.transform_multi == [grid.transform(da) for da in das] on every
    path (the CPU path exercises the fallback loop; the fused TPU kernel
    is checked against singles in test_pallas_transform)."""

    def test_matches_individual_transforms(self):
        import numpy as np

        import xgcm_tpu as xt

        rng = np.random.RandomState(7)
        nz, ncol = 12, 6
        ds = xt.Dataset(coords={
            "zc": ("zc", np.arange(nz) + 0.5),
            "zo": ("zo", np.arange(nz + 1) * 1.0),
        })
        grid = xt.Grid(
            ds, coords={"Z": {"center": "zc", "outer": "zo"}},
            periodic=False, autoparse_metadata=False,
        )
        theta = xt.GriddedArray(
            np.sort(rng.rand(ncol, nz), -1) * 20, ("col", "zc"),
            name="theta",
        )
        das = [
            xt.GriddedArray(rng.rand(ncol, nz), ("col", "zc"), name=f"v{i}")
            for i in range(3)
        ]
        target = np.linspace(1, 19, 9)
        outs = grid.transform_multi(
            das, "Z", target, target_data=theta, method="linear"
        )
        assert len(outs) == 3
        for da, out in zip(das, outs):
            single = grid.transform(
                da, "Z", target, target_data=theta, method="linear"
            )
            assert out.dims == single.dims
            assert out.name == single.name
            np.testing.assert_allclose(
                np.asarray(out.data), np.asarray(single.data), rtol=1e-12
            )

    def test_conservative_falls_back_to_loop(self):
        import numpy as np

        import xgcm_tpu as xt

        rng = np.random.RandomState(3)
        nz, ncol = 10, 4
        ds = xt.Dataset(coords={
            "zc": ("zc", np.arange(nz) + 0.5),
            "zo": ("zo", np.arange(nz + 1) * 1.0),
        })
        grid = xt.Grid(
            ds, coords={"Z": {"center": "zc", "outer": "zo"}},
            periodic=False, autoparse_metadata=False,
        )
        theta = xt.GriddedArray(
            np.sort(rng.rand(ncol, nz + 1), -1) * 20, ("col", "zo"),
            name="theta",
        )
        das = [
            xt.GriddedArray(rng.rand(ncol, nz), ("col", "zc"), name=f"v{i}")
            for i in range(2)
        ]
        bins = np.linspace(-1, 21, 8)
        outs = grid.transform_multi(
            das, "Z", bins, target_data=theta, method="conservative"
        )
        for da, out in zip(das, outs):
            single = grid.transform(
                da, "Z", bins, target_data=theta, method="conservative"
            )
            np.testing.assert_allclose(
                np.asarray(out.data), np.asarray(single.data), rtol=1e-12
            )


class TestDeepColumnScanPath:
    """Columns deep enough to exceed the dense membership-tensor budget
    take a lax.scan-over-knots formulation with O(cols*m) peak memory;
    it must match the dense path exactly."""

    def test_scan_matches_dense(self):
        import jax.numpy as jnp

        from xgcm_tpu.ops import transform as tr

        rng = np.random.RandomState(8)
        cols, n, m = 8, 40, 7
        th = np.sort(rng.rand(cols, n), -1) * 25
        th[0, 33:] = np.nan
        th[1] = th[1, ::-1]
        ph = rng.rand(cols, n)
        tt = np.linspace(-1, 27, m)

        dense = np.asarray(
            tr.interp_1d_linear(
                jnp.asarray(ph), jnp.asarray(th), jnp.asarray(tt),
                mask_edges=True,
            )
        )
        # force the scan branch by shrinking the dense budget
        orig = tr._DENSE_MEMB_BUDGET
        try:
            tr._DENSE_MEMB_BUDGET = 0
            scanned = np.asarray(
                tr.interp_1d_linear(
                    jnp.asarray(ph), jnp.asarray(th), jnp.asarray(tt),
                    mask_edges=True,
                )
            )
        finally:
            tr._DENSE_MEMB_BUDGET = orig
        np.testing.assert_allclose(scanned, dense, rtol=1e-12)

    def test_conservative_scan_matches_dense(self):
        import jax.numpy as jnp

        from xgcm_tpu.ops import transform as tr

        rng = np.random.RandomState(5)
        cols, n = 6, 20
        th = np.sort(rng.rand(cols, n + 1), -1) * 20
        th[0, 16:] = np.nan
        th[1, 7] = th[1, 6]  # degenerate cell
        ph = rng.rand(cols, n)
        ph[2, 4] = np.nan
        edges = np.linspace(-1, 21, 9)
        dense = np.asarray(
            tr.interp_1d_conservative(
                jnp.asarray(ph), jnp.asarray(th), jnp.asarray(edges)
            )
        )
        orig = tr._DENSE_MEMB_BUDGET
        try:
            tr._DENSE_MEMB_BUDGET = 0
            scanned = np.asarray(
                tr.interp_1d_conservative(
                    jnp.asarray(ph), jnp.asarray(th), jnp.asarray(edges)
                )
            )
        finally:
            tr._DENSE_MEMB_BUDGET = orig
        np.testing.assert_allclose(scanned, dense, rtol=1e-12)

    def test_nan_targets_yield_nan_like_np_interp(self):
        """np.interp(nan, ...) is NaN; the generic path must agree with
        the fused TPU kernel instead of silently producing 0.0 from the
        empty membership sum."""
        import jax.numpy as jnp

        from xgcm_tpu.ops import transform as tr
        from xgcm_tpu.ops.pallas_transform import _fused_ref_jnp

        th = np.asarray([[1.0, 2.0, 3.0, 4.0]])
        ph = np.asarray([[10.0, 20.0, 30.0, 40.0]])
        tt = np.asarray([[2.5, np.nan]])
        out = np.asarray(
            tr.interp_1d_linear(jnp.asarray(ph), jnp.asarray(th), jnp.asarray(tt))
        )
        assert out[0, 0] == 25.0
        assert np.isnan(out[0, 1])
        ref = np.asarray(
            _fused_ref_jnp(jnp.asarray(th), jnp.asarray(ph), jnp.asarray(tt))
        )
        np.testing.assert_allclose(np.nan_to_num(out, nan=-9),
                                   np.nan_to_num(ref, nan=-9))

    def test_nan_phi_at_valid_theta_propagates(self):
        """NaN DATA at a valid theta knot must make targets bracketing it
        NaN (np.interp semantics) on the generic, scan, and replica paths —
        substituting 0 silently interpolated wrong finite values."""
        import jax.numpy as jnp

        from xgcm_tpu.ops import transform as tr
        from xgcm_tpu.ops.pallas_transform import _fused_ref_jnp

        th = np.asarray([[0.0, 1.0, 2.0, 3.0, 4.0]])
        ph = np.asarray([[1.0, np.nan, 3.0, 4.0, 5.0]])
        # 0.5 and 1.5 bracket the NaN knot; 2.5 does not; -1/9 clamp
        tt = np.asarray([-1.0, 0.5, 1.5, 2.5, 9.0])
        expected = np.interp(tt, th[0], ph[0])

        for path in ("dense", "scan", "replica"):
            if path == "replica":
                out = np.asarray(
                    _fused_ref_jnp(jnp.asarray(th), jnp.asarray(ph),
                                   jnp.asarray(tt))
                )[0]
            else:
                orig = tr._DENSE_MEMB_BUDGET
                try:
                    if path == "scan":
                        tr._DENSE_MEMB_BUDGET = 0
                    out = np.asarray(
                        tr.interp_1d_linear(
                            jnp.asarray(ph), jnp.asarray(th), jnp.asarray(tt)
                        )
                    )[0]
                finally:
                    tr._DENSE_MEMB_BUDGET = orig
            np.testing.assert_allclose(
                np.nan_to_num(out, nan=-9.0),
                np.nan_to_num(expected, nan=-9.0),
                err_msg=path,
            )
            assert np.isnan(out[1]) and np.isnan(out[2]), path
            assert not np.isnan(out[3]), path

    def test_traced_decreasing_bins_match_eager(self):
        """Decreasing conservative bins passed as TRACED values (inside
        jit) must flip branchlessly — assuming increasing silently
        corrupted the result while the same eager call succeeded."""
        import jax
        import jax.numpy as jnp

        from xgcm_tpu.ops import transform as tr

        rng = np.random.RandomState(2)
        cols, n = 5, 12
        th = np.sort(rng.rand(cols, n + 1), -1) * 20
        ph = rng.rand(cols, n)
        bins_dec = np.linspace(21, -1, 9)  # decreasing

        eager = np.asarray(
            tr.interp_1d_conservative(
                jnp.asarray(ph), jnp.asarray(th), np.asarray(bins_dec)
            )
        )

        @jax.jit
        def run(p, t, b):
            return tr.interp_1d_conservative(p, t, b)

        traced = np.asarray(
            run(jnp.asarray(ph), jnp.asarray(th), jnp.asarray(bins_dec))
        )
        np.testing.assert_allclose(
            np.nan_to_num(traced, nan=-9), np.nan_to_num(eager, nan=-9),
            rtol=1e-12,
        )
        # conservation through the jit path
        np.testing.assert_allclose(
            np.nansum(traced, -1), ph.sum(-1), rtol=1e-12
        )
