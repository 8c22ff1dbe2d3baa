"""Metrics subsystem tests: registry, 4-condition get_metric resolution,
axis-combination iterator, interp_like (reference test_metrics.py)."""

import numpy as np
import pytest

from xgcm_tpu import Grid, GriddedArray
from xgcm_tpu.core.metrics import iterate_axis_combinations

from .datasets import datasets_grid_metric


@pytest.fixture()
def cgrid():
    ds, coords, metrics = datasets_grid_metric("C")
    grid = Grid(ds, coords=coords, metrics=metrics, autoparse_metadata=False)
    return ds, grid


class TestIterateAxisCombinations:
    def test_single(self):
        combos = list(iterate_axis_combinations(("X",)))
        assert combos[0] == (frozenset({"X"}),)

    def test_pair_first_yield_is_full_set(self):
        combos = list(iterate_axis_combinations(("X", "Y")))
        assert combos[0] == (frozenset({"X", "Y"}),)
        # the split into singles must appear
        split = set(map(frozenset, [[frozenset({"X"}), frozenset({"Y"})]]))
        assert any(
            set(c) == {frozenset({"X"}), frozenset({"Y"})} for c in combos[1:]
        )

    def test_triple_contains_pair_single_split(self):
        combos = list(iterate_axis_combinations(("X", "Y", "Z")))
        assert combos[0] == (frozenset({"X", "Y", "Z"}),)
        assert any(
            set(c) == {frozenset({"X", "Y"}), frozenset({"Z"})} for c in combos
        )


class TestSetMetrics:
    def test_unknown_axis(self, cgrid):
        _, grid = cgrid
        with pytest.raises(KeyError, match="not compatible with grid axes"):
            grid.set_metrics(("Q",), "dx_t")

    def test_unknown_variable(self, cgrid):
        _, grid = cgrid
        with pytest.raises(KeyError, match="not found in dataset"):
            grid.set_metrics(("X",), "nonexistent")

    def test_overwrite_requires_flag(self, cgrid):
        _, grid = cgrid
        with pytest.raises(ValueError, match="already assigned in metrics"):
            grid.set_metrics(("X",), "dx_t")
        grid.set_metrics(("X",), "dx_t", overwrite=True)

    def test_str_key_promoted(self, cgrid):
        ds, grid = cgrid
        grid.set_metrics("Z", "dz_t", overwrite=True)
        assert frozenset(("Z",)) in grid._metrics


class TestGetMetric:
    def test_condition1_exact_match(self, cgrid):
        ds, grid = cgrid
        tracer = ds["tracer"]
        m = grid.get_metric(tracer, ("X",))
        np.testing.assert_allclose(np.asarray(m.data), np.asarray(ds["dx_t"].data))

    def test_condition1_2d(self, cgrid):
        ds, grid = cgrid
        tracer = ds["tracer"]
        m = grid.get_metric(tracer, ("X", "Y"))
        np.testing.assert_allclose(
            np.asarray(m.data), np.asarray(ds["area_t"].data)
        )

    def test_condition3_product(self, cgrid):
        """No (X,Z) metric is registered: derive dx_t * dz_t."""
        ds, grid = cgrid
        tracer = ds["tracer"]
        m = grid.get_metric(tracer, ("X", "Z"))
        expected = (
            np.asarray(ds["dx_t"].data)[None, :]
            * np.asarray(ds["dz_t"].data)[:, None]
        )
        got = m.transpose("zt", "xt")
        np.testing.assert_allclose(np.asarray(got.data), expected)

    def test_condition3_no_spurious_warning(self, cgrid):
        """Condition-3 products that eventually match exactly must not emit
        interpolation warnings for earlier non-matching combos (two-phase
        scan; improves on the reference's eager warn-in-loop,
        grid.py:502-527)."""
        import warnings as _warnings

        ds, grid = cgrid
        tracer = ds["tracer"]
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")
            grid.get_metric(tracer, ("X", "Z"))

    def test_no_axis_dim_on_array(self, cgrid):
        """Array lacking any dim for the requested axis errors out early
        (reference grid.py:478-480)."""
        ds, grid = cgrid
        stranger = GriddedArray(np.zeros((4,)), ("xt",))
        with pytest.raises(ValueError, match="Did not find single matching"):
            grid.get_metric(stranger, ("Z",))

    def test_condition2_interpolation_warns(self):
        """Metric exists for the axes but only at the wrong position: must
        auto-interp with a warning (reference grid.py:496-500)."""
        from xgcm_tpu import Dataset

        n = 6
        ds = Dataset(
            coords={
                "xt": ("xt", np.arange(n) + 0.5),
                "xu": ("xu", np.arange(n) + 1.0),
                "dx_t": (("xt",), np.random.rand(n) + 1.0),
            }
        )
        grid = Grid(
            ds,
            coords={"X": {"center": "xt", "right": "xu"}},
            metrics={("X",): ["dx_t"]},
            autoparse_metadata=False,
        )
        u = GriddedArray(np.random.rand(n), ("xu",))
        with pytest.warns(UserWarning, match="being interpolated"):
            m = grid.get_metric(u, ("X",))
        assert m.dims == ("xu",)


class TestInterpLike:
    def test_same_position_passthrough(self, cgrid):
        ds, grid = cgrid
        out = grid.interp_like(ds["tracer"], ds["tracer"])
        np.testing.assert_allclose(
            np.asarray(out.data), np.asarray(ds["tracer"].data)
        )

    def test_interp_to_shifted(self, cgrid):
        ds, grid = cgrid
        tracer = ds["tracer"]
        u = ds["u"]  # at xu
        out = grid.interp_like(tracer, u, boundary="extend")
        assert "xu" in out.dims and "xt" not in out.dims


class TestGetMetricCondition4:
    def test_product_with_interpolation_warns(self):
        """No (X,Z) metric; dx exists only at the wrong position (xu) so the
        product dx*dz requires interpolating dx first (reference
        grid.py:519-527)."""
        from xgcm_tpu import Dataset

        nx, nz = 6, 4
        ds = Dataset(
            coords={
                "xt": ("xt", np.arange(nx) + 0.5),
                "xu": ("xu", np.arange(nx) + 1.0),
                "zt": ("zt", np.arange(nz) + 0.5),
                "dx_u": (("xu",), np.random.rand(nx) + 1.0),
                "dz_t": (("zt",), np.random.rand(nz) + 1.0),
            }
        )
        grid = Grid(
            ds,
            coords={
                "X": {"center": "xt", "right": "xu"},
                "Z": {"center": "zt"},
            },
            boundary="extend",
            metrics={("X",): ["dx_u"], ("Z",): ["dz_t"]},
            autoparse_metadata=False,
        )
        arr = GriddedArray(np.random.rand(nz, nx), ("zt", "xt"))
        with pytest.warns(UserWarning, match="being interpolated"):
            m = grid.get_metric(arr, ("X", "Z"))
        assert set(m.dims) == {"zt", "xt"}

        # expected: dz * interp(dx_u -> xt, boundary extend)
        dx_at_xt = grid.interp(ds["dx_u"], "X", boundary="extend")
        expected = (
            np.asarray(ds["dz_t"].data)[:, None]
            * np.asarray(dx_at_xt.data)[None, :]
        )
        np.testing.assert_allclose(
            np.asarray(m.transpose("zt", "xt").data), expected
        )
