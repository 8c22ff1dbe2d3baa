"""Metric-weighted calculus ops: derivative / integrate / average / cumint,
checked against closed-form expectations on B/C grids (reference
test_metrics_ops.py:121-370 style)."""

import numpy as np
import pytest

from xgcm_tpu import Grid, GriddedArray

from .datasets import datasets_grid_metric
from .reference_impl import apply_op


@pytest.fixture(params=["B", "C"])
def gridded(request):
    ds, coords, metrics = datasets_grid_metric(request.param)
    grid = Grid(ds, coords=coords, metrics=metrics, autoparse_metadata=False)
    return ds, grid


def _np(x):
    return np.asarray(x.data if isinstance(x, GriddedArray) else x)


class TestIntegrate:
    @pytest.mark.parametrize(
        "axes,metric",
        [(("X",), "dx_t"), (("Y",), "dy_t"), (("X", "Y"), "area_t"),
         (("X", "Y", "Z"), "volume_t")],
    )
    def test_tracer(self, gridded, axes, metric):
        ds, grid = gridded
        tracer = ds["tracer"]
        result = grid.integrate(tracer, axes)
        w = _np(ds[metric])
        t = _np(tracer)
        # broadcast metric against (time, zt, yt, xt)
        if metric == "dx_t":
            expected = (t * w[None, None, None, :]).sum(axis=3)
        elif metric == "dy_t":
            expected = (t * w[None, None, :, None]).sum(axis=2)
        elif metric == "area_t":
            expected = (t * w[None, None, :, :]).sum(axis=(2, 3))
        else:
            expected = (t * w[None, :, :, :]).sum(axis=(1, 2, 3))
        np.testing.assert_allclose(_np(result), expected)


class TestAverage:
    def test_tracer_area(self, gridded):
        ds, grid = gridded
        tracer = ds["tracer"]
        result = grid.average(tracer, ("X", "Y"))
        w = _np(ds["area_t"])
        t = _np(tracer)
        expected = (t * w).sum(axis=(2, 3)) / w.sum()
        np.testing.assert_allclose(_np(result), expected)

    def test_nan_skipped(self, gridded):
        ds, grid = gridded
        t = _np(ds["tracer"]).copy()
        t[0, 0, 1, 2] = np.nan
        tracer = ds["tracer"].with_data(t)
        result = grid.average(tracer, ("X", "Y"))
        w = _np(ds["area_t"])
        mask = ~np.isnan(t)
        expected = np.nansum(t * w, axis=(2, 3)) / (mask * w).sum(axis=(2, 3))
        np.testing.assert_allclose(_np(result), expected)


class TestDerivative:
    def test_center_to_right(self, gridded):
        ds, grid = gridded
        tracer = ds["tracer"]
        result = grid.derivative(tracer, "X")  # default shift center->right
        diffed = apply_op(
            "diff", _np(tracer), "center", "right", boundary="periodic"
        )
        dx = _np(ds["dx_e"])  # metric at xu for C-grid diff output
        expected = diffed / dx[None, None, None, :]
        np.testing.assert_allclose(_np(result), expected)


class TestCumint:
    def test_cumint_x(self, gridded):
        ds, grid = gridded
        tracer = ds["tracer"]
        result = grid.cumint(tracer, "X", boundary="fill")
        w = _np(ds["dx_t"])
        t = _np(tracer)
        expected = np.cumsum(t * w[None, None, None, :], axis=3)
        np.testing.assert_allclose(_np(result), expected)
        assert result.dims[-1] == "xu"


class TestMetricWeightedKwarg:
    def test_interp_metric_weighted(self, gridded):
        """interp with metric_weighted multiplies before and divides after
        (reference grid.py:673-702)."""
        ds, grid = gridded
        tracer = ds["tracer"]
        out = grid.interp(tracer, "X", metric_weighted="X")
        t = _np(tracer)
        dx_t = _np(ds["dx_t"])
        dx_e = _np(ds["dx_e"])
        weighted = t * dx_t[None, None, None, :]
        interped = apply_op("interp", weighted, "center", "right")
        expected = interped / dx_e[None, None, None, :]
        np.testing.assert_allclose(_np(out), expected)
