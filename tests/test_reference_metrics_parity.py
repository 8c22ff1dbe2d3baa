"""Ports of the reference's metrics-subsystem tests by exact name
(reference test_metrics.py:13-400, test_metrics_ops.py:20-470),
rewritten against the native API:

- test_multiple_metrics_per_axis: get_metric picks the registered metric
  whose dims match the array.
- test_set_metric / test_set_metric_overwrite_true /
  test_set_metric_value_errors / test_set_metric_key_errors: constructor
  metrics == manual registration, the overwrite-by-matching-dims rule,
  and both typed KeyErrors.
- test_weighted_metric / test_weighted_metric_multi_axis: the
  multiply-before / divide-after contract of ``metric_weighted`` equals
  the manual sequence, single- and multi-axis.
- test_average_unmatched_missing: NaNs in the data (absent from the
  metric) do not change a weighted average of ones.
- test_missingaxis / test_metric_axes_missing_from_array: the typed
  errors when an op names an axis the grid lacks or a metric axis the
  array lacks.
"""

import warnings

import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray

from .datasets import datasets_grid_metric


def _np(x):
    return np.asarray(x.data)


def test_multiple_metrics_per_axis():
    dx = 10.0
    ds = Dataset(
        data_vars={
            "foo": (("XC",), np.array([1.0, 2.0, 4.0, 3.0])),
            "bar": (("XG",), np.array([10.0, 20.0, 30.0, 40.0])),
        },
        coords={
            "XC": ("XC", np.array([0.5, 1.5, 2.5, 3.5])),
            "XG": ("XG", np.array([0, 1.0, 2.0, 3.0])),
            "dXC": ("XC", np.full(4, dx)),
            "dXG": ("XG", np.full(4, dx)),
        },
    )
    grid = Grid(
        ds,
        coords={"X": {"center": "XC", "left": "XG"}},
        metrics={("X",): ["dXC", "dXG"]},
        periodic=True,
        autoparse_metadata=False,
    )
    np.testing.assert_allclose(
        _np(grid.get_metric(ds["foo"], ("X",))), _np(ds["dXC"])
    )
    np.testing.assert_allclose(
        _np(grid.get_metric(ds["bar"], ("X",))), _np(ds["dXG"])
    )


def test_set_metric():
    ds, coords, metrics = datasets_grid_metric("C")
    grid = Grid(ds, coords=coords, metrics=metrics, autoparse_metadata=False)
    grid_manual = Grid(ds, coords=coords, autoparse_metadata=False)
    for key, value in metrics.items():
        grid_manual.set_metrics(key, value)

    assert len(grid._metrics) > 0
    for k, v in metrics.items():
        k = frozenset(k)
        assert k in grid._metrics
        assert k in grid_manual._metrics
        for name, m_auto, m_manual in zip(
            v, grid._metrics[k], grid_manual._metrics[k]
        ):
            np.testing.assert_allclose(_np(ds[name]), _np(m_auto))
            np.testing.assert_allclose(_np(ds[name]), _np(m_manual))


def _ds_2d_metrics():
    """B/C-grid slab whose metrics carry the reference's four DISTINCT
    2-D dim combinations ((yt,xt), (yu,xt), (yt,xu), (yu,xu); reference
    datasets.py:550-720) — required for the overwrite-by-matching-dims
    rule to single out one metric."""
    ny, nx = 3, 4
    rng = np.random.RandomState(5)
    coords = {
        "xt": ("xt", np.arange(nx) + 0.5),
        "xu": ("xu", np.arange(nx) + 1.0),
        "yt": ("yt", np.arange(ny) + 0.5),
        "yu": ("yu", np.arange(ny) + 1.0),
    }
    for name, dims in [
        ("dx_t", ("yt", "xt")),
        ("dx_n", ("yu", "xt")),
        ("dx_e", ("yt", "xu")),
        ("dx_ne", ("yu", "xu")),
        ("area_t", ("yt", "xt")),
        ("area_n", ("yu", "xt")),
        ("area_e", ("yt", "xu")),
        ("area_ne", ("yu", "xu")),
    ]:
        coords[name] = (dims, rng.rand(ny, nx) + 1.0)
    ds = Dataset(coords=coords)
    grid_coords = {
        "X": {"center": "xt", "right": "xu"},
        "Y": {"center": "yt", "right": "yu"},
    }
    return ds, grid_coords


@pytest.mark.parametrize(
    "metric_axes, exist_metric_varname, add_metric_varname, expected_varname",
    [
        (
            "X",
            ["dx_t", "dx_n", "dx_e", "dx_ne"],
            ["dx_n_overwrite"],
            ["dx_t", "dx_n_overwrite", "dx_e", "dx_ne"],
        ),
        (
            ("Y", "X"),
            ["area_t", "area_n", "area_e", "area_ne"],
            ["area_n_overwrite"],
            ["area_t", "area_n_overwrite", "area_e", "area_ne"],
        ),
        # overwrite 1 existing metric, append 1 new metric
        (
            "X",
            ["dx_t", "dx_n", "dx_e"],
            ["dx_n_overwrite", "dx_ne"],
            ["dx_t", "dx_n_overwrite", "dx_e", "dx_ne"],
        ),
    ],
)
def test_set_metric_overwrite_true(
    metric_axes, exist_metric_varname, add_metric_varname, expected_varname
):
    ds, coords = _ds_2d_metrics()
    # a new coord with the same dims as an existing metric
    ds = ds.assign_coords(
        {add_metric_varname[0]: ds[exist_metric_varname[1]] * 10}
    )
    key0 = frozenset(list(metric_axes))
    metrics = {key0: list(exist_metric_varname)}
    grid = Grid(ds, coords=coords, metrics=metrics, autoparse_metadata=False)
    for av in add_metric_varname:
        grid.set_metrics(metric_axes, av, overwrite=True)

    key = frozenset(list(metric_axes))
    set_metric = grid._metrics.get(key)
    assert len(set_metric) == len(expected_varname)
    for got, ev in zip(set_metric, expected_varname):
        np.testing.assert_allclose(_np(got), _np(ds[ev]))


@pytest.mark.parametrize(
    "metric_axes,overwrite_metric,add_metric",
    [("X", "dx_t_overwrite", "dx_t"), ("X", "dx_e", None)],
)
def test_set_metric_value_errors(metric_axes, overwrite_metric, add_metric):
    ds, coords, metrics = datasets_grid_metric("C")
    if add_metric is not None:
        ds = ds.assign_coords({overwrite_metric: ds[add_metric] * 10})
    grid = Grid(ds, coords=coords, metrics=metrics, autoparse_metadata=False)
    with pytest.raises(ValueError, match="setting overwrite=True."):
        grid.set_metrics(metric_axes, overwrite_metric)


@pytest.mark.parametrize(
    "metric_axes,add_metric",
    [("X", "foo"), (("U", "V"), "area_n")],
)
def test_set_metric_key_errors(metric_axes, add_metric):
    ds, coords, metrics = datasets_grid_metric("C")
    grid = Grid(ds, coords=coords, metrics=metrics, autoparse_metadata=False)
    if len(metric_axes) == 1:
        with pytest.raises(KeyError, match="not found in dataset."):
            grid.set_metrics(metric_axes, add_metric)
    else:
        with pytest.raises(KeyError, match="not compatible with grid axes"):
            grid.set_metrics(metric_axes, add_metric)


@pytest.mark.parametrize("funcname", ["interp", "diff"])
@pytest.mark.parametrize("grid_type", ["B", "C"])
@pytest.mark.parametrize("variable", ["tracer", "u", "v"])
@pytest.mark.parametrize(
    "metric_weighted", ["X", ("Y",), ("X", "Y"), ["X", "Y"]]
)
@pytest.mark.parametrize("boundary", ["fill", "extend"])
class TestParametrized:
    @pytest.mark.parametrize("axis", ["X", "Y"])
    def test_weighted_metric(
        self, funcname, grid_type, variable, axis, metric_weighted, boundary
    ):
        """metric_weighted == multiply by the metric, apply, divide by the
        metric at the new position (reference test_metrics_ops.py:29)."""
        ds, coords, metrics = datasets_grid_metric(grid_type)
        grid = Grid(
            ds, coords=coords, metrics=metrics, autoparse_metadata=False
        )
        func = getattr(grid, funcname)

        metric = grid.get_metric(ds[variable], metric_weighted)
        expected_raw = func(ds[variable] * metric, axis, boundary=boundary)
        metric_new = grid.get_metric(expected_raw, metric_weighted)
        expected = expected_raw / metric_new
        new = func(
            ds[variable], axis, metric_weighted=metric_weighted,
            boundary=boundary,
        )
        assert new.dims == expected.dims
        np.testing.assert_allclose(_np(new), _np(expected))

    @pytest.mark.parametrize(
        "multi_axis", ["X", ["X"], ("Y"), ["X", "Y"], ("Y", "X")]
    )
    def test_weighted_metric_multi_axis(
        self, funcname, grid_type, variable, multi_axis, metric_weighted,
        boundary,
    ):
        """multi-axis weighted ops == the single-axis ops in sequence
        (reference test_metrics_ops.py:56)."""
        ds, coords, metrics = datasets_grid_metric(grid_type)
        grid = Grid(
            ds, coords=coords, metrics=metrics, autoparse_metadata=False
        )
        func = getattr(grid, funcname)
        expected = ds[variable]
        for ax in multi_axis:
            expected = func(
                expected, ax, metric_weighted=metric_weighted,
                boundary=boundary,
            )
        new = func(
            ds[variable], multi_axis, metric_weighted=metric_weighted,
            boundary=boundary,
        )
        assert new.dims == expected.dims
        np.testing.assert_allclose(_np(new), _np(expected))


def test_average_unmatched_missing():
    """NaNs in the data (absent from the metric) leave an average of ones
    unchanged (reference test_metrics_ops.py:87)."""
    x = np.arange(10)
    ds = Dataset(
        data_vars={"data": (("x",), np.ones(10))},
        coords={
            "x": ("x", x * 1.0),
            "weights": ("x", np.ones(10) * 30),
        },
    )
    grid = Grid(
        ds,
        coords={"X": {"center": "x"}},
        metrics={"X": ["weights"]},
        autoparse_metadata=False,
    )
    expected = grid.average(ds["data"], "X")

    masked = np.ones(10)
    masked[6:8] = np.nan
    out = grid.average(GriddedArray(masked, ("x",), name="data"), "X")
    np.testing.assert_allclose(_np(expected), _np(out))


@pytest.mark.parametrize("funcname", ["interp", "diff", "cumsum", "derivative", "cumint"])
@pytest.mark.parametrize("axis", ["X", "Y", "Z"])
def test_missingaxis(axis, funcname):
    """Ops naming an axis the grid lacks raise the reference's KeyError
    (reference test_metrics_ops.py:371)."""
    ds, coords, metrics = datasets_grid_metric("C")
    coords = dict(coords)
    del coords[axis]
    metrics = {k: v for k, v in metrics.items() if axis not in k}
    grid = Grid(ds, coords=coords, metrics=metrics, autoparse_metadata=False)
    func = getattr(grid, funcname)
    kwargs = dict(boundary="fill") if funcname == "cumint" else {}
    with pytest.raises(KeyError, match="Did not find axis"):
        func(ds["tracer"], ["X", "Y", "Z"], **kwargs)


@pytest.mark.parametrize("funcname", ["interp", "diff", "cumsum", "derivative", "cumint"])
def test_metric_axes_missing_from_array(funcname):
    """Ops on an array lacking the axis dim raise the reference's
    ValueError (reference test_metrics_ops.py:427)."""
    ds, coords, metrics = datasets_grid_metric("C")
    grid = Grid(ds, coords=coords, metrics=metrics, autoparse_metadata=False)
    func = getattr(grid, funcname)
    kwargs = dict(boundary="fill") if funcname == "cumint" else {}

    tracer = ds["tracer"]
    reduced = GriddedArray(
        np.asarray(tracer.data).mean(axis=-1),
        tracer.dims[:-1],
        name="tracer",
    )
    with pytest.raises(ValueError, match="Did not find single matching dimension"):
        func(reduced, "X", **kwargs)
    with pytest.raises(ValueError, match="Did not find single matching dimension"):
        func(reduced, ["X", "Y", "Z"], **kwargs)


# ---------------------------------------------------------------------------
# get_metric resolution conditions (reference test_metrics.py:42-280)
# ---------------------------------------------------------------------------


def test_metrics_2d_grid():
    # this is a uniform grid
    # a non-uniform grid would provide a more rigorous test
    dx = 10.0
    dy = 11.0
    area = 120.0
    ny, nx = 7, 9
    ds = Dataset(
        data_vars={"foo": (("YC", "XC"), np.ones((ny, nx)))},
        coords={
            "XC": ("XC", np.arange(nx, dtype=float)),
            "dX": (("XC",), np.full(nx, dx)),
            "YC": ("YC", np.arange(ny, dtype=float)),
            "dY": (("YC",), np.full(ny, dy)),
            "area": (("YC", "XC"), np.full((ny, nx), area)),
        },
    )

    grid = Grid(
        ds,
        coords={"X": {"center": "XC"}, "Y": {"center": "YC"}},
        metrics={("X",): ["dX"], ("Y",): ["dY"], ("X", "Y"): ["area"]},
        autoparse_metadata=False,
    )

    np.testing.assert_allclose(_np(grid.get_metric(ds["foo"], ("X",))), _np(ds["dX"]))
    np.testing.assert_allclose(_np(grid.get_metric(ds["foo"], ("Y",))), _np(ds["dY"]))
    np.testing.assert_allclose(
        _np(grid.get_metric(ds["foo"], ("X", "Y"))), _np(ds["area"])
    )
    np.testing.assert_allclose(
        _np(grid.get_metric(ds["foo"], ("Y", "X"))), _np(ds["area"])
    )

    # try with no area metric: falls back to the dX*dY product (condition 3)
    grid = Grid(
        ds,
        coords={"X": {"center": "XC"}, "Y": {"center": "YC"}},
        metrics={("X",): ["dX"], ("Y",): ["dY"]},
        autoparse_metadata=False,
    )
    product = grid.get_metric(ds["foo"], ("Y", "X"))
    expected = np.asarray(ds["dY"].data)[:, None] * np.asarray(ds["dX"].data)[None, :]
    np.testing.assert_allclose(
        _np(product.transpose("YC", "XC"))
        if hasattr(product, "transpose")
        else _np(product),
        expected,
    )


@pytest.mark.parametrize(
    "key, metric_vars",
    [
        (("X",), ["dx_t"]),  # recommended way
        ("X", "dx_t"),
        (("X", "Y"), ["area_t"]),
        (
            ("X", "Y"),
            ["area_t", "area_t"],
        ),  # this should also trigger an error, it does not (reference parity)
        (("X", "Y"), ["area_t", "area_e", "area_n", "area_ne"]),
        (("X", "Y", "Z"), ["volume_t"]),
    ],
)
def test_assign_metric(key, metric_vars):
    ds, coords, _ = datasets_grid_metric("C")
    _ = Grid(ds, coords=coords, metrics={key: metric_vars}, autoparse_metadata=False)


@pytest.mark.parametrize(
    "axes, expected",
    [
        (
            ("X", "Y"),
            (
                (frozenset({"X", "Y"}),),
                (frozenset({"X"}), frozenset({"Y"})),
                (frozenset({"Y"}), frozenset({"X"})),
            ),
        ),
        (
            ("X", "Y", "Z"),
            (
                (frozenset({"Y", "X", "Z"}),),
                (frozenset({"Z"}), frozenset({"X"}), frozenset({"Y"})),
                (frozenset({"X"}), frozenset({"Y"}), frozenset({"Z"})),
                (frozenset({"Y"}), frozenset({"X"}), frozenset({"Z"})),
                (frozenset({"Y", "Z"}), frozenset({"X"})),
                (frozenset({"Y", "X"}), frozenset({"Z"})),
                (frozenset({"X", "Z"}), frozenset({"Y"})),
            ),
        ),
    ],
)
def test_iterate_axis_combinations(axes, expected):
    from xgcm_tpu.core.metrics import iterate_axis_combinations

    actual = list(iterate_axis_combinations(axes))
    expected = [set(e) for e in expected]
    actual = [set(a) for a in actual]

    # output order is not guaranteed: same count, same elements both ways
    assert len(actual) == len(expected)
    for a in actual:
        assert set(a) in expected
    for e in expected:
        assert set(e) in actual


@pytest.mark.parametrize(
    "axes, data_var, drop_vars, metric_expected_list",
    [
        ("X", "tracer", None, ["dx_t"]),
        (["X", "Y"], "tracer", None, ["area_t"]),
        (("X", "Y"), "tracer", None, ["area_t"]),
        (["X", "Y", "Z"], "tracer", None, ["volume_t"]),
        (["X"], "u", None, ["dx_e"]),
        (["X", "Y"], "u", None, ["area_e"]),
    ],
)
def test_get_metric_orig(axes, data_var, drop_vars, metric_expected_list):
    ds, coords, metrics = datasets_grid_metric("C")
    if drop_vars:
        metrics = {k: [a for a in v if a not in drop_vars] for k, v in metrics.items()}

    grid = Grid(ds, coords=coords, metrics=metrics, autoparse_metadata=False)
    metric = grid.get_metric(ds[data_var], axes)
    expected = 1.0
    for me in metric_expected_list:
        expected = expected * np.asarray(ds[me].data)
    np.testing.assert_allclose(_np(metric), expected)


def test_get_metric_with_conditions_01():
    # Condition 1: metric with matching axes and dimensions exists
    ds, coords, metrics = datasets_grid_metric("C")
    grid = Grid(ds, coords=coords, metrics=metrics, autoparse_metadata=False)
    get_metric = grid.get_metric(ds["v"], ("X", "Y"))
    np.testing.assert_allclose(_np(get_metric), _np(ds["area_n"]))


@pytest.mark.parametrize("periodic", [True, False])
def test_get_metric_with_conditions_02a(periodic):
    # Condition 2, case a: interpolate metric with matching axes to the
    # desired dimensions
    ds, coords, _ = datasets_grid_metric("C")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        grid = Grid(
            ds,
            coords=coords,
            periodic=periodic,
            boundary="extend",
            autoparse_metadata=False,
        )
    grid.set_metrics(("X", "Y"), "area_e")

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        get_metric = grid.get_metric(ds["v"], ("X", "Y"))
        expected_metric = grid.interp(ds["area_e"], ("X", "Y"))

    np.testing.assert_allclose(_np(get_metric), _np(expected_metric))


def test_get_metric_with_conditions_02b():
    # Condition 2, case b: select the metric with matching axes and
    # interpolate from there, even if other metrics in the desired
    # positions are available
    ds, coords, _ = datasets_grid_metric("C")
    grid = Grid(ds, coords=coords, autoparse_metadata=False)
    grid.set_metrics(("X", "Y"), "area_e")
    grid.set_metrics(("X"), "dx_n")
    grid.set_metrics(("Y"), "dx_n")

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        get_metric = grid.get_metric(ds["v"], ("X", "Y"))
        # condition 2 interpolates with boundary="extend" regardless of the
        # grid default (reference grid.py:497-500)
        expected_metric = grid.interp(ds["area_e"], ("X", "Y"), boundary="extend")

    np.testing.assert_allclose(_np(get_metric), _np(expected_metric))


def test_get_metric_with_conditions_03a():
    # Condition 3: use provided metrics with matching dimensions to
    # calculate the required metric
    ds, coords, _ = datasets_grid_metric("C")
    grid = Grid(ds, coords=coords, autoparse_metadata=False)
    grid.set_metrics(("X"), "dx_n")
    grid.set_metrics(("Y"), "dy_n")

    get_metric = grid.get_metric(ds["v"], ("X", "Y"))
    expected = np.asarray(ds["dy_n"].data)[:, None] * np.asarray(ds["dx_n"].data)[None, :]
    np.testing.assert_allclose(
        _np(get_metric.transpose("yu", "xt")), expected
    )


def test_get_metric_with_conditions_03b():
    ds, coords, _ = datasets_grid_metric("C")
    grid = Grid(ds, coords=coords, autoparse_metadata=False)
    grid.set_metrics(("X", "Y"), "area_t")
    grid.set_metrics(("Z"), "dz_t")

    get_metric = grid.get_metric(ds["tracer"], ("X", "Y", "Z"))
    expected = (
        np.asarray(ds["dz_t"].data)[:, None, None]
        * np.asarray(ds["area_t"].data)[None, :, :]
    )
    np.testing.assert_allclose(
        _np(get_metric.transpose("zt", "yt", "xt")), expected
    )


def test_get_metric_with_conditions_04a():
    # Condition 4, case a: 1 metric on the wrong position (must interpolate
    # before multiplying).  Needs genuinely 2-D metrics (reference
    # datasets.py:597-622): dx_t lives at (yt, xt) while v is at (yu, xt).
    ds, coords = _ds_2d_metrics()
    grid = Grid(ds, coords=coords, autoparse_metadata=False)
    grid.set_metrics(("X"), "dx_t")
    grid.set_metrics(("Y"), "dx_n")  # (yu, xt): dims already match v

    v = GriddedArray(np.random.rand(3, 4), ("yu", "xt"), name="v")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        get_metric = grid.get_metric(v, ("X", "Y"))
        # condition 4 interpolates with boundary="extend"
        # (reference grid.py:519-527)
        interp_metric = grid.interp(ds["dx_t"], "Y", boundary="extend")

    expected = np.asarray(interp_metric.transpose("yu", "xt").data) * np.asarray(
        ds["dx_n"].transpose("yu", "xt").data
    )
    np.testing.assert_allclose(_np(get_metric.transpose("yu", "xt")), expected)


def test_get_metric_with_conditions_04b():
    # Condition 4, case b: 2 metrics on the wrong position (must interpolate
    # both before multiplying).  Both dx_t and area_t live at (yt, xt) while
    # v is at (yu, xt).
    ds, coords = _ds_2d_metrics()
    grid = Grid(ds, coords=coords, autoparse_metadata=False)
    grid.set_metrics(("X"), "dx_t")
    grid.set_metrics(("Y"), "area_t")  # stand-in dy with dims (yt, xt)

    v = GriddedArray(np.random.rand(3, 4), ("yu", "xt"), name="v")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        get_metric = grid.get_metric(v, ("X", "Y"))
        # condition 4 interpolates with boundary="extend"
        # (reference grid.py:519-527)
        interp_metric_1 = grid.interp(ds["dx_t"], "Y", boundary="extend")
        interp_metric_2 = grid.interp(ds["area_t"], "Y", boundary="extend")

    expected = np.asarray(
        interp_metric_1.transpose("yu", "xt").data
    ) * np.asarray(interp_metric_2.transpose("yu", "xt").data)
    np.testing.assert_allclose(_np(get_metric.transpose("yu", "xt")), expected)
