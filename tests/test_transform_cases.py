"""Declarative Grid.transform cases, ported from the reference's high-level
case table (reference test_transform.py:40-687) — the ground truth for
linear/log/conservative semantics including masking, decreasing tracers,
missing values, equal-value columns, non-monotonic stratification, and
reversed targets."""

import numpy as np
import pytest
import warnings

from xgcm_tpu import Dataset, Grid, GriddedArray

interp = np.interp

CASES = {
    "linear_depth_depth": dict(
        coords={"z": [5, 25, 60]},
        positions={"center": "z"},
        data=("z", [0.23246861, 0.45175654, 0.58320681]),
        target=[0, 7, 30, 60, 70],
        kwargs=dict(mask_edges=True, method="linear"),
        expected=interp([0, 7, 30, 60, 70], [5, 25, 60],
                        [0.23246861, 0.45175654, 0.58320681]),
        mask_index=[0, -1],
    ),
    "linear_depth_depth_nomask": dict(
        coords={"z": [5, 25, 60]},
        positions={"center": "z"},
        data=("z", [0.23246861, 0.45175654, 0.58320681]),
        target=[0, 7, 30, 60, 70],
        kwargs=dict(mask_edges=False, method="linear"),
        expected=interp([0, 7, 30, 60, 70], [5, 25, 60],
                        [0.23246861, 0.45175654, 0.58320681]),
    ),
    "linear_depth_depth_renamed": dict(
        # reference test_transform.py:84 — source dim and target dim both
        # carry non-default names; output renamed with explicit suffix
        coords={"test": [5, 25, 60]},
        positions={"center": "test"},
        data=("test", [0.23246861, 0.45175654, 0.58320681]),
        target=("something", [0, 7, 30, 60, 70]),
        kwargs=dict(mask_edges=False, method="linear", suffix="_test_suffix"),
        expected=interp([0, 7, 30, 60, 70], [5, 25, 60],
                        [0.23246861, 0.45175654, 0.58320681]),
        out_name="data_test_suffix",
        expected_dims=("something",),
    ),
    "linear_depth_depth_nomask_multidim_target": dict(
        # reference test_transform.py:111 — spatially varying vertical
        # target coordinate (2D target, explicit target_dim)
        coords={"z": [5, 25, 60]},
        positions={"center": "z"},
        data=("z", [0.23246861, 0.45175654, 0.58320681]),
        target_data=("z", [5, 25, 60], "depth"),
        target=(("eta_rho", "s_rho"),
                [[0, 7, 30, 60, 70], [5, 10, 25, 50, 100]]),
        kwargs=dict(mask_edges=False, method="linear", target_dim="s_rho"),
        expected=[
            interp([0, 7, 30, 60, 70], [5, 25, 60],
                   [0.23246861, 0.45175654, 0.58320681]),
            interp([5, 10, 25, 50, 100], [5, 25, 60],
                   [0.23246861, 0.45175654, 0.58320681]),
        ],
        expected_dims=("eta_rho", "s_rho"),
    ),
    "linear_depth_depth_multidim_target": dict(
        # reference test_transform.py:162 — as above with mask_edges=True
        coords={"z": [5, 25, 60]},
        positions={"center": "z"},
        data=("z", [0.23246861, 0.45175654, 0.58320681]),
        target_data=("z", [5, 25, 60], "depth"),
        target=(("eta_rho", "s_rho"),
                [[0, 7, 30, 60, 70], [5, 10, 25, 50, 100]]),
        kwargs=dict(mask_edges=True, method="linear", target_dim="s_rho"),
        expected=[
            interp([0, 7, 30, 60, 70], [5, 25, 60],
                   [0.23246861, 0.45175654, 0.58320681]),
            interp([5, 10, 25, 50, 100], [5, 25, 60],
                   [0.23246861, 0.45175654, 0.58320681]),
        ],
        expected_dims=("eta_rho", "s_rho"),
        mask_index=[(0, 0), (0, -1), (1, -1)],
    ),
    "linear_depth_dens": dict(
        coords={"depth": [20, 40, 60, 80, 100, 120]},
        positions={"center": "depth"},
        data=("depth", [1, 4, 6, 2, 0, -3]),
        target_data=("depth", [1, 5, 10, 20, 24, 35], "dens"),
        target=[0, 5, 10, 11, 15, 20, 25, 27],
        kwargs=dict(method="linear", mask_edges=False),
        expected=[1.0, 4.0, 6.0, 5.6, 4.0, 2.0, -0.272727, -0.818182],
    ),
    "linear_depth_temp": dict(
        # reference test_transform.py:281 — interpolating onto a tracer
        # that decreases with depth
        coords={"depth": [20, 40, 60, 80, 100, 120]},
        positions={"center": "depth"},
        data=("depth", [-3, 0, 2, 6, 4, 1]),
        target_data=("depth", [35, 24, 20, 10, 5, 1], "temp"),
        target=[0, 5, 10, 11, 15, 20, 25, 27],
        kwargs=dict(method="linear", mask_edges=False),
        expected=[1.0, 4.0, 6.0, 5.6, 4.0, 2.0, -0.272727, -0.818182],
    ),
    "linear_depth_temp_missing_values": dict(
        coords={"depth": [20, 40, 60, 80, 100, 120]},
        positions={"center": "depth"},
        data=("depth", [-3, 0, 2, 6, 4, 1]),
        target_data=("depth", [np.nan, 24, 20, 10, 5, 1], "temp"),
        target=[0, 5, 10, 11, 15, 20],
        kwargs=dict(method="linear", mask_edges=False),
        expected=[1.0, 4.0, 6.0, 5.6, 4.0, 2.0],
    ),
    "linear_depth_negative_dens": dict(
        coords={"depth": [-5, -25, -60, -80, -100, -120]},
        positions={"center": "depth"},
        data=("depth", [1, 4, 6, 2, 0, -3]),
        target_data=("depth", [1, 5, 10, 20, 24, 35], "dens"),
        target=[0, 5, 10, 11, 15, 20, 25, 27],
        kwargs=dict(method="linear", mask_edges=False),
        expected=[1.0, 4.0, 6.0, 5.6, 4.0, 2.0, -0.272727, -0.818182],
    ),
    "linear_depth_dens_masked": dict(
        coords={"depth": [5, 25, 60, 80, 100, 120]},
        positions={"center": "depth"},
        data=("depth", [1, 4, 6, 2, 0, -3]),
        target_data=("depth", [1, 5, 10, 20, 24, 35], "dens"),
        target=[0, 5, 10, 11, 15, 20, 25, 27],
        kwargs=dict(method="linear", mask_edges=True),
        expected=[np.nan, 4.0, 6.0, 5.6, 4.0, 2.0, -0.272727, -0.818182],
    ),
    "linear_depth_dens_reverse": dict(
        coords={"depth": [5, 25, 60, 80, 100, 120]},
        positions={"center": "depth"},
        data=("depth", [1, 4, 6, 2, 0, -3]),
        target_data=("depth", [1, 5, 10, 20, 24, 35], "dens"),
        target=[27, 25, 20, 15, 11, 10, 5, 0],
        kwargs=dict(method="linear", mask_edges=False),
        expected=[-0.818182, -0.272727, 2.0, 4.0, 5.6, 6.0, 4.0, 1.0],
    ),
    "log_sigma_pressure": dict(
        coords={"sigma": [0.9969, 0.9558, 0.8631, 0.7046, 0.5117]},
        positions={"center": "sigma"},
        data=("sigma", [271.75452, 272.79956, 274.8517, 279.22043, 296.48782]),
        target_data=(
            "sigma",
            [100180.625, 96250.0, 87369.14, 72186.66, 53718.586],
            "pressure",
        ),
        target=[1.0e5, 8.5e4, 7.0e4],
        kwargs=dict(method="log", mask_edges=True),
        expected=[271.80164362, 275.48088011, 281.01791239],
    ),
    "conservative_depth_depth": dict(
        coords={"z": [5, 25, 60], "zc": [0, 10, 50, 75]},
        positions={"center": "z", "outer": "zc"},
        data=("z", [1, 4, 0]),
        target=[0, 1, 10, 50, 80],
        kwargs=dict(method="conservative"),
        expected=[0.1, 0.9, 4.0, 0.0],
    ),
    "conservative_depth_dens_on_bounds": dict(
        coords={
            "depth": [5, 25, 60, 80, 100, 120],
            "depth_bnds": [0, 10, 30, 70, 90, 110, 170],
        },
        positions={"center": "depth", "outer": "depth_bnds"},
        data=("depth", [1, 4, 6, 2, 0, -3]),
        target_data=(
            "depth_bnds", [1, 5, 10, 20, 24, 35, 37], "dens",
        ),
        target=[0, 5, 38],
        kwargs=dict(method="conservative"),
        expected=[1, 9],
    ),
    "conservative_depth_dens_missing_values_bottom": dict(
        coords={
            "depth": [5, 25, 60, 80, 100, 120],
            "depth_bnds": [0, 10, 30, 70, 90, 110, 170],
        },
        positions={"center": "depth", "outer": "depth_bnds"},
        data=("depth", [1, 4, 6, 2, 0, np.nan]),
        target_data=(
            "depth_bnds", [1, 5, 10, 20, 24, np.nan, np.nan], "dens",
        ),
        target=[0, 5, 38],
        kwargs=dict(method="conservative"),
        expected=[1, 12],
    ),
    "conservative_depth_dens_missing_values_top": dict(
        coords={
            "depth": [5, 25, 60, 80, 100, 120],
            "depth_bnds": [0, 10, 30, 70, 90, 110, 170],
        },
        positions={"center": "depth", "outer": "depth_bnds"},
        data=("depth", [np.nan, 4, 6, 2, 0, -3]),
        target_data=(
            "depth_bnds", [np.nan, np.nan, 10, 20, 24, 35, 37], "dens",
        ),
        target=[0, 5, 38],
        kwargs=dict(method="conservative"),
        expected=[np.nan, 9],
    ),
    "conservative_depth_temp_on_bounds": dict(
        coords={
            "depth": [5, 25, 60, 80, 100, 120],
            "depth_bnds": [0, 10, 30, 70, 90, 110, 170],
        },
        positions={"center": "depth", "outer": "depth_bnds"},
        data=("depth", [-3, 0, 2, 6, 4, 1]),
        target_data=("depth_bnds", [30, 25, 20, 15, 10, 5, 0], "temp"),
        target=[0, 5, 36],
        kwargs=dict(method="conservative"),
        expected=[1, 9],
    ),
    "conservative_depth_temp": dict(
        # reference test_transform.py:570 — target_data on centers:
        # auto-interped to the bounds with a warning (the reference marks
        # this "error: True" at the mid level but expects the high-level
        # Grid.transform to succeed via the auto-interp)
        coords={
            "depth": [5, 25, 60, 80, 100, 120],
            "depth_bnds": [0, 10, 30, 70, 90, 110, 170],
        },
        positions={"center": "depth", "outer": "depth_bnds"},
        data=("depth", [-3, 0, 2, 6, 4, 1]),
        target_data=("depth", [27.5, 22.5, 17.5, 12.5, 7.5, 2.5], "temp"),
        target=[0, 5, 36],
        kwargs=dict(method="conservative"),
        expected=[1, 9],
        warns="not located on the cell bounds",
    ),
    "conservative_depth_dens_equalvalues": dict(
        coords={"depth": [0, 20], "depth_bnds": [10, 30, 50]},
        positions={"center": "depth", "outer": "depth_bnds"},
        data=("depth", [100, 2210]),
        target_data=("depth_bnds", [2, 2, 1.9], "dens"),
        target=[1.9, 1.95, 3],
        kwargs=dict(method="conservative"),
        expected=[2210 / 2, 100 + 2210 / 2],
    ),
    "conservative_depth_dens_nonmono_edge": dict(
        coords={
            "depth": [10, 30, 50, 70, 90],
            "depth_bnds": [0, 20, 40, 60, 80, 100],
        },
        positions={"center": "depth", "outer": "depth_bnds"},
        data=("depth", [2200, 2600, 3000, 3400, 3800]),
        target_data=("depth_bnds", [1, 3, 5, 7, 5, 3], "dens"),
        target=[0, 2, 4, 6, 8],
        kwargs=dict(method="conservative"),
        expected=[1100.0, 4300.0, 6400.0, 3200.0],
    ),
    "conservative_depth_depth_rename": dict(
        # reference test_transform.py:445 — conservative with renamed dims
        # and explicit suffix
        coords={"depth": [5, 25, 60], "depth_bnds": [0, 10, 50, 75]},
        positions={"center": "depth", "outer": "depth_bnds"},
        data=("depth", [1, 4, 0]),
        target=("something", [0, 1, 10, 50, 80]),
        kwargs=dict(method="conservative", suffix="_test_suffix"),
        expected=[0.1, 0.9, 4.0, 0.0],
        out_name="data_test_suffix",
        expected_dims=("something",),
    ),
    "linear_reversed_target": dict(
        coords={"depth": [1, 2, 3], "depth_bnds": [0.5, 1.5, 2.5, 3.5]},
        positions={"center": "depth", "outer": "depth_bnds"},
        data=("depth", [10, 20, 30]),
        target_data=("depth", [2, 4, 6], "dens"),
        target=[6, 4, 2],
        kwargs=dict(method="linear"),
        expected=[30, 20, 10],
    ),
    "conservative_reversed_target": dict(
        coords={"depth": [1, 2, 3], "depth_bnds": [0.5, 1.5, 2.5, 3.5]},
        positions={"center": "depth", "outer": "depth_bnds"},
        data=("depth", [10, 20, 30]),
        target_data=("depth_bnds", [1, 3, 5, 7], "dens"),
        target=[7, 5, 3, 1],
        kwargs=dict(method="conservative"),
        expected=[30, 20, 10],
    ),
}


@pytest.mark.parametrize("name", list(CASES))
def test_transform_case(name):
    case = CASES[name]
    coords = {
        k: (k, np.asarray(v, dtype=float)) for k, v in case["coords"].items()
    }
    ds = Dataset(coords=coords)
    grid = Grid(
        ds,
        coords={"Z": case["positions"]},
        periodic=False,
        autoparse_metadata=False,
    )
    dim, values = case["data"]
    da = GriddedArray(np.asarray(values, dtype=float), (dim,), name="data")

    kwargs = dict(case["kwargs"])
    if "target_data" in case:
        tdim, tvals, tname = case["target_data"]
        kwargs["target_data"] = GriddedArray(
            np.asarray(tvals, dtype=float), (tdim,), name=tname
        )

    target = case["target"]
    if isinstance(target, tuple):
        tdims, tvals = target
        if isinstance(tdims, str):
            tdims = (tdims,)
        target = GriddedArray(
            np.asarray(tvals, dtype=float), tdims, name=tdims[-1]
        )
    else:
        target = np.asarray(target, dtype=float)

    if case.get("warns"):
        with pytest.warns(UserWarning, match=case["warns"]):
            out = grid.transform(da, "Z", target, **kwargs)
    else:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            out = grid.transform(da, "Z", target, **kwargs)

    result = np.asarray(out.data, dtype=float)
    expected = np.asarray(case["expected"], dtype=float)

    if case.get("out_name"):
        assert out.name == case["out_name"], out.name
    if case.get("expected_dims"):
        assert tuple(out.dims) == tuple(case["expected_dims"]), out.dims

    if case.get("mask_index"):
        for i in case["mask_index"]:
            i = tuple(i) if isinstance(i, (list, tuple)) else i
            assert np.isnan(result[i]), f"{name}: index {i} should be masked"
        keep = np.ones(expected.shape, bool)
        for i in case["mask_index"]:
            keep[tuple(i) if isinstance(i, (list, tuple)) else i] = False
        np.testing.assert_allclose(
            result[keep], expected[keep], rtol=1e-5, atol=1e-8
        )
    else:
        np.testing.assert_allclose(result, expected, rtol=1e-5, atol=1e-8)


def test_conservative_multidim_target_not_implemented():
    """Conservative + multidim target raises NotImplementedError through
    Grid.transform (reference test_transform.py:215 case +
    test_conservative_interp_error_if_multidim_target_dim :1072)."""
    ds = Dataset(coords={
        "z": ("z", np.array([5.0, 25.0, 60.0])),
        "zc": ("zc", np.array([0.0, 10.0, 50.0, 75.0])),
    })
    grid = Grid(
        ds,
        coords={"Z": {"center": "z", "outer": "zc"}},
        periodic=False,
        autoparse_metadata=False,
    )
    da = GriddedArray(np.array([1.0, 4.0, 0.0]), ("z",), name="data")
    target = GriddedArray(
        np.array([[0.0, 1, 10, 50, 80], [0, 5, 20, 30, 100]]),
        ("eta_rho", "s_w"),
        name="interface_depth_rho",
    )
    tdata = GriddedArray(
        np.array([0.0, 10.0, 50.0, 75.0]), ("zc",), name="zc"
    )
    with pytest.raises(NotImplementedError):
        grid.transform(
            da, "Z", target,
            target_data=tdata, target_dim="s_w", method="conservative",
        )


# The reference's high-level runner is named test_grid_transform
# (test_transform.py:1053-1068) and iterates "all cases except
# conservative multidim" — exactly what test_transform_case does over
# CASES.  Provide the exact reference name WITHOUT re-running the whole
# parametrized table (a plain alias made pytest collect and execute every
# case twice): one representative case proves the runner under that name,
# the full sweep lives in test_transform_case above.
def test_grid_transform():
    test_transform_case("linear_depth_temp")
