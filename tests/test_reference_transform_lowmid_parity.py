"""Low- and mid-level transform tests ported by exact reference name
(/root/reference/xgcm/test/test_transform.py:850-1050 "Low level tests" /
"Mid level tests", plus the high-level multidim/chunking names
:1086-1365), so the name parity covers the reference's layered transform
test strategy (its module docstring: low = kernels vs np.interp/manual
sums, mid = named-dim wrappers, high = Grid.transform case table).

The reference's numba kernels are Pallas/XLA kernels here
(xgcm_tpu/ops/transform.py, ops/pallas_transform.py); the dask client
matrix (no_client/threaded/processes/distributed) maps onto execution
modes {eager, jit, 8-device sharded} — the TPU analog of SURVEY.md §4's
"multi-node without a real cluster" strategy.

Strict improvements, noted per test:

- ``test_grid_transform_multidim`` runs the broadcast case on an 8-device
  mesh (the distributed_client analog) and under jit.
- ``test_chunking_dim_error``: the reference *errors* when the transform
  dim is dask-chunked (transform.py:376-379 can't apply_ufunc over a
  chunked core dim); sharding the transform dim here just works under
  GSPMD, so the test asserts correctness instead of an error.
"""

import jax
import numpy as np
import pytest
import warnings

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.ops.transform import (
    conservative_interpolation,
    interp_1d_conservative,
    interp_1d_linear,
    linear_interpolation,
)
from xgcm_tpu.parallel import make_mesh, shard_gridded

from .test_transform_cases import CASES

"""Low level tests"""


def test_interp_1d_linear():
    nz, nx = 100, 1000
    z_vertex = np.linspace(0, 1, nz + 1)
    z = 0.5 * (z_vertex[:-1] + z_vertex[1:])
    x = 2 * np.pi * np.linspace(0, 1, nx)
    # uniformly stratified scalar
    theta = z + 0.1 * np.cos(3 * x)[:, None]
    # the scalar to interpolate
    phi = np.sin(theta) + 0.1 * np.cos(5 * x)[:, None]
    target_theta_levels = np.arange(0.2, 0.9, 0.025)
    phi_at_theta_expected = np.sin(target_theta_levels) + 0.1 * np.cos(5 * x)[
        :, None
    ]

    # the action
    phi_at_theta = interp_1d_linear(
        phi, theta, target_theta_levels, mask_edges=False
    )
    np.testing.assert_allclose(
        np.asarray(phi_at_theta), phi_at_theta_expected, rtol=1e-4
    )


def test_interp_1d_conservative():
    nz = 30
    dz = 10 + np.linspace(0, 90, nz - 1)
    z = np.concatenate([[0], np.cumsum(dz)])
    H = z.max()
    theta = z / H + 0.2 * np.cos(np.pi * z / H)

    nbins = 100
    theta_bins = np.linspace(theta.min() - 0.1, theta.max() + 0.1, nbins)

    # lazy way to check that it vectorizes: just copy the 1d array
    nx = 5
    dz_2d = np.tile(dz, (nx, 1))
    theta_2d = np.tile(theta, (nx, 1))

    dz_theta = interp_1d_conservative(dz_2d, theta_2d, theta_bins)

    np.testing.assert_allclose(
        np.nansum(np.asarray(dz_theta), axis=-1), np.nansum(dz, axis=-1)
    )


def test_interp_1d_conservative_nans_in_data():
    """We want the algorithm to ignore nans in the data, and preserve
    the integral of the non-nan values. Basically a transform to a single
    cell should always return the sum of all values along the transform
    axis."""
    phi = np.array([1, 2, np.nan])
    theta = np.array([30.0, 40, 50, 60])
    target = np.array([30.0, 50])

    out = interp_1d_conservative(phi, theta, target)
    np.testing.assert_allclose(np.nansum(phi), np.asarray(out))


def test_conservative_nonmonotonic_target_error():
    nz = 30
    dz = 10 + np.linspace(0, 90, nz - 1)
    z = np.concatenate([[0], np.cumsum(dz)])
    H = z.max()
    theta = z / H + 0.2 * np.cos(np.pi * z / H)

    theta_bins = np.array([0.0, -2, 4])

    nx = 5
    dz_2d = np.tile(dz, (nx, 1))
    theta_2d = np.tile(theta, (nx, 1))
    with pytest.raises(ValueError):
        _ = interp_1d_conservative(dz_2d, theta_2d, theta_bins)


"""Mid level tests"""


def _case_arrays(name):
    """Build (source, theta, target, kwargs, expected) GriddedArrays from the
    shared CASES table (the reference's construct_test_source_data analog)."""
    case = CASES[name]
    dim, values = case["data"]
    source = GriddedArray(np.asarray(values, float), (dim,), name="data")
    if "target_data" in case:
        tdim, tvals, tname = case["target_data"]
        theta = GriddedArray(np.asarray(tvals, float), (tdim,), name=tname)
    else:
        # no explicit tracer: the vertical coordinate itself is the target
        # data — on the bounds for conservative (reference test_transform.py
        # mid-level: `target_data = source[bounds_dim]`), on centers for
        # linear (`source[source_dim]`)
        if case["kwargs"].get("method") == "conservative":
            theta_dim = case["positions"]["outer"]
        else:
            theta_dim = dim
        theta = GriddedArray(
            np.asarray(case["coords"][theta_dim], float),
            (theta_dim,),
            name=theta_dim,
        )
    target = case["target"]
    if isinstance(target, tuple):
        tgt_dims, tvals = target
        if isinstance(tgt_dims, str):
            tgt_dims = (tgt_dims,)
        target = GriddedArray(np.asarray(tvals, float), tgt_dims, name=tgt_dims[-1])
    else:
        target = GriddedArray(
            np.asarray(target, float), (theta.name,), name=theta.name
        )
    return case, source, theta, target


def test_linear_interpolation_target_value_error():
    """linear_interpolation/conservative_interpolation throw when `target`
    is a bare np array (reference test_transform.py:952-974)."""
    _, source, theta, _ = _case_arrays("linear_depth_depth")
    with pytest.raises(ValueError):
        _ = linear_interpolation(
            source, theta, np.array([0.0, 7, 30]), "z", "z", "z"
        )

    _, source_c, theta_c, _ = _case_arrays("conservative_depth_depth")
    with pytest.raises(ValueError):
        _ = conservative_interpolation(
            source_c, theta_c, np.array([0.0, 7, 30]), "depth", "depth_bnds", "z"
        )


_MID_LINEAR = [
    "linear_depth_depth",
    "linear_depth_depth_nomask",
    "linear_depth_depth_renamed",
    "linear_depth_dens",
    "linear_depth_temp",
    "linear_depth_negative_dens",
    "linear_reversed_target",
]


@pytest.mark.parametrize("name", _MID_LINEAR)
def test_mid_level_linear(name):
    """Test the linear interpolations on the named-dim wrapper level."""
    case, source, theta, target = _case_arrays(name)
    kwargs = dict(case["kwargs"])
    kwargs.pop("method")
    suffix = kwargs.pop("suffix", "")
    output_name = "data" + suffix

    interpolated = linear_interpolation(
        source,
        theta,
        target,
        source.dims[0],
        theta.dims[0],
        target.dims[0],
        suffix=suffix,
        **kwargs,
    )
    expected = np.asarray(case["expected"], float)
    result = np.asarray(interpolated.data, float)
    if case.get("mask_index"):
        for i in case["mask_index"]:
            assert np.isnan(result[i])
        keep = np.ones(expected.shape, bool)
        for i in case["mask_index"]:
            keep[i] = False
        np.testing.assert_allclose(result[keep], expected[keep], rtol=1e-5)
    else:
        np.testing.assert_allclose(result, expected, rtol=1e-5)
    assert interpolated.name == output_name


_MID_CONSERVATIVE = [
    "conservative_depth_depth",
    "conservative_depth_temp_on_bounds",
    "conservative_depth_dens_equalvalues",
    "conservative_depth_depth_rename",
    "conservative_reversed_target",
]


@pytest.mark.parametrize("name", _MID_CONSERVATIVE)
def test_mid_level_conservative(name):
    """Test the conservative interpolations on the named-dim wrapper level."""
    case, source, theta, target = _case_arrays(name)
    kwargs = dict(case["kwargs"])
    kwargs.pop("method")
    suffix = kwargs.pop("suffix", "")
    output_name = "data" + suffix
    assert not kwargs, f"unconsumed case kwargs {kwargs}"

    transformed = conservative_interpolation(
        source,
        theta,
        target,
        source.dims[0],
        theta.dims[0],
        target.dims[0],
        suffix=suffix,
    )
    expected = np.asarray(case["expected"], float)
    np.testing.assert_allclose(
        np.asarray(transformed.data, float), expected, rtol=1e-5
    )
    # make sure that the extensive quantity is actually conserved whenever
    # the case's target bins span the full tracer range
    if np.isclose(np.nansum(expected), np.nansum(np.asarray(source.data))):
        np.testing.assert_allclose(
            np.nansum(np.asarray(transformed.data)),
            np.nansum(np.asarray(source.data)),
            rtol=1e-12,
        )
    assert transformed.name == output_name


"""High level tests (multidim / warnings / chunking analogs)"""


def _grid_for(case):
    coords = {k: (k, np.asarray(v, float)) for k, v in case["coords"].items()}
    ds = Dataset(coords=coords)
    return Grid(
        ds,
        coords={"Z": case["positions"]},
        periodic=False,
        autoparse_metadata=False,
    )


def test_conservative_interp_warn_if_no_cell_bounds():
    case, source, theta, target = _case_arrays("conservative_depth_temp")
    grid = _grid_for(case)
    with pytest.warns(
        UserWarning,
        match=(
            "The `target data` input is not located on the cell bounds. "
            "This method will continue with linear interpolation with "
            "repeated boundary values."
        ),
    ):
        _ = grid.transform(
            source, "Z", target, target_data=theta, method="conservative"
        )


def test_grid_transform_noname_targetdata():
    """Check handling of a `target_data` input without name."""
    case, source, theta, _ = _case_arrays("linear_depth_dens")
    grid = _grid_for(case)
    theta = GriddedArray(theta.data, theta.dims, name=None)
    # the name of target_data is only used if `target` is a numpy array
    target = np.asarray(case["target"], float)

    with pytest.warns(UserWarning):
        transformed = grid.transform(
            source, "Z", target, target_data=theta, method="linear",
            mask_edges=False,
        )
    assert "TRANSFORMED_DIMENSION" in transformed.dims


_CLIENTS = ["no_client", "jit_client", "sharded_client"]


@pytest.mark.parametrize("client", _CLIENTS)
@pytest.mark.parametrize(
    "name", ["linear_depth_dens", "conservative_depth_depth"]
)
def test_grid_transform_multidim(client, name):
    """Broadcast the 1d column against another dim and make sure the 1d
    results are still valid — under eager, jit, and 8-device-sharded
    execution (the reference's dask client matrix, test_transform.py:1243-1293)."""
    case, source, theta, target = _case_arrays(name)
    grid = _grid_for(case)
    kwargs = dict(case["kwargs"])
    method = kwargs.pop("method")

    na = 8
    src2 = GriddedArray(
        np.broadcast_to(
            np.asarray(source.data), (na,) + np.shape(source.data)
        ).copy(),
        ("a",) + tuple(source.dims),
        name="data",
    )

    expected = np.asarray(case["expected"], float)

    def run(x):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            return grid.transform(
                GriddedArray(x, src2.dims, name="data"),
                "Z",
                target,
                target_data=theta,
                method=method,
                **kwargs,
            ).data

    if client == "no_client":
        out = run(src2.data)
    elif client == "jit_client":
        out = jax.jit(run)(src2.data)
    else:
        mesh = make_mesh({"b": 8})
        sharded = shard_gridded(src2, mesh, {"a": "b"})
        out = jax.jit(run)(sharded.data)

    out = np.asarray(out, float)
    assert out.shape == (na,) + expected.shape
    for i in range(na):
        np.testing.assert_allclose(out[i], expected, rtol=1e-5)


@pytest.mark.parametrize("client", _CLIENTS)
def test_grid_transform_multidim_with_target_dim(client):
    """A vertical target coordinate that is spatially varying (2D target
    with explicit target_dim), under all three execution modes."""
    case, source, theta, target = _case_arrays(
        "linear_depth_depth_nomask_multidim_target"
    )
    grid = _grid_for(case)
    kwargs = dict(case["kwargs"])
    kwargs.pop("method")

    def run(x):
        return grid.transform(
            GriddedArray(x, source.dims, name="data"),
            "Z",
            target,
            target_data=theta,
            method="linear",
            **kwargs,
        ).data

    if client == "no_client":
        out = run(source.data)
    elif client == "jit_client":
        out = jax.jit(run)(source.data)
    else:
        mesh = make_mesh({"b": 2})
        # shard the target's eta_rho dim instead (the source is 1D here)
        tgt_sharded = shard_gridded(target, mesh, {"eta_rho": "b"})

        def run_t(x, t):
            return grid.transform(
                GriddedArray(x, source.dims, name="data"),
                "Z",
                GriddedArray(t, target.dims, name=target.name),
                target_data=theta,
                method="linear",
                **kwargs,
            ).data

        out = jax.jit(run_t)(source.data, tgt_sharded.data)

    np.testing.assert_allclose(
        np.asarray(out, float), np.asarray(case["expected"], float), rtol=1e-5
    )


def test_grid_transform_multidim_other_dims_error():
    """target_data carrying a dim the source does not share (e.g. tracer on
    a different x grid than velocity) must raise."""
    case, source, theta, target = _case_arrays("linear_depth_dens")
    grid = _grid_for(case)

    na = 3
    src2 = GriddedArray(
        np.broadcast_to(np.asarray(source.data), (na,) + np.shape(source.data)).copy(),
        ("a",) + tuple(source.dims),
        name="data",
    )
    theta2 = GriddedArray(
        np.broadcast_to(np.asarray(theta.data), (na,) + np.shape(theta.data)).copy(),
        ("a_other",) + tuple(theta.dims),
        name=theta.name,
    )

    with pytest.raises(ValueError):
        _ = grid.transform(
            src2, "Z", target, target_data=theta2, method="linear",
            mask_edges=False,
        )


def test_chunking_dim_error():
    """The reference ERRORS when the transform ('vertical') dim is
    dask-chunked (test_transform.py:1347-1364); sharding the transform dim
    over a mesh works here under GSPMD — assert correctness, not an error."""
    case, source, theta, target = _case_arrays("linear_depth_dens")
    grid = _grid_for(case)

    mesh = make_mesh({"z": 2}, devices=jax.devices()[:2])
    sharded = shard_gridded(source, mesh, {"depth": "z"})

    def run(x):
        return grid.transform(
            GriddedArray(x, source.dims, name="data"),
            "Z",
            target,
            target_data=theta,
            method="linear",
            mask_edges=False,
        ).data

    out = jax.jit(run)(sharded.data)
    np.testing.assert_allclose(
        np.asarray(out, float), np.asarray(case["expected"], float), rtol=1e-5
    )
