"""Seeded randomized sweep over the xarray-adapter round-trip.

Both round-5 adapter defects (the ``conflicting sizes`` raise on
transform auto-naming, and the stale grid coordinate attached when the
target length equals the source) lived in the coordinate-reattachment
logic rather than the compute path, so this net fuzzes exactly that
corner: random ops / transforms driven through the duck-typed xarray
stub, values checked against the native path and coordinates checked
against the reference's reattachment rules (grid_ufunc.py:1195-1266,
transform.py:422-449):

* core-dim coordinates come from the grid (the shifted position's own
  coordinate values);
* input coordinates touching a core dim are dropped; input coordinates
  on entirely-non-core dims survive verbatim;
* transform attaches the TARGET values (bin midpoints for conservative)
  as the transformed dim's coordinate — including the auto-naming
  fallback where the source dim name is reused at ANY target length;
* no stale-size grid coordinate ever leaks onto a resized dim.

Seed ranges: 30000..30015 (ops) / 31000..31015 (transforms) per-commit
here; the extended campaign in ``test_fuzz_extended.py`` continues both
ranges disjointly (+100 trials each).
"""

import importlib
import sys

import numpy as np
import pytest

from xgcm_tpu import Grid

from . import fake_xarray

OPS = ["diff", "interp", "min", "max"]
BOUNDARIES = ["periodic", "fill", "extend"]


@pytest.fixture()
def xr():
    import xgcm_tpu.adapters.xarray_adapter as ad

    old = sys.modules.get("xarray")
    sys.modules["xarray"] = fake_xarray
    importlib.reload(ad)
    assert ad.HAS_XARRAY
    try:
        yield fake_xarray
    finally:
        if old is not None:
            sys.modules["xarray"] = old
        else:
            sys.modules.pop("xarray", None)
        importlib.reload(ad)


def _op_case(xr, rng, seed_note=""):
    """One random op through the stub; returns nothing, asserts inside."""
    from xgcm_tpu.adapters.xarray_adapter import dataarray_from_xarray

    n = int(rng.randint(5, 13))
    op = OPS[rng.randint(len(OPS))]
    to = ["center", "left"][rng.randint(2)]
    boundary = BOUNDARIES[rng.randint(len(BOUNDARIES))]
    n_extra = int(rng.randint(0, 3))
    extra_sizes = {f"e{i}": int(rng.randint(2, 5)) for i in range(n_extra)}

    xc_vals = np.arange(n) + rng.rand()
    xg_vals = np.arange(n) + rng.rand() - 0.5
    ds = xr.Dataset(
        coords={
            "xc": ("xc", xc_vals),
            "xg": ("xg", xg_vals),
            # a second (non-dim) grid coordinate on the core dim: must be
            # reattached from the GRID whenever its dim is in the result
            "xc2": ("xc", xc_vals * 2.0),
        }
    )
    grid = Grid(
        ds,
        coords={"X": {"center": "xc", "left": "xg"}},
        boundary=boundary,
        autoparse_metadata=False,
    )

    frm = ["center", "left"][rng.randint(2)]
    src_dim = {"center": "xc", "left": "xg"}[frm]
    to_dim = {"center": "xc", "left": "xg"}[to]
    if frm == to:
        to = "left" if frm == "center" else "center"
        to_dim = {"center": "xc", "left": "xg"}[to]

    dims = list(extra_sizes)
    core_pos = int(rng.randint(0, len(dims) + 1))
    dims.insert(core_pos, src_dim)
    shape = [extra_sizes.get(d, n) for d in dims]
    data = rng.randn(*shape)

    coords = {"on_core": (src_dim, rng.randn(n))}
    if n_extra:
        coords["on_extra"] = ("e0", rng.randn(extra_sizes["e0"]))
    da = xr.DataArray(data, dims=tuple(dims), name="q", coords=coords)

    out = getattr(grid, op)(da, "X", to=to, keep_coords=True)
    native = getattr(grid, op)(
        dataarray_from_xarray(da), "X", to=to
    )

    # values and dims match the native path exactly
    assert out.dims == native.dims, (seed_note, out.dims, native.dims)
    np.testing.assert_array_equal(
        np.asarray(out.data), np.asarray(native.data), err_msg=seed_note
    )

    # core-dim coordinates come from the grid
    np.testing.assert_array_equal(
        np.asarray(out.coords[to_dim].data),
        xg_vals if to_dim == "xg" else xc_vals,
        err_msg=seed_note,
    )
    if to_dim == "xc":
        np.testing.assert_array_equal(
            np.asarray(out.coords["xc2"].data), xc_vals * 2.0
        )
    else:
        assert "xc2" not in out.coords, seed_note
    # input coords touching the core dim are dropped; non-core survive
    assert "on_core" not in out.coords, seed_note
    if n_extra:
        np.testing.assert_array_equal(
            np.asarray(out.coords["on_extra"].data),
            np.asarray(coords["on_extra"][1]),
            err_msg=seed_note,
        )
    # every attached coordinate is size-consistent with the result
    for cname, cv in out.coords.items():
        for d, s in zip(cv.dims, np.shape(cv.data)):
            assert out.sizes[d] == s, (seed_note, cname)


def _transform_case(xr, rng, seed_note=""):
    from xgcm_tpu.adapters.xarray_adapter import dataarray_from_xarray

    nz = int(rng.randint(5, 11))
    method = ["linear", "conservative"][rng.randint(2)]
    named = bool(rng.randint(2))

    zc_vals = np.arange(nz) + 0.5
    zo_vals = np.arange(nz + 1) * 1.0
    ds = xr.Dataset(
        coords={"zc": ("zc", zc_vals), "zo": ("zo", zo_vals)}
    )
    grid = Grid(
        ds,
        coords={"Z": {"center": "zc", "outer": "zo"}},
        periodic=False,
        autoparse_metadata=False,
    )
    da = xr.DataArray(
        np.sort(rng.rand(nz)), dims=("zc",), name="temp",
        coords={"zlabel": ("zc", rng.randn(nz))},
    )

    # target length: deliberately include the same-length corner
    if method == "linear":
        m = [nz, int(rng.randint(3, nz + 3))][rng.randint(2)]
        target = np.sort(rng.rand(m)) * nz
    else:
        m = [nz + 1, int(rng.randint(3, nz + 3))][rng.randint(2)]
        target = np.linspace(0.0, nz, m)

    kwargs = {"method": method}
    if named:
        src = zo_vals if method == "conservative" else zc_vals
        kwargs["target_data"] = xr.DataArray(
            20.0 + 0.8 * src, dims=("zo" if method == "conservative" else "zc",),
            name="s",
        )
        target = 20.0 + 0.8 * target

    out = grid.transform(da, "Z", target, **kwargs)
    nkw = dict(kwargs)
    if "target_data" in nkw:
        nkw["target_data"] = dataarray_from_xarray(nkw["target_data"])
    native = grid.transform(dataarray_from_xarray(da), "Z", target, **nkw)

    assert out.dims == native.dims, (seed_note, out.dims, native.dims)
    np.testing.assert_array_equal(
        np.asarray(out.data), np.asarray(native.data), err_msg=seed_note
    )

    # the transformed dim carries the TARGET values (midpoints for
    # conservative), never a stale grid coordinate
    tdim = out.dims[-1]
    expected = target
    if method == "conservative":
        expected = 0.5 * (target[:-1] + target[1:])
    np.testing.assert_allclose(
        np.asarray(out.coords[tdim].data), expected, err_msg=seed_note
    )
    # input coords on the source core dim are dropped
    assert "zlabel" not in out.coords, seed_note
    for cname, cv in out.coords.items():
        for d, s in zip(cv.dims, np.shape(cv.data)):
            assert out.sizes[d] == s, (seed_note, cname)


@pytest.mark.parametrize("trial", range(15))
def test_random_op_roundtrip(xr, trial):
    rng = np.random.RandomState(30_000 + trial)
    _op_case(xr, rng, seed_note=f"seed {30_000 + trial}")


@pytest.mark.parametrize("trial", range(15))
def test_random_transform_roundtrip(xr, trial):
    rng = np.random.RandomState(31_000 + trial)
    _transform_case(xr, rng, seed_note=f"seed {31_000 + trial}")
