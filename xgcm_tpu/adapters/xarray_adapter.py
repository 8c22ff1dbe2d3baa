"""Optional xarray bridge.

The reference consumes/produces ``xarray`` objects everywhere; xgcm_tpu's
core is xarray-free (xarray is not a dependency), but when xarray is
installed this module converts ``xr.Dataset``/``xr.DataArray`` to and from
the native containers, including the coordinate-reattachment rules the
reference implements in ``grid_ufunc.py:1195-1266`` (grid coords on shifted
core dims; input coords preserved on non-core dims; first input wins).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import numpy as np

from ..core.dataarray import GriddedArray
from ..core.dataset import Dataset

try:
    import xarray as xr

    HAS_XARRAY = True
except ImportError:  # pragma: no cover - xarray not present in this image
    xr = None
    HAS_XARRAY = False

__all__ = [
    "HAS_XARRAY",
    "maybe_from_xarray",
    "as_native",
    "is_dataarray",
    "collect_xr_inputs",
    "reattach_coords",
    "dataset_from_xarray",
    "dataarray_from_xarray",
    "to_xarray",
    "dataset_to_xarray",
]


def is_dataarray(obj: Any) -> bool:
    """True iff `obj` is an ``xr.DataArray`` (False when xarray is absent)."""
    return HAS_XARRAY and isinstance(obj, xr.DataArray)


def collect_xr_inputs(args) -> tuple:
    """Scan raw op inputs (scalars or ``{axis: component}`` dicts, possibly
    nested in a sequence) for xarray DataArrays.

    Returns ``(return_xr, xr_args)``: whether the op should round-trip back
    to xarray (the reference's contract is xarray-in -> xarray-out), and the
    original DataArrays in argument order for the first-input-wins coord
    precedence of reference grid_ufunc.py:1204-1222."""
    if not HAS_XARRAY:
        return False, []
    xr_args = []
    return_xr = False
    for i, a in enumerate(args):
        vals = list(a.values()) if isinstance(a, dict) else [a]
        for v in vals:
            if isinstance(v, xr.DataArray):
                xr_args.append(v)
                if i == 0:
                    return_xr = True
    return return_xr, xr_args


def _grid_coord_to_xr(c) -> "xr.DataArray":
    return xr.DataArray(
        np.asarray(c.data), dims=c.dims, name=c.name, attrs=dict(c.attrs)
    )


def reattach_coords(
    result,
    grid,
    input_args=(),
    out_core_dim_names=frozenset(),
    keep_coords: bool = True,
    boundary_width=None,
    extra_coords: Optional[Dict[str, Any]] = None,
    skip_conflicting_sizes: bool = False,
):
    """Convert a native result back to an ``xr.DataArray``, applying the
    reference's coordinate-reattachment rules (grid_ufunc.py:1195-1266):

    - every grid-dataset coordinate whose dims are all present in the result
      is attached (padding/compute strips labels; the grid restores them);
    - coordinates carried on the ORIGINAL xarray inputs override those, for
      any coordinate living entirely on non-core (not position-shifted)
      dims — first input wins (GH #496 / #719);
    - ``keep_coords=False`` warns (DeprecationWarning, reference
      grid_ufunc.py:1252-1258) and drops non-dimension coordinates.

    ``extra_coords`` (name -> DataArray/values) are assigned last — used by
    ``transform`` to attach the target coordinate.  Dict results (vector
    ops) convert per component.
    """
    if not HAS_XARRAY:
        raise ImportError("xarray is not installed")
    if isinstance(result, dict):
        return {
            k: reattach_coords(
                v, grid, input_args, out_core_dim_names, keep_coords,
                boundary_width, extra_coords, skip_conflicting_sizes,
            )
            for k, v in result.items()
        }

    # np.asarray forces a device->host copy; wrapping the jax array as a
    # duck array would avoid it but behaves inconsistently across xarray
    # versions (and this image cannot test against real xarray), so the
    # xarray-out path deliberately pays the copy — it is an eager
    # convenience surface, not the jit hot path (native GriddedArray
    # results stay on device).
    res = xr.DataArray(
        np.asarray(result.data), dims=result.dims, name=result.name
    )

    # grid._ds coords whose dims all appear in the result.  (This "dims
    # all present" rule intentionally also exists in Grid.coords_for and
    # to_xarray — same contract, three call shapes; change all three
    # together.)  With ``skip_conflicting_sizes`` (the transform path),
    # coords whose SIZE no longer matches are excluded: transform's
    # auto-naming reuses the source dim NAME at the target's size, and
    # real xarray raises "conflicting sizes" if the stale full-length
    # grid coordinate is assigned onto it (the transformed dim's
    # coordinate comes from extra_coords instead).  Grid-ufunc callers
    # keep the raise — there a mismatch means the ufunc failed to trim
    # its padding, and the rewrap below adds that hint.
    def _sizes_ok(dims, shape):
        return not skip_conflicting_sizes or all(
            res.sizes[d] == s for d, s in zip(dims, shape)
        )

    all_matching = {
        name: _grid_coord_to_xr(c)
        for name, c in grid._ds.coords.items()
        if all(d in res.dims for d in c.dims)
        and _sizes_ok(c.dims, np.shape(c.data))
    }

    # input coords on entirely-non-core dims take precedence, first input wins
    input_coords: Dict[str, Any] = {}
    for arg in input_args:
        for coord, da_coord in arg.coords.items():
            if any(d in out_core_dim_names for d in da_coord.dims):
                continue
            input_coords.setdefault(coord, da_coord)
    for coord, da_coord in input_coords.items():
        if all(d in res.dims for d in da_coord.dims) and _sizes_ok(
            da_coord.dims, np.shape(da_coord.data)
        ):
            all_matching[coord] = da_coord

    try:
        res = res.assign_coords(all_matching)
    except ValueError as err:
        if boundary_width and str(err).startswith("conflicting sizes"):
            raise ValueError(
                f"{err} - does your grid ufunc correctly trim off the same "
                f"number of elements which were added by padding using "
                f"boundary_width={boundary_width}?"
            )
        raise

    if extra_coords:
        res = res.assign_coords(extra_coords)

    if not keep_coords:
        import warnings

        warnings.warn(
            "The keep_coords keyword argument is being deprecated - in "
            "future it will be removed entirely, and the behaviour will "
            "always be that currently given by keep_coords=True.",
            category=DeprecationWarning,
        )
        non_dim = [c for c in res.coords if c not in res.dims]
        res = res.drop_vars(non_dim)

    return res


def maybe_from_xarray(obj: Any) -> Optional[Dataset]:
    """Convert an xarray.Dataset if that's what we were given; else None."""
    if HAS_XARRAY and isinstance(obj, xr.Dataset):
        return dataset_from_xarray(obj)
    return None


def as_native(obj: Any) -> Any:
    """Convert an ``xarray.DataArray`` to :class:`GriddedArray`; return
    anything else unchanged.

    Op entry points call this so reference users can pass their xarray
    objects straight into ``grid.diff(da, ...)`` etc. (the reference
    consumes DataArrays everywhere — grid.py:603-706); when xarray is not
    installed this is a no-op isinstance miss."""
    if HAS_XARRAY and isinstance(obj, xr.DataArray):
        return dataarray_from_xarray(obj)
    return obj


def dataarray_from_xarray(da: "xr.DataArray") -> GriddedArray:
    return GriddedArray(
        np.asarray(da.data), tuple(da.dims), name=da.name, attrs=dict(da.attrs)
    )


def dataset_from_xarray(ds: "xr.Dataset") -> Dataset:
    coords = {name: dataarray_from_xarray(ds.coords[name]) for name in ds.coords}
    data_vars = {name: dataarray_from_xarray(ds[name]) for name in ds.data_vars}
    return Dataset(
        coords=coords, data_vars=data_vars, dims=dict(ds.sizes), attrs=dict(ds.attrs)
    )


def to_xarray(garr, grid=None) -> "Union[xr.DataArray, Dict[str, xr.DataArray]]":
    """Convert a GriddedArray back to xarray, attaching every grid dataset
    coordinate whose dims are fully present in the result (the reattachment
    rule of reference grid_ufunc.py:1224-1241).  Dicts (vector-op results)
    convert per component and return a dict of DataArrays."""
    if not HAS_XARRAY:
        raise ImportError("xarray is not installed")
    if isinstance(garr, dict):
        return {k: to_xarray(v, grid) for k, v in garr.items()}
    out = xr.DataArray(np.asarray(garr.data), dims=garr.dims, name=garr.name)
    if grid is not None:
        matching = {
            name: (c.dims, np.asarray(c.data))
            for name, c in grid._ds.coords.items()
            if all(d in out.dims for d in c.dims)
        }
        out = out.assign_coords(
            {k: xr.DataArray(v[1], dims=v[0]) for k, v in matching.items()}
        )
    return out


def dataset_to_xarray(ds: Dataset) -> "xr.Dataset":
    """Convert a native Dataset back to an ``xr.Dataset`` (inverse of
    :func:`dataset_from_xarray`; variable/coord attrs round-trip)."""
    if not HAS_XARRAY:
        raise ImportError("xarray is not installed")

    def tup(v):
        return (v.dims, np.asarray(v.data), dict(v.attrs))

    return xr.Dataset(
        {k: tup(v) for k, v in ds.data_vars.items()},
        coords={k: tup(v) for k, v in ds.coords.items()},
        attrs=dict(ds.attrs),
    )
