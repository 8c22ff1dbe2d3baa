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
    "dataset_from_xarray",
    "dataarray_from_xarray",
    "to_xarray",
    "dataset_to_xarray",
]


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
