"""Generic sharded execution of grid ufuncs: shard_map around the engine.

This is the full TPU-native analog of the reference's ``map_overlap``
machinery (reference ``grid_ufunc.py:990-1092``), which could parallelise
*any* grid ufunc over chunked core dims at its declared ``boundary_width``.
Here the same generality comes from running the ordinary single-device
engine (:func:`xgcm_tpu.apply_as_grid_ufunc`) *inside* ``shard_map`` against
a grid whose sharded dims carry local (per-shard) sizes, with the padding
step swapped for :func:`~xgcm_tpu.parallel.halo.ring_halo_pad` — a
``ppermute`` neighbour exchange over the ICI ring — on the mesh-mapped core
dims.  Non-sharded core dims keep the normal local boundary padding, so
mixed layouts (e.g. X sharded, Y replicated) work transparently.

Restrictions mirror the reference's overlap rules
(``grid_ufunc.py:1069-1092``): positions on a *sharded* axis must be
length-preserving (center/left/right — inner/outer change the array length
and would break the uniform-shard invariant), and ``pad_before_func=False``
ops (cumsum-style) are excluded — use
:func:`~xgcm_tpu.parallel.halo.sharded_cumsum`, which parallelises the
prefix sum the reference could not chunk at all.  Face-connected grids route
through :mod:`~xgcm_tpu.parallel.face_sharded` instead.
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional, Sequence, Tuple, Union

import numpy as np

from jax import shard_map
from jax.sharding import Mesh

from ..core.dataarray import GriddedArray
from ..core.dataset import Dataset
from ..core.grid import Grid
from ..core.grid_ufunc import (
    _identify_dummy_axes_with_real_axes,
    _maybe_unpack_vector_component,
    apply_as_grid_ufunc,
)
from ..core.padding import pad
from ..core.signature import GridUFuncSignature
from .halo import ring_halo_pad
from .mesh import partition_spec

__all__ = ["sharded_apply_as_grid_ufunc"]

_LENGTH_PRESERVING = {"center", "left", "right"}


def _sharded_axes_of(
    grid: Grid, dim_to_mesh_axis: Mapping[str, str]
) -> Mapping[str, str]:
    """Map grid-axis name -> mesh axis, for axes with any mesh-mapped dim.

    All of an axis's position dims ride the same mesh axis (they are
    congruent modulo the ±1 of inner/outer); conflicting mappings error.
    """
    out = {}
    for name, ax in grid.axes.items():
        mesh_axes = {
            dim_to_mesh_axis[d]
            for d in ax.coords.values()
            if dim_to_mesh_axis.get(d) is not None
        }
        if len(mesh_axes) > 1:
            raise ValueError(
                f"dims of axis {name!r} map to multiple mesh axes: "
                f"{sorted(mesh_axes)}"
            )
        if mesh_axes:
            out[name] = mesh_axes.pop()
    return out


def _local_grid(grid: Grid, mesh: Mesh, axis_to_mesh_axis) -> Grid:
    """A Grid whose sharded axes carry per-shard (local) dim sizes.

    Only length-preserving positions are kept on sharded axes.  Coordinate
    *values* are irrelevant inside the kernel (GriddedArray is label-free);
    only dim sizes matter for the engine's bookkeeping and output checks.
    """
    coords_spec = {}
    ds_coords = {}
    boundary = {}
    fill_value = {}
    default_shifts = {}
    for name, ax in grid.axes.items():
        mesh_axis = axis_to_mesh_axis.get(name)
        pos_map = {}
        for pos, dim in ax.coords.items():
            size = grid._ds.dims[dim]
            if mesh_axis is not None:
                if pos not in _LENGTH_PRESERVING:
                    continue
                k = mesh.shape[mesh_axis]
                if size % k != 0:
                    raise ValueError(
                        f"dim {dim!r} (size {size}) does not divide evenly "
                        f"over mesh axis {mesh_axis!r} (size {k})"
                    )
                size = size // k
            pos_map[pos] = dim
            ds_coords[dim] = np.arange(size, dtype=np.float64)
        coords_spec[name] = pos_map
        boundary[name] = ax.boundary
        fill_value[name] = ax.fill_value
        default_shifts[name] = dict(ax.default_shifts)
    ds = Dataset(coords={d: (d, v) for d, v in ds_coords.items()})
    return Grid(
        ds,
        coords=coords_spec,
        boundary=boundary,
        fill_value=fill_value,
        default_shifts=default_shifts,
        autoparse_metadata=False,
    )


def _output_dims(arg_dims, in_core_dims, out_core_dims, sig):
    """Output dim tuples, mirroring the engine's broadcast + core-dim
    placement and input-dim-order restoration (core/grid_ufunc.py:_apply +
    _restore_input_dim_order).  Pure dim bookkeeping; kept in lockstep with
    the engine by the sharded==single-device equivalence tests."""
    broadcast_dims = []
    for dims, cdims in zip(arg_dims, in_core_dims):
        for d in dims:
            if d not in cdims and d not in broadcast_dims:
                broadcast_dims.append(d)
    dummy_to_in = {
        ax: dim
        for arg_axes, arg_dims_ in zip(sig.in_ax_names, in_core_dims)
        for ax, dim in zip(arg_axes, arg_dims_)
    }
    dummy_to_out = {
        ax: dim
        for arg_axes, arg_dims_ in zip(sig.out_ax_names, out_core_dims)
        for ax, dim in zip(arg_axes, arg_dims_)
    }
    rename = {
        dummy_to_in[ax]: dummy_to_out[ax]
        for ax in dummy_to_in
        if ax in dummy_to_out
    }
    reference_order = []
    for dims in arg_dims:
        for d in dims:
            d = rename.get(d, d)
            if d not in reference_order:
                reference_order.append(d)
    outs = []
    for cdims in out_core_dims:
        dims = list(broadcast_dims) + list(cdims)
        order = [d for d in reference_order if d in dims] + [
            d for d in dims if d not in reference_order
        ]
        outs.append(tuple(order))
    return outs


def sharded_apply_as_grid_ufunc(
    func: Callable,
    *args,
    axis: Sequence[Sequence[str]],
    grid: Grid,
    signature: Union[str, GridUFuncSignature],
    mesh: Mesh,
    dim_to_mesh_axis: Mapping[str, str],
    boundary_width: Optional[Mapping[str, Tuple[int, int]]] = None,
    boundary=None,
    fill_value=None,
    pad_before_func: bool = True,
    other_component=None,
    **kwargs,
):
    """Apply any grid ufunc with mesh-mapped core dims, exchanging halos
    of the declared ``boundary_width`` with ``ppermute``.

    Equals the single-device :func:`xgcm_tpu.apply_as_grid_ufunc` result;
    see module docstring for the restrictions.
    """
    if grid._face_connections is not None:
        raise NotImplementedError(
            "generic sharded grid ufuncs do not support face-connected "
            "grids; use xgcm_tpu.parallel.face_sharded"
        )
    if not pad_before_func:
        raise NotImplementedError(
            "pad_before_func=False (cumsum-style) ops cannot use halo "
            "exchange; use sharded_cumsum"
        )
    _ocs = other_component if isinstance(other_component, Sequence) else [
        other_component
    ]
    if any(oc is not None for oc in _ocs):
        # other_component only affects face-connection sign rules, which this
        # route excludes; forbid rather than silently closing global arrays
        # over the shard_map body
        raise NotImplementedError(
            "other_component is only meaningful on face-connected grids; "
            "use xgcm_tpu.parallel.face_sharded"
        )
    other_component = None

    sig = (
        signature
        if isinstance(signature, GridUFuncSignature)
        else GridUFuncSignature.from_string(signature)
    )
    if isinstance(axis, str):
        axis = [(axis,)]
    args = list(args)
    arg_arrays = [_maybe_unpack_vector_component(a) for a in args]

    dummy_to_real = _identify_dummy_axes_with_real_axes(sig.in_ax_names, axis)
    out_ax_names = [[dummy_to_real[ax] for ax in arg] for arg in sig.out_ax_names]

    axis_to_mesh_axis = _sharded_axes_of(grid, dim_to_mesh_axis)

    # positions on a sharded axis must be length-preserving (the analog of
    # reference grid_ufunc.py:1069-1092's DISALLOWED_OVERLAP_POSITIONS);
    # checked before any coords lookup so a missing inner/outer coord still
    # reports the real restriction
    for arg_ns, arg_ps in zip(
        list(axis) + out_ax_names,
        list(sig.in_ax_positions) + list(sig.out_ax_positions),
    ):
        for n, p in zip(arg_ns, arg_ps):
            if n in axis_to_mesh_axis and p not in _LENGTH_PRESERVING:
                raise NotImplementedError(
                    f"cannot shard along axis {n!r}: position {p!r} changes "
                    f"the array length (only center/left/right positions "
                    f"are shardable, like the reference's map_overlap "
                    f"restriction)"
                )

    in_core_dims = [
        [grid.axes[n].coords[p] for n, p in zip(arg_ns, arg_ps)]
        for arg_ns, arg_ps in zip(axis, sig.in_ax_positions)
    ]
    out_core_dims = [
        [grid.axes[n].coords[p] for n, p in zip(arg_ns, arg_ps)]
        for arg_ns, arg_ps in zip(out_ax_names, sig.out_ax_positions)
    ]

    # resolve boundary / fill_value per axis once, against the REAL grid's
    # defaults, so the local grid's defaults never matter
    bc = grid._complete_user_kwargs_using_axis_defaults(boundary, "boundary")
    fv = grid._complete_user_kwargs_using_axis_defaults(fill_value, "fill_value")

    local_grid = _local_grid(grid, mesh, axis_to_mesh_axis)
    sharded_dims = {
        dim: axis_to_mesh_axis[name]
        for name, ax in grid.axes.items()
        if name in axis_to_mesh_axis
        for dim in ax.coords.values()
    }
    # non-core dims (e.g. batch) keep whatever mesh mapping the caller gave
    full_map = {**dict(dim_to_mesh_axis), **sharded_dims}

    in_specs = tuple(partition_spec(a.dims, full_map) for a in arg_arrays)
    out_dims = _output_dims(
        [a.dims for a in arg_arrays], in_core_dims, out_core_dims, sig
    )
    out_specs = tuple(partition_spec(dims, full_map) for dims in out_dims)
    single_out = len(out_dims) == 1

    def _ring_pad_fn(a, grid, boundary_width, boundary, fill_value,
                     other_component=None):
        """Engine pad hook: local pad for unsharded axes, ppermute halos
        for sharded ones (order is commutative for pointwise BC modes)."""
        da = _maybe_unpack_vector_component(a)
        local_bw = {
            n: w for n, w in boundary_width.items()
            if n not in axis_to_mesh_axis
        }
        if any(w != (0, 0) for w in local_bw.values()):
            da = pad(
                da, grid=grid, boundary_width=local_bw, boundary=boundary,
                fill_value=fill_value, other_component=other_component,
            )
        for n, w in boundary_width.items():
            if n not in axis_to_mesh_axis or w == (0, 0):
                continue
            dim = grid.axes[n]._get_position_name(da)[1]
            da = da.with_data(
                ring_halo_pad(
                    da.data, da.get_axis_num(dim), w,
                    axis_to_mesh_axis[n], bc[n], float(fv[n]),
                )
            )
        return da

    def local(*raw):
        local_args = []
        for r, a, arr in zip(raw, args, arg_arrays):
            ga = GriddedArray(r, arr.dims, name=arr.name)
            if isinstance(a, dict):
                [key] = list(a.keys())
                ga = {key: ga}
            local_args.append(ga)
        res = apply_as_grid_ufunc(
            func,
            *local_args,
            axis=axis,
            grid=local_grid,
            signature=sig,
            boundary_width=boundary_width,
            boundary=bc,
            fill_value=fv,
            pad_before_func=pad_before_func,
            other_component=other_component,
            _pad_fn=_ring_pad_fn,
            **kwargs,
        )
        if single_out:
            res = (res,)
        # fixed output order for the out_specs computed above
        return tuple(
            r.transpose(*dims).data for r, dims in zip(res, out_dims)
        )

    f = shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    raw_out = f(*(a.data for a in arg_arrays))
    name = arg_arrays[0].name
    results = tuple(
        GriddedArray(r, dims, name=name) for r, dims in zip(raw_out, out_dims)
    )
    return results[0] if single_out else results
