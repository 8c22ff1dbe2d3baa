"""Padding / halo construction.

This is the communication layer of the framework, replacing reference
``padding.py`` (the xarray ``pad``/``concat`` implementation).  On a single
device everything here is static ``jnp.pad`` / slicing / ``concatenate`` that
XLA fuses into the consuming stencil; on a sharded grid the same boundary
semantics are realised with collectives in :mod:`xgcm_tpu.parallel`.

Boundary-condition flags and their array realisation (reference
``padding.py:15-20``):

===========  =================  ===========================================
xgcm flag    jnp.pad mode       meaning
===========  =================  ===========================================
periodic     wrap               wrap around the axis
fill         constant           Dirichlet: constant ``fill_value`` outside
extend       edge               limited Neumann: repeat edge value
None         wrap               default resolves to periodic
===========  =================  ===========================================
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Dict, Mapping, Optional, Tuple, Union

import jax.numpy as jnp

from .dataarray import GriddedArray

if TYPE_CHECKING:
    from .grid import Grid

__all__ = ["pad", "BOUNDARY_TO_PAD_MODE"]

BOUNDARY_TO_PAD_MODE = {
    "periodic": "wrap",
    "fill": "constant",
    "extend": "edge",
    "extrapolate": "extrapolate",  # custom: linear from the two edge cells
    None: "wrap",
}


def _extrapolate_pad(data, axnum: int, widths: Tuple[int, int]):
    """Linear extrapolation padding: value at k cells beyond an edge is
    edge + k * (edge - next-inward)."""
    lw, rw = widths
    parts = []
    if lw:
        x0 = jnp.take(data, jnp.array([0]), axis=axnum)
        x1 = jnp.take(data, jnp.array([1]), axis=axnum)
        ks = jnp.arange(lw, 0, -1, dtype=data.dtype)
        shape = [1] * data.ndim
        shape[axnum] = lw
        ks = ks.reshape(shape)
        parts.append(x0 - ks * (x1 - x0))
    parts.append(data)
    if rw:
        n = data.shape[axnum]
        xn = jnp.take(data, jnp.array([n - 1]), axis=axnum)
        xm = jnp.take(data, jnp.array([n - 2]), axis=axnum)
        ks = jnp.arange(1, rw + 1, dtype=data.dtype)
        shape = [1] * data.ndim
        shape[axnum] = rw
        ks = ks.reshape(shape)
        parts.append(xn + ks * (xn - xm))
    return jnp.concatenate(parts, axis=axnum)


def _pad_basic(
    da: GriddedArray,
    grid: "Grid",
    padding_width: Dict[str, Tuple[int, int]],
    padding: Dict[str, Optional[str]],
    fill_value: Dict[str, float],
) -> GriddedArray:
    """Apply simple per-axis boundary padding (reference padding.py:338-360)."""
    data = da.data
    # jnp.pad supports a single mode per call; group axes by mode.
    by_mode: Dict[Tuple[str, float], list] = {}
    for ax_name, widths in padding_width.items():
        if widths == (0, 0):
            continue
        axis = grid.axes[ax_name]
        _, dim = axis._get_position_name(da)
        mode = BOUNDARY_TO_PAD_MODE[padding[ax_name]]
        fv = float(fill_value[ax_name]) if mode == "constant" else 0.0
        by_mode.setdefault((mode, fv), []).append((da.get_axis_num(dim), widths))

    for (mode, fv), axes_widths in by_mode.items():
        if mode == "extrapolate":
            for axnum, widths in axes_widths:
                data = _extrapolate_pad(data, axnum, widths)
            continue
        widths_arg = [(0, 0)] * data.ndim
        for axnum, widths in axes_widths:
            widths_arg[axnum] = widths
        if mode == "constant":
            data = jnp.pad(data, widths_arg, mode="constant", constant_values=fv)
        else:
            data = jnp.pad(data, widths_arg, mode=mode)

    return da.with_data(data)


# ---------------------------------------------------------------------------
# Face-connection halo assembly (reference padding.py:70-335).
#
# Semantics per connected edge, given connection = (source_face, source_axis,
# reverse):
#   * the halo strip is taken from the opposite edge of the source face
#     (same edge when reverse);
#   * if the connection crosses axes (source_axis != axis) the strip's dims
#     are swapped so the strip's long direction lies along the target's
#     tangential dim;
#   * reverse => flip along the orthogonal (halo-width) dim; if the padded
#     array is the vector component parallel to the padding axis, negate;
#   * axis swap without reverse => flip along the tangential dim; if the
#     padded array is the vector component NOT parallel to the padding axis,
#     negate.
# ---------------------------------------------------------------------------


def _swap_dim_names(da: GriddedArray, from_name: str, to_name: str) -> GriddedArray:
    """Swap two dim names (or plain rename if `to_name` absent) — reference
    padding.py:41-50."""
    if to_name in da.dims:
        da = da.rename_dims({to_name: to_name + "__tmp"})
        if from_name in da.dims:
            da = da.rename_dims({from_name: to_name})
        da = da.rename_dims({to_name + "__tmp": from_name})
    else:
        da = da.rename_dims({from_name: to_name})
    return da


def _rename_positions_like(
    grid: "Grid", source: GriddedArray, target: GriddedArray
) -> GriddedArray:
    """Rename source dims so grid positions line up with the target's dims
    (used when padding with the partner vector component across a swapped-axis
    connection — reference padding.py:23-38)."""
    rename = {}
    for di in target.dims:
        if di in source.dims:
            continue
        for axname, axis in grid.axes.items():
            all_dims = list(axis.coords.values())
            if di in all_dims:
                src_matches = [d for d in all_dims if d in source.dims]
                if src_matches:
                    rename[src_matches[0]] = di
    return source.rename_dims(rename)


def _pad_face_connections(
    da: Union[GriddedArray, Dict[str, GriddedArray]],
    grid: "Grid",
    padding_width: Dict[str, Tuple[int, int]],
    padding: Dict[str, Optional[str]],
    fill_value: Dict[str, float],
    other_component: Optional[Dict[str, GriddedArray]] = None,
) -> GriddedArray:
    facedim = grid._facedim
    connections = grid._face_connections
    if connections is None or facedim is None:
        raise ValueError("Grid has no face connections")

    if isinstance(da, dict):
        isvector = True
        (vectoraxis, da), = da.items()
        if other_component is None:
            raise ValueError(
                "Padding vector components requires `other_component` input."
            )
        (_, da_partner), = other_component.items()
    else:
        isvector = False
        da_partner = None

    # All axes that participate: those named in connections plus those the
    # caller asked to pad.
    conn_axes = sorted(
        {ax for face_links in connections[facedim].values() for ax in face_links}
    )
    pad_axes = sorted(set(conn_axes) | set(padding_width))
    padding_width = {ax: padding_width.get(ax, (0, 0)) for ax in pad_axes}

    # Pre-pad every face/axis to the max width with the basic BC, then replace
    # connected halos, then trim back (reference padding.py:113-142, 320-334).
    width = max(w for ws in padding_width.values() for w in ws)
    max_padding_width = {ax: (width, width) for ax in padding_width}

    da_prepadded = _pad_basic(da, grid, max_padding_width, padding, fill_value)
    partner_prepadded = (
        _pad_basic(da_partner, grid, max_padding_width, padding, fill_value)
        if isvector
        else None
    )

    n_faces = da.sizes[facedim]
    faces = []
    for i in range(n_faces):
        target_da = da_prepadded.isel({facedim: i})
        face_links = connections[facedim].get(i, {})
        for axname in pad_axes:
            left_conn, right_conn = face_links.get(axname, (None, None))
            _, target_dim = grid.axes[axname]._get_position_name(target_da)
            for connection, is_right in ((left_conn, False), (right_conn, True)):
                if width == 0 or not connection:
                    continue
                source_face, source_axis, reverse = connection
                swap_axis = axname != source_axis

                source_da = da_prepadded.isel({facedim: source_face})
                if isvector and swap_axis:
                    source_da = partner_prepadded.isel({facedim: source_face})
                    source_da = _rename_positions_like(grid, source_da, target_da)

                _, source_dim = grid.axes[source_axis]._get_position_name(source_da)

                # Strip selection (reference padding.py:201-225): take the
                # `width` interior columns adjacent to the relevant edge of
                # the source (skipping the source's own pre-padding).
                if is_right:
                    src_slc = (
                        slice(-2 * width, -width) if reverse else slice(width, 2 * width)
                    )
                    tgt_slc = slice(0, -width)
                else:
                    src_slc = (
                        slice(width, 2 * width) if reverse else slice(-2 * width, -width)
                    )
                    tgt_slc = slice(width, None)

                source_slice = source_da.isel({source_dim: src_slc})
                target_slice = target_da.isel({target_dim: tgt_slc})

                if swap_axis:
                    source_slice = _swap_dim_names(source_slice, source_dim, target_dim)
                ortho_dim = target_dim
                tangential_dim = source_dim

                if reverse:
                    source_slice = source_slice.flip(ortho_dim)
                    if isvector and vectoraxis == axname:
                        source_slice = -source_slice
                if swap_axis and not reverse:
                    source_slice = source_slice.flip(tangential_dim)
                    if isvector and vectoraxis != axname:
                        source_slice = -source_slice

                source_slice = source_slice.transpose(*target_slice.dims)

                if is_right:
                    parts = [target_slice, source_slice]
                else:
                    parts = [source_slice, target_slice]
                ax_num = target_slice.get_axis_num(target_dim)
                target_da = target_slice.with_data(
                    jnp.concatenate([p.data for p in parts], axis=ax_num)
                )
        faces.append(target_da)

    stacked = jnp.stack([f.data for f in faces], axis=da.get_axis_num(facedim))
    dims = list(faces[0].dims)
    dims.insert(da.get_axis_num(facedim), facedim)
    da_padded = GriddedArray(stacked, dims, name=da.name)

    # Trim the uniformly pre-padded array back to the requested widths.
    for axname in padding_width:
        _, dim = grid.axes[axname]._get_position_name(da_padded)
        start = max_padding_width[axname][0] - padding_width[axname][0]
        stop = max_padding_width[axname][1] - padding_width[axname][1]
        da_padded = da_padded.isel(
            {dim: slice(start, -stop if stop else None)}
        )
    return da_padded


def pad(
    data: Union[GriddedArray, Dict[str, GriddedArray]],
    grid: "Grid",
    boundary_width: Optional[Dict[str, Tuple[int, int]]],
    boundary: Optional[Union[str, Mapping[str, str]]] = None,
    fill_value: Optional[Union[float, Mapping[str, float]]] = None,
    other_component: Optional[Dict[str, GriddedArray]] = None,
) -> Union[GriddedArray, Dict[str, GriddedArray]]:
    """Pad array boundaries along grid axes (reference padding.py:363-454).

    Parameters
    ----------
    data :
        Array to pad.  A single-entry dict ``{axis_name: array}`` marks a
        vector component pointing along ``axis_name``.
    grid :
        Grid carrying per-axis boundary defaults and topology.
    boundary_width :
        ``{axis_name: (lower, upper)}`` halo widths.
    boundary, fill_value :
        Per-call overrides of the per-axis defaults (scalar or per-axis dict).
    other_component :
        The orthogonal vector component, required when padding a vector over
        swapped-axis face connections.
    """
    padding = grid._complete_user_kwargs_using_axis_defaults(boundary, "boundary")
    fill_values = grid._complete_user_kwargs_using_axis_defaults(
        fill_value, "fill_value"
    )

    if boundary_width is None or all(
        w == (0, 0) for w in boundary_width.values()
    ):
        return data

    if grid._face_connections is not None:
        return _pad_face_connections(
            data,
            grid,
            boundary_width,
            padding,
            fill_values,
            other_component=other_component,
        )

    if isinstance(data, dict):
        (data,) = list(data.values())
    return _pad_basic(data, grid, boundary_width, padding, fill_values)
