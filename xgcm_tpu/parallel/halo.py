"""Explicit halo exchange over a device mesh: shard_map + ppermute.

This is the TPU-native replacement for the reference's
``dask.array.map_overlap`` core-dim parallelism (reference
``grid_ufunc.py:990-1066``): the spatial dimension is sharded over a mesh
axis, each step exchanges a fixed-width halo with ring neighbours via
``jax.lax.ppermute`` (nearest-neighbour traffic that maps directly onto the
ICI ring), and the stencil kernel runs on the local block.

Global boundary conditions are applied only on the edge shards, selected
branchlessly by ``lax.axis_index``:

* periodic — nothing special: the ppermute ring *is* the periodic BC;
* fill     — edge shard overwrites its incoming halo with ``fill_value``;
* extend   — edge shard overwrites it with its own edge value.

Like the reference's map_overlap path (grid_ufunc.py:1069-1092), only
length-preserving position pairs (center/left/right) are supported when the
core dim is sharded; inner/outer change the array length and would break the
uniform-shard invariant.
"""

from __future__ import annotations

from typing import Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh
from jax import shard_map

from ..core.dataarray import GriddedArray
from ..core.grid import Grid
from .mesh import partition_spec

__all__ = ["ring_halo_pad", "sharded_op", "sharded_cumsum"]

def pad_axis_local_or_ring(x, axis, widths, mesh_axis, boundary, fill_value):
    """Halo-pad one positional axis of a local block: ppermute ring when
    the dim is mesh-mapped, otherwise the local (global-edge) boundary
    condition.  The single home for this dispatch — used by the fused
    sharded diagnostics; the generic sharded engine routes its LOCAL pads
    through the full core/padding engine instead (richer BC semantics) and
    shares only ring_halo_pad with this helper."""
    from ..core.padding import BOUNDARY_TO_PAD_MODE, _extrapolate_pad

    if widths == (0, 0):
        return x
    if mesh_axis is not None:
        return ring_halo_pad(x, axis, widths, mesh_axis, boundary, fill_value)
    mode = BOUNDARY_TO_PAD_MODE[boundary]
    if mode == "extrapolate":
        return _extrapolate_pad(x, axis, widths)
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = widths
    if mode == "constant":
        return jnp.pad(x, pad_widths, mode="constant",
                       constant_values=fill_value)
    return jnp.pad(x, pad_widths, mode=mode)


# position pairs that keep the array length (shardable), with their pad widths
_SHARDABLE_WIDTHS = {
    ("center", "left"): (1, 0),
    ("left", "center"): (0, 1),
    ("center", "right"): (0, 1),
    ("right", "center"): (1, 0),
}


def ring_halo_pad(
    x: jax.Array,
    axis: int,
    widths: Tuple[int, int],
    mesh_axis: str,
    boundary: Optional[str],
    fill_value: float = 0.0,
) -> jax.Array:
    """Pad a locally-sharded block with halos from ring neighbours.

    Must be called inside ``shard_map``.  ``x`` is the local block; the
    returned block has ``widths[0] + n_local + widths[1]`` elements along
    ``axis``.

    Halos wider than one shard hop to as many ring neighbours as needed
    (``ceil(width / n_local)`` ppermutes of the full block), and global
    boundary conditions apply per ELEMENT: halo positions outside the
    global domain are overwritten with the BC value, using the true global
    edge values fetched with a one-element-per-shard ``all_gather`` (so an
    edge shard's out-of-domain positions extend/extrapolate from the
    domain edge even when the halo spans several shards).
    """
    lw, rw = widths
    if lw == 0 and rw == 0:
        return x
    n_local = x.shape[axis]
    n = lax.axis_size(mesh_axis)
    # on a single shard the periodic halo is a local wrap (self-permute),
    # valid at any width; multi-shard periodic halos must fit the rest of
    # the ring
    if (
        n > 1
        and max(lw, rw) > n_local * (n - 1)
        and boundary in ("periodic", None)
    ):
        raise ValueError(
            f"halo width {max(lw, rw)} exceeds the rest of the periodic "
            f"domain ({n_local * (n - 1)} elements on {n} shards)"
        )
    if boundary not in ("periodic", None, "fill", "extend", "extrapolate"):
        raise ValueError(f"unknown boundary {boundary!r}")
    idx = lax.axis_index(mesh_axis)

    def take(arr, sl):
        index = [slice(None)] * arr.ndim
        index[axis] = sl
        return arr[tuple(index)]

    def pos_shape(w):
        shape = [1] * x.ndim
        shape[axis] = w
        return shape

    def edge_values():
        # global first/second and last/second-to-last rows, on every shard.
        # Gather min(2, n_local) rows per shard TILED along `axis` (global
        # order) and slice the true global edge pair — on size-1 shards the
        # two edge rows span two shards, so a per-shard [0:2] slice cannot
        # supply them (it silently returned empty slices downstream).
        k = min(2, n_local)
        firsts = lax.all_gather(
            take(x, slice(0, k)), mesh_axis, axis=axis, tiled=True
        )
        lasts = lax.all_gather(
            take(x, slice(-k, None)), mesh_axis, axis=axis, tiled=True
        )
        return take(firsts, slice(0, 2)), take(lasts, slice(-2, None))

    need_edges = boundary in ("extend", "extrapolate")
    if need_edges:
        first2, last2 = edge_values()

    def multi_hop(direction):
        """The w-wide halo strip from ring neighbours in the given
        direction (-1: from the left), concatenated in global order.

        Each contributing neighbour's strip is SLICED FIRST and shipped
        with a single distance-h ppermute, so total ICI traffic is exactly
        w elements — not hops x the full block (XLA does not hoist a
        slice above a collective)."""
        w = lw if direction < 0 else rw
        hops = -(-w // n_local)
        strips = []
        for h in range(1, hops + 1):
            # the distance-h neighbour contributes w_h elements: full
            # blocks for the near hops, the remainder from the farthest
            w_h = min(n_local, w - (h - 1) * n_local)
            if direction < 0:
                strip = take(x, slice(n_local - w_h, None))
            else:
                strip = take(x, slice(0, w_h))
            perm = [(i, (i - direction * h) % n) for i in range(n)]
            strip = lax.ppermute(strip, mesh_axis, perm)
            if direction < 0:
                strips.insert(0, strip)
            else:
                strips.append(strip)
        return (
            jnp.concatenate(strips, axis=axis)
            if len(strips) > 1
            else strips[0]
        )

    parts = []
    if lw:
        halo = multi_hop(-1)
        if boundary not in ("periodic", None):
            # global positions of the halo elements: idx*n_local - lw + j
            jpos = jnp.arange(lw).reshape(pos_shape(lw))
            gpos = idx * n_local - lw + jpos
            outside = gpos < 0
            if boundary == "fill":
                halo = jnp.where(outside, jnp.asarray(fill_value, x.dtype), halo)
            elif boundary == "extend":
                halo = jnp.where(outside, take(first2, slice(0, 1)), halo)
            else:  # extrapolate: value at g<0 is x0 + g*(x1 - x0)
                x0 = take(first2, slice(0, 1))
                x1 = take(first2, slice(1, 2))
                extr = x0 + gpos.astype(x.dtype) * (x1 - x0)
                halo = jnp.where(outside, extr, halo)
        parts.append(halo)

    parts.append(x)

    if rw:
        halo = multi_hop(+1)
        if boundary not in ("periodic", None):
            n_total = n * n_local
            jpos = jnp.arange(rw).reshape(pos_shape(rw))
            gpos = (idx + 1) * n_local + jpos
            outside = gpos >= n_total
            if boundary == "fill":
                halo = jnp.where(outside, jnp.asarray(fill_value, x.dtype), halo)
            elif boundary == "extend":
                halo = jnp.where(outside, take(last2, slice(1, 2)), halo)
            else:  # extrapolate: value at g>=N is xN + (g - (N-1))*(xN - xNm1)
                xn = take(last2, slice(1, 2))
                xm = take(last2, slice(0, 1))
                ks = (gpos - (n_total - 1)).astype(x.dtype)
                extr = xn + ks * (xn - xm)
                halo = jnp.where(outside, extr, halo)
        parts.append(halo)

    return jnp.concatenate(parts, axis=axis)


def _face_connected_axis(grid: Grid, axis_name: str) -> bool:
    if grid._face_connections is None:
        return False
    return axis_name in {
        a
        for links in grid._face_connections[grid._facedim].values()
        for a in links
    }


def _resolve(grid: Grid, da: GriddedArray, axis_name: str, to, boundary, fill_value):
    ax = grid.axes[axis_name]
    if _face_connected_axis(grid, axis_name):
        # a plain ring halo would wrap the LOCAL grid BC instead of the
        # rotated/flipped cross-face strips — silently wrong, so refuse
        raise NotImplementedError(
            f"axis {axis_name!r} is face-connected; ring halos cannot "
            "serve its cross-face boundaries — use ShardedGrid (routes "
            "through the face exchange plan) or sharded_face_op directly"
        )
    from_pos, dim = ax._get_position_name(da)
    to_pos = to or ax.default_shifts[from_pos]
    if (from_pos, to_pos) not in _SHARDABLE_WIDTHS:
        raise NotImplementedError(
            f"Cannot shard along a core dimension for the position shift "
            f"{from_pos}->{to_pos}; only length-preserving shifts "
            f"(center/left/right) are supported, like the reference's "
            f"map_overlap restriction (grid_ufunc.py:1069-1092)."
        )
    widths = _SHARDABLE_WIDTHS[(from_pos, to_pos)]
    bc = boundary if boundary is not None else ax.boundary
    fv = fill_value if fill_value is not None else ax.fill_value
    out_dim = ax.coords[to_pos]
    return from_pos, to_pos, dim, out_dim, widths, bc, fv


def _stencil(funcname: str, a: jax.Array, axis: int) -> jax.Array:
    """Apply the 2-point stencil along `axis` of a padded block.

    The op body lives in the shared :data:`xgcm_tpu.ops.stencils.PAIR_OPS`
    table (one home for the semantics across the engine, this sharded path,
    and the fused roll path)."""
    from ..ops.stencils import apply_pair

    lo = lax.slice_in_dim(a, 0, a.shape[axis] - 1, axis=axis)
    hi = lax.slice_in_dim(a, 1, a.shape[axis], axis=axis)
    return apply_pair(funcname, lo, hi)


def sharded_op(
    grid: Grid,
    funcname: str,
    da: GriddedArray,
    axis_name: str,
    mesh: Mesh,
    dim_to_mesh_axis: Mapping[str, str],
    to: Optional[str] = None,
    boundary: Optional[str] = None,
    fill_value: Optional[float] = None,
) -> GriddedArray:
    """Apply a 1D grid op with the core dim sharded over the mesh.

    ``dim_to_mesh_axis`` maps array dims to mesh axes; the core dim's entry
    selects the mesh axis used for the halo ring.  Dims not in the mapping
    are replicated.  Result equals the single-device ``grid.<funcname>``.
    """
    from_pos, to_pos, dim, out_dim, widths, bc, fv = _resolve(
        grid, da, axis_name, to, boundary, fill_value
    )
    axis_num = da.get_axis_num(dim)
    mesh_axis = dim_to_mesh_axis.get(dim)

    in_spec = partition_spec(da.dims, dim_to_mesh_axis)
    out_dims = tuple(out_dim if d == dim else d for d in da.dims)
    out_spec = partition_spec(
        out_dims, {**dim_to_mesh_axis, out_dim: dim_to_mesh_axis.get(dim)}
    )

    if mesh_axis is None:
        # core dim not sharded: plain jit does the right thing already
        result = getattr(grid, funcname)(
            da, axis_name, to=to, boundary=boundary, fill_value=fill_value
        )
        return result

    def local(block):
        padded = ring_halo_pad(block, axis_num, widths, mesh_axis, bc, fv)
        return _stencil(funcname, padded, axis_num)

    f = shard_map(local, mesh=mesh, in_specs=(in_spec,), out_specs=out_spec)
    return GriddedArray(f(da.data), out_dims, name=da.name)


def sharded_cumsum(
    grid: Grid,
    da: GriddedArray,
    axis_name: str,
    mesh: Mesh,
    dim_to_mesh_axis: Mapping[str, str],
    to: Optional[str] = None,
    boundary: Optional[str] = None,
    fill_value: Optional[float] = None,
) -> GriddedArray:
    """Sharded position-shifting cumsum.

    The local prefix sum runs per shard; shard offsets come from an
    ``all_gather`` of block totals (log-depth over ICI).  The position
    trim/pad (reference grid.py:1131-1154) becomes a one-element halo shift.
    The reference could not parallelise cumsum at all (grid.py:682-684).
    """
    if _face_connected_axis(grid, axis_name):
        raise NotImplementedError(
            f"axis {axis_name!r} is face-connected; use ShardedGrid.cumsum "
            "(routes through the face plan) or sharded_face_cumsum directly"
        )
    ax = grid.axes[axis_name]
    from_pos, dim = ax._get_position_name(da)
    to_pos = to or ax.default_shifts[from_pos]
    if (from_pos, to_pos) not in (
        ("center", "right"),
        ("left", "center"),
        ("center", "left"),
        ("right", "center"),
    ):
        raise NotImplementedError(
            f"sharded cumsum supports only length-preserving shifts, "
            f"got {from_pos}->{to_pos}"
        )
    bc = boundary if boundary is not None else ax.boundary
    fv = fill_value if fill_value is not None else ax.fill_value
    axis_num = da.get_axis_num(dim)
    mesh_axis = dim_to_mesh_axis.get(dim)
    out_dim = ax.coords[to_pos]
    out_dims = tuple(out_dim if d == dim else d for d in da.dims)

    if mesh_axis is None:
        return grid.cumsum(
            da, axis_name, to=to, boundary=boundary, fill_value=fill_value
        )

    in_spec = partition_spec(da.dims, dim_to_mesh_axis)
    out_spec = partition_spec(
        out_dims, {**dim_to_mesh_axis, out_dim: dim_to_mesh_axis.get(dim)}
    )
    shift = (from_pos, to_pos) in (("center", "left"), ("right", "center"))

    def local(block):
        idx = lax.axis_index(mesh_axis)
        n = lax.axis_size(mesh_axis)
        local_cs = jnp.cumsum(block, axis=axis_num)
        total = lax.slice_in_dim(
            local_cs, local_cs.shape[axis_num] - 1, local_cs.shape[axis_num],
            axis=axis_num,
        )
        totals = lax.all_gather(total, mesh_axis)  # (n, ..., 1, ...)
        ranks = jnp.arange(n)
        # SELECT the earlier shards' totals, never multiply by a 0/1 mask:
        # a NaN in a LATER shard's total would propagate backward through
        # 0*NaN, where real cumsum only propagates NaN forward (CPU dot
        # happens to elide it; the MXU would not)
        mask = (ranks < idx).reshape((n,) + (1,) * (totals.ndim - 1))
        offset = jnp.sum(
            jnp.where(mask, totals, jnp.asarray(0, totals.dtype)), axis=0
        ).astype(totals.dtype)  # totals.dtype == the CUMSUM's dtype: bool
        # input cumsums are int32, and casting the summed prefix back to
        # block.dtype would clamp every offset to 0/1
        data = local_cs + offset
        if shift:
            # result = [bc-element, global_cumsum[:-1]]: shift right by one
            padded = ring_halo_pad(data, axis_num, (1, 0), mesh_axis, bc, fv)
            if bc in ("periodic", None):
                # the reference TRIMS the last cumsum element before
                # padding (grid.py:1131-1154), so the periodic wrap reads
                # the trimmed array's last value cs[-2] = S - x_last — the
                # ring halo of the untrimmed data wrapped cs[-1] instead
                last_in = lax.all_gather(
                    lax.slice_in_dim(
                        block, block.shape[axis_num] - 1,
                        block.shape[axis_num], axis=axis_num,
                    ),
                    mesh_axis,
                )[-1]
                # cast back: jnp.sum promotes small ints to the widest
                # int, which would spread through where/concatenate and
                # return int64 where single-device keeps the cumsum dtype
                wrap = (jnp.sum(totals, axis=0) - last_in).astype(
                    totals.dtype
                )
                halo = lax.slice_in_dim(padded, 0, 1, axis=axis_num)
                halo = jnp.where(idx == 0, wrap, halo)
                padded = jnp.concatenate(
                    [
                        halo,
                        lax.slice_in_dim(
                            padded, 1, padded.shape[axis_num],
                            axis=axis_num,
                        ),
                    ],
                    axis=axis_num,
                )
            data = lax.slice_in_dim(
                padded, 0, padded.shape[axis_num] - 1, axis=axis_num
            )
        return data

    f = shard_map(local, mesh=mesh, in_specs=(in_spec,), out_specs=out_spec)
    return GriddedArray(f(da.data), out_dims, name=da.name)
