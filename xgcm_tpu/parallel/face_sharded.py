"""Face-sharded topology: cross-face halo exchange as mesh collectives.

The reference realises multi-face halos by slicing + concatenating faces on
one machine (reference ``padding.py:70-335``).  Here the face dimension is
sharded over a mesh axis (a contiguous block of faces per device — one face
per device when counts match, dummy-padded when ``n_faces`` does not divide
the device count, so e.g. a 13-face LLC grid runs on 8 devices), and each
op step:

1. every device canonicalises the 4 edge strips of each of its local faces
   (X-left/X-right/Y-left/Y-right, each ``(width, L)``, offsets increasing
   inward, tangential in increasing coordinate);
2. one ``all_gather`` of the strip stack rides the ICI ring (strips are
   O(width * L) — tiny next to the face itself);
3. each device assembles its halo from a **compiled per-edge plan**: static
   per-face parameter arrays (source face, source side, tangential flip,
   sign) that are themselves sharded over the face axis, so inside
   ``shard_map`` they collapse to per-device scalars and all control flow is
   branchless ``jnp.where``/``take``.

The slice/flip/sign rules reproduce reference padding.py:201-258:
* halo at outward-offset k = source strip at inward-offset k, where the
  source side is (right edge iff connection.reverse == is_right_edge);
* tangential flip iff the connection swaps axes and is not reversed;
* vector sign: orthogonal component negated on reverse; tangential component
  negated on swap-without-reverse.

Corner halo cells are filled with the basic boundary condition (they are
unspecified in the reference — its own tests exclude them) and never read by
single-axis stencils.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..core.dataarray import GriddedArray
from ..core.grid import Grid

__all__ = ["FaceHaloPlan", "compile_face_plan", "sharded_face_op"]

# side codes: 0 = X-left, 1 = X-right, 2 = Y-left, 3 = Y-right


class FaceHaloPlan:
    """Static per-face halo-exchange parameters (numpy; shard over faces)."""

    def __init__(self, n_faces: int):
        shape = (n_faces, 4)
        self.connected = np.zeros(shape, dtype=bool)
        self.src_face = np.zeros(shape, dtype=np.int32)
        self.src_side = np.zeros(shape, dtype=np.int32)
        self.tang_flip = np.zeros(shape, dtype=bool)
        self.sign_ortho = np.ones(shape, dtype=np.float32)  # for the || component
        self.sign_tang = np.ones(shape, dtype=np.float32)  # for the perp component
        self.swap = np.zeros(shape, dtype=bool)


def compile_face_plan(
    grid: Grid, x_axis: str, y_axis: str, n_faces_total: Optional[int] = None
) -> FaceHaloPlan:
    """Compile the face-connection table into a static per-edge plan.

    ``x_axis``/``y_axis`` name the two grid axes spanning each face (the
    side codes 0/1 belong to ``x_axis``, 2/3 to ``y_axis``).
    ``n_faces_total`` sizes the plan beyond the grid's face count; the extra
    rows are unconnected dummy faces (used to round the face dim up to a
    multiple of the device count).
    """
    facedim = grid._facedim
    connections = grid._face_connections[facedim]
    n_faces = grid._ds.dims[facedim]
    plan = FaceHaloPlan(max(n_faces, n_faces_total or 0))

    axis_code = {x_axis: 0, y_axis: 1}
    for f in range(n_faces):
        face_links = connections.get(f, {})
        for axname, (left_conn, right_conn) in face_links.items():
            a = axis_code[axname]
            for conn, is_right in ((left_conn, False), (right_conn, True)):
                if conn is None:
                    continue
                src, src_axis, reverse = conn
                side = a * 2 + (1 if is_right else 0)
                swap = src_axis != axname
                src_is_right = reverse == is_right
                plan.connected[f, side] = True
                plan.src_face[f, side] = src
                plan.src_side[f, side] = axis_code[src_axis] * 2 + (
                    1 if src_is_right else 0
                )
                plan.tang_flip[f, side] = swap and not reverse
                plan.swap[f, side] = swap
                # sign rules for vector components (padding.py:239-258)
                plan.sign_ortho[f, side] = -1.0 if reverse else 1.0
                plan.sign_tang[f, side] = -1.0 if (swap and not reverse) else 1.0
    return plan


def _edge_strips(face: jax.Array, w: int) -> jax.Array:
    """Canonical (4, w, Lmax) strip stack of a local face (..., ny, nx).

    Strip k-offset increases inward from the edge; tangential axis is the
    face's other dim in increasing order.  For non-square faces the shorter
    strips are zero-padded at the END to Lmax = max(ny, nx); consumers slice
    back to the destination edge's length (which equals the source's valid
    length: straight connections pair like edges, and swapped connections
    require square faces)."""
    ny, nx = face.shape[-2:]
    L = max(ny, nx)
    xl = jnp.swapaxes(face[..., :, 0:w], -1, -2)  # (w, ny)
    xr = jnp.swapaxes(jnp.flip(face[..., :, nx - w : nx], axis=-1), -1, -2)
    yl = face[..., 0:w, :]  # (w, nx)
    yr = jnp.flip(face[..., ny - w : ny, :], axis=-2)

    def pad_l(s):
        need = L - s.shape[-1]
        if need:
            s = jnp.pad(s, [(0, 0)] * (s.ndim - 1) + [(0, need)])
        return s

    return jnp.stack([pad_l(xl), pad_l(xr), pad_l(yl), pad_l(yr)], axis=-3)


def _merge_face_pool(gathered: jax.Array) -> jax.Array:
    """(n_dev, ..., fpd, 4, w, L) -> (..., n_dev*fpd, 4, w, L).

    Global face index = device * faces_per_device + local face, matching
    NamedSharding's contiguous-block layout of the face dim."""
    g = jnp.moveaxis(gathered, 0, -5)
    return g.reshape(g.shape[:-5] + (g.shape[-5] * g.shape[-4],) + g.shape[-3:])


def _basic_halo(face, w, side, boundary, fill_value):
    """Halo strip (w, L) for an unconnected edge, from the basic BC."""
    ny, nx = face.shape[-2:]
    if boundary in ("periodic", None):
        # wrap within the face
        if side == 0:
            return jnp.swapaxes(jnp.flip(face[..., :, nx - w : nx], -1), -1, -2)
        if side == 1:
            return jnp.swapaxes(face[..., :, 0:w], -1, -2)
        if side == 2:
            return jnp.flip(face[..., ny - w : ny, :], -2)
        return face[..., 0:w, :]
    if boundary == "fill":
        L = ny if side < 2 else nx
        return jnp.full(face.shape[:-2] + (w, L), fill_value, face.dtype)
    if boundary == "extrapolate":
        if side == 0:
            e = face[..., :, 0:1]; nxt = face[..., :, 1:2]
            strip = 2.0 * e - nxt
            return jnp.broadcast_to(jnp.swapaxes(strip, -1, -2), face.shape[:-2] + (w, ny))
        if side == 1:
            e = face[..., :, nx - 1 : nx]; nxt = face[..., :, nx - 2 : nx - 1]
            strip = 2.0 * e - nxt
            return jnp.broadcast_to(jnp.swapaxes(strip, -1, -2), face.shape[:-2] + (w, ny))
        if side == 2:
            strip = 2.0 * face[..., 0:1, :] - face[..., 1:2, :]
            return jnp.broadcast_to(strip, face.shape[:-2] + (w, nx))
        strip = 2.0 * face[..., ny - 1 : ny, :] - face[..., ny - 2 : ny - 1, :]
        return jnp.broadcast_to(strip, face.shape[:-2] + (w, nx))
    if boundary == "extend":
        if side == 0:
            e = face[..., :, 0:1]
            return jnp.broadcast_to(
                jnp.swapaxes(e, -1, -2), face.shape[:-2] + (w, ny)
            )
        if side == 1:
            e = face[..., :, nx - 1 : nx]
            return jnp.broadcast_to(
                jnp.swapaxes(e, -1, -2), face.shape[:-2] + (w, ny)
            )
        if side == 2:
            return jnp.broadcast_to(face[..., 0:1, :], face.shape[:-2] + (w, nx))
        return jnp.broadcast_to(
            face[..., ny - 1 : ny, :], face.shape[:-2] + (w, nx)
        )
    raise ValueError(f"unknown boundary {boundary!r}")


def face_halo_pad(
    face_block: jax.Array,
    plan_params: Tuple[jax.Array, ...],
    w: int,
    mesh_axis: str,
    boundary: Optional[str],
    fill_value: float,
    partner_block: Optional[jax.Array] = None,
    vector_axis_code: Optional[int] = None,
) -> jax.Array:
    """Pad a (…, fpd, ny, nx) block of local faces with cross-face halos.

    Must run inside shard_map with ``fpd`` contiguous faces per device along
    ``mesh_axis`` (one ``all_gather`` of the strip stacks serves them all).
    ``plan_params`` are the per-device (fpd, 4) rows of the FaceHaloPlan
    arrays.  ``vector_axis_code``: 0 if this array is the x_axis vector
    component, 1 for the y_axis component, None for scalars.
    """
    connected, src_face, src_side, tang_flip, sign_o, sign_t, swap = plan_params
    fpd, ny, nx = face_block.shape[-3:]

    pool_self = _merge_face_pool(
        lax.all_gather(_edge_strips(face_block, w), mesh_axis)
    )  # (..., F, 4, w, Lmax)
    if partner_block is not None:
        pool_partner = _merge_face_pool(
            lax.all_gather(_edge_strips(partner_block, w), mesh_axis)
        )
    else:
        pool_partner = pool_self

    def halo_for(fl: int, side: int) -> jax.Array:
        sf = src_face[fl, side]
        ss = src_side[fl, side]
        use_partner = swap[fl, side] if partner_block is not None else False
        pool = jnp.where(
            use_partner,
            jnp.take(pool_partner, sf, axis=-4),
            jnp.take(pool_self, sf, axis=-4),
        )
        strip = jnp.take(pool, ss, axis=-3)  # (..., w, Lmax)
        strip = strip[..., : (ny if side < 2 else nx)]
        strip = jnp.where(tang_flip[fl, side], jnp.flip(strip, axis=-1), strip)
        if vector_axis_code is not None:
            my_axis = side // 2
            is_parallel = vector_axis_code == my_axis
            sign = jnp.where(is_parallel, sign_o[fl, side], sign_t[fl, side])
            strip = strip * sign.astype(strip.dtype)
        basic = _basic_halo(
            face_block[..., fl, :, :], w, side, boundary, fill_value
        )
        return jnp.where(connected[fl, side], strip, basic)

    corner = jnp.full(
        face_block.shape[:-3] + (w, w),
        fill_value if boundary == "fill" else 0.0,
        face_block.dtype,
    )
    out_faces = []
    for fl in range(fpd):
        face = face_block[..., fl, :, :]
        # halos canonical (w, L) inward-increasing -> flip to array order
        h_xl = jnp.swapaxes(jnp.flip(halo_for(fl, 0), axis=-2), -1, -2)
        h_xr = jnp.swapaxes(halo_for(fl, 1), -1, -2)
        h_yl = jnp.flip(halo_for(fl, 2), axis=-2)
        h_yr = halo_for(fl, 3)
        mid = jnp.concatenate([h_xl, face, h_xr], axis=-1)  # (ny, nx+2w)
        top = jnp.concatenate([corner, h_yr, corner], axis=-1)
        bot = jnp.concatenate([corner, h_yl, corner], axis=-1)
        out_faces.append(jnp.concatenate([bot, mid, top], axis=-2))
    return jnp.stack(out_faces, axis=-3)


def _plan_device_params(plan: FaceHaloPlan, mesh: Mesh, mesh_axis: str):
    """Shard the plan arrays over the face mesh axis."""
    sharding = NamedSharding(mesh, PartitionSpec(mesh_axis))
    return tuple(
        jax.device_put(jnp.asarray(a), sharding)
        for a in (
            plan.connected,
            plan.src_face,
            plan.src_side,
            plan.tang_flip,
            plan.sign_ortho,
            plan.sign_tang,
            plan.swap,
        )
    )


def sharded_face_op(
    grid: Grid,
    funcname: str,
    da,
    axis_name: str,
    mesh: Mesh,
    facedim_mesh_axis: str,
    x_axis: str,
    y_axis: str,
    to: Optional[str] = None,
    boundary: Optional[str] = None,
    fill_value: Optional[float] = None,
    other_component: Optional[Dict[str, GriddedArray]] = None,
) -> GriddedArray:
    """Apply a 1D stencil op on a face-sharded field.

    ``da`` must have dims (..., facedim, ydim, xdim) with the face dim
    sharded one-face-per-device along ``facedim_mesh_axis``.  A vector
    component is passed as a single-entry dict ``{vector_axis: array}`` with
    its partner in ``other_component`` (strips from the partner feed
    swapped-axis halos, with the reference's sign rules).  Result equals the
    single-device ``grid.<funcname>`` away from (unused) corner cells.
    """
    from .halo import _SHARDABLE_WIDTHS, _stencil

    partner = None
    vector_axis_code = None
    if isinstance(da, dict):
        (vec_axis, da), = da.items()
        vector_axis_code = 0 if vec_axis == x_axis else 1
        if other_component is None:
            raise ValueError(
                "Padding vector components requires `other_component` input."
            )
        (_, partner), = other_component.items()

    ax = grid.axes[axis_name]
    from_pos, dim = ax._get_position_name(da)
    to_pos = to or ax.default_shifts[from_pos]
    if (from_pos, to_pos) not in _SHARDABLE_WIDTHS:
        raise NotImplementedError(
            f"face-sharded ops support only length-preserving shifts, got "
            f"{from_pos}->{to_pos}"
        )
    lw, rw = _SHARDABLE_WIDTHS[(from_pos, to_pos)]
    w = max(lw, rw)
    bc = boundary if boundary is not None else ax.boundary
    fv = float(fill_value if fill_value is not None else ax.fill_value)

    facedim = grid._facedim
    n_faces = grid._ds.dims[grid._facedim]
    mesh_size = dict(zip(mesh.axis_names, mesh.devices.shape))[facedim_mesh_axis]
    # contiguous blocks of faces per device; round up with unconnected dummy
    # faces when n_faces does not divide the device count (e.g. 13-face LLC
    # on 8 devices -> 2 faces/device, 3 dummies)
    fpd = -(-n_faces // mesh_size)
    n_padded = fpd * mesh_size
    plan = compile_face_plan(grid, x_axis, y_axis, n_faces_total=n_padded)
    plan_params = _plan_device_params(plan, mesh, facedim_mesh_axis)

    # canonical dim order: (facedim, ydim, xdim)
    _, ydim = grid.axes[y_axis]._get_position_name(da)
    _, xdim = grid.axes[x_axis]._get_position_name(da)
    rest = [d for d in da.dims if d not in (facedim, ydim, xdim)]
    ordered = da.transpose(*rest, facedim, ydim, xdim)

    ny_, nx_ = ordered.data.shape[-2:]
    if np.any(plan.swap) and ny_ != nx_:
        raise ValueError("cross-axis face connections require square faces")

    def _pad_faces(data):
        if n_padded == data.shape[-3]:
            return data
        widths = [(0, 0)] * data.ndim
        widths[-3] = (0, n_padded - data.shape[-3])
        return jnp.pad(data, widths)

    axis_is_x = axis_name == x_axis
    out_dim = ax.coords[to_pos]

    in_spec = PartitionSpec(
        *([None] * len(rest)), facedim_mesh_axis, None, None
    )
    plan_spec = PartitionSpec(facedim_mesh_axis)

    data = _pad_faces(ordered.data)
    if partner is None:
        partner_data = data  # unused; keeps the shard_map arity fixed
    else:
        rest_p = [d for d in partner.dims if d not in
                  (facedim,
                   grid.axes[y_axis]._get_position_name(partner)[1],
                   grid.axes[x_axis]._get_position_name(partner)[1])]
        partner_data = _pad_faces(
            partner.transpose(
                *rest_p,
                facedim,
                grid.axes[y_axis]._get_position_name(partner)[1],
                grid.axes[x_axis]._get_position_name(partner)[1],
            ).data
        )

    def local(block, partner_block, *params):
        # block: (..., fpd, ny, nx) per device; params: (fpd, 4) rows
        pf = partner_block if vector_axis_code is not None else None
        padded = face_halo_pad(
            block, params, w, facedim_mesh_axis, bc, fv,
            partner_block=pf, vector_axis_code=vector_axis_code,
        )
        ny, nx = block.shape[-2:]
        # trim to just the slice this stencil needs
        if axis_is_x:
            sl = padded[..., w : w + ny, w - lw : w + nx + rw]
            return _stencil(funcname, sl, sl.ndim - 1)
        sl = padded[..., w - lw : w + ny + rw, w : w + nx]
        return _stencil(funcname, sl, sl.ndim - 2)

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(in_spec, in_spec) + (plan_spec,) * 7,
        out_specs=in_spec,
    )
    result = f(data, partner_data, *plan_params)
    if n_padded != n_faces:
        index = [slice(None)] * result.ndim
        index[-3] = slice(0, n_faces)
        result = result[tuple(index)]
    out_dims = tuple(
        out_dim if d == dim else d for d in tuple(rest) + (facedim, ydim, xdim)
    )
    out = GriddedArray(result, out_dims, name=da.name)
    # restore the input dim order (with the shifted dim renamed)
    desired = tuple(out_dim if d == dim else d for d in da.dims)
    return out.transpose(*desired)
