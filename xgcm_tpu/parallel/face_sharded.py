"""Face-sharded topology: cross-face halo exchange as mesh collectives.

The reference realises multi-face halos by slicing + concatenating faces on
one machine (reference ``padding.py:70-335``).  Here the face dimension is
sharded over a mesh axis (a contiguous block of faces per device — one face
per device when counts match, dummy-padded when ``n_faces`` does not divide
the device count, so e.g. a 13-face LLC grid runs on 8 devices), optionally
combined with a SECOND mesh axis sharding the within-face rows and/or a
THIRD sharding the within-face columns (the face x interior 2-D/3-D
decomposition the reference gets from dask chunking faces and both core
dims simultaneously, ``padding.py:70-335`` composed with
``grid_ufunc.py:990-1066``).  Each op step:

1. every device canonicalises its segments of the 4 edge strips of each of
   its local faces (X-left/X-right/Y-left/Y-right, each ``(w, L)``, offsets
   increasing inward, tangential in increasing coordinate), placed at its
   tangential offset; a ``psum`` over the interior axis completes each
   face's strips and one ``all_gather`` over the face axis builds the
   face-global strip pool (strips are O(w * L) — tiny next to the faces);
2. every device pre-pads its block with the basic boundary condition —
   within-face tangential halos ride a ``ppermute`` ring over the interior
   axis (:func:`~xgcm_tpu.parallel.halo.ring_halo_pad` with the face as the
   global domain), everything else is a local pad;
3. each device overwrites the connected-edge halo segments it owns from a
   **compiled per-edge plan**: static per-face parameter arrays (source
   face, source side, tangential flip, sign) sharded over the face axis, so
   inside ``shard_map`` they collapse to per-device scalars and all control
   flow is branchless ``jnp.where``/``take``.

The slice/flip/sign rules reproduce reference padding.py:201-258 at ANY
halo width:
* halo at outward-offset k = source strip at inward-offset k, where the
  source side is (right edge iff connection.reverse == is_right_edge);
* tangential flip iff the connection swaps axes and is not reversed;
* vector sign: orthogonal component negated on reverse; tangential component
  negated on swap-without-reverse.

Corner halo cells carry the same content as the single-device
``core.padding._pad_face_connections`` assembly (each halo strip is
tangentially extended with the source's basic BC, and the axis replacement
order follows the reference's sorted-axis-name loop), so multi-axis-width
custom ufuncs that read corners match the single-device engine exactly.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..core.dataarray import GriddedArray
from ..core.grid import Grid

__all__ = [
    "FaceHaloPlan",
    "FaceAxisRoles",
    "compile_face_plan",
    "face_axis_roles",
    "face_halo_pad_widths",
    "sharded_face_op",
    "sharded_face_cumsum",
]

# side codes: 0 = X-left, 1 = X-right, 2 = Y-left, 3 = Y-right


class FaceAxisRoles(NamedTuple):
    """Resolved axis roles for a face decomposition: which grid axis plays
    x (side codes 0/1) vs y (2/3), and which mesh axes (if any) shard the
    face dim and each in-face axis."""

    face_mesh_axis: str
    x_axis: str
    y_axis: str
    interior_mesh_axis: Optional[str]  # mesh axis sharding the y (rows) role
    interior_mesh_axis_x: Optional[str]  # mesh axis sharding the x role


def face_axis_roles(
    grid: Grid, dim_to_mesh_axis, data_dims, *, strict: bool = True
):
    """Single source for the face/interior axis-role inference shared by
    the sharded engine's ``_FaceSetup`` (strict=True: inference failures
    raise) and ``ShardedGrid`` dispatch (strict=False: they return None so
    dispatch can fall back to another path).  A grid axis whose dims map
    to MULTIPLE mesh axes is a caller error and raises in both modes.

    Role rules: when one in-face axis is mesh-mapped it takes the y (rows)
    role — the face x interior 2-D decomposition; when both are, the full
    face x y x x 3-D decomposition applies with the connection table's
    first axis as x."""
    facedim = grid._facedim
    face_mesh_axis = dim_to_mesh_axis.get(facedim)
    if face_mesh_axis is None:
        if strict:
            raise NotImplementedError(
                "sharded grid ufuncs on a face-connected grid need the face "
                f"dim {facedim!r} mapped to a mesh axis (interior-only "
                "decomposition of face grids is not supported)"
            )
        return None
    conn_axes = sorted(
        {
            a
            for links in grid._face_connections[facedim].values()
            for a in links
        }
    )
    if len(conn_axes) == 1:
        # ring-style topologies connect along one axis only; the other
        # in-face axis is whichever remaining grid axis the data spans
        others = [
            n for n, ax in grid.axes.items()
            if n != conn_axes[0]
            and any(d in data_dims for d in ax.coords.values())
        ]
        if len(others) != 1:
            if strict:
                raise NotImplementedError(
                    "cannot infer the second in-face axis for a "
                    f"single-axis face connection (candidates: {others})"
                )
            return None
        conn_axes = [conn_axes[0], others[0]]
    elif len(conn_axes) != 2:
        if strict:
            raise NotImplementedError(
                f"face-connected grids with {len(conn_axes)} connection "
                "axes are not supported (need exactly 2)"
            )
        return None

    def _axis_mesh(axname):
        s = {
            dim_to_mesh_axis.get(d)
            for d in grid.axes[axname].coords.values()
        } - {None}
        if len(s) > 1:
            raise ValueError(
                f"dims of axis {axname!r} map to multiple mesh axes"
            )
        return s.pop() if s else None

    m0, m1 = _axis_mesh(conn_axes[0]), _axis_mesh(conn_axes[1])
    if m0 is not None and m1 is not None:
        return FaceAxisRoles(face_mesh_axis, conn_axes[0], conn_axes[1],
                             m1, m0)
    if m0 is not None:
        return FaceAxisRoles(face_mesh_axis, conn_axes[1], conn_axes[0],
                             m0, None)
    return FaceAxisRoles(face_mesh_axis, conn_axes[0], conn_axes[1],
                         m1, None)


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


def _cols_lane_major(block: jax.Array, lidx: jax.Array) -> jax.Array:
    """block[..., :, lidx] as a lane-major (..., w, ny) strip bundle.

    ``jnp.take`` on the lane axis + ``swapaxes`` looks free but lets XLA's
    layout assignment sink the strip transpose into the PARENT block — a
    full relayout copy of the whole local field per op call (see
    ops/fused._column_as_row for the single-chip measurement).  Instead
    slice the one 128-lane window containing all w (contiguous) indices and
    select each column with a one-hot over the window: the reduce performs
    the reorientation, nothing big is relaid out.  Unselected lanes are
    REPLACED by 0.0 before the reduce, never multiplied (``0.0 * NaN``
    would poison the sum through any non-finite value in the window, and
    NaN land masks are routine); exact for every value, except that a
    selected ``-0.0`` comes back as ``+0.0`` (value-equal).  Out-of-window
    indices (other shards' columns, pre-masked by the caller) reduce to
    exact 0.0; in-range clipped-take semantics are preserved only within
    the window, which the callers' masking makes sufficient."""
    ww = lidx.shape[0]
    nxl = block.shape[-1]
    if ww > 128 or not jnp.issubdtype(block.dtype, jnp.inexact):
        cols = jnp.take(block, jnp.clip(lidx, 0, nxl - 1), axis=-1)
        return jnp.swapaxes(cols, -1, -2)
    if nxl <= 128:
        win, off = block, 0
    else:
        off = jnp.clip(jnp.min(lidx), 0, nxl - 128)
        win = lax.dynamic_slice_in_dim(block, off, 128, axis=-1)
    rel = lidx - off
    iota = jnp.arange(win.shape[-1])
    zero = jnp.asarray(0.0, block.dtype)
    rows = [
        jnp.sum(jnp.where(iota == rel[k], win, zero), axis=-1)
        for k in range(ww)
    ]
    return jnp.stack(rows, axis=-2)


def _merge_face_pool(gathered: jax.Array) -> jax.Array:
    """(n_dev, ..., fpd, 4, w, L) -> (..., n_dev*fpd, 4, w, L).

    Global face index = device * faces_per_device + local face, matching
    NamedSharding's contiguous-block layout of the face dim."""
    g = jnp.moveaxis(gathered, 0, -5)
    return g.reshape(g.shape[:-5] + (g.shape[-5] * g.shape[-4],) + g.shape[-3:])


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


def face_halo_pad_widths(
    face_block: jax.Array,
    plan_params: Tuple[jax.Array, ...],
    widths_x: Tuple[int, int],
    widths_y: Tuple[int, int],
    face_mesh_axis: str,
    boundary_x: Optional[str],
    boundary_y: Optional[str],
    fill_value_x: float,
    fill_value_y: float,
    x_name: str,
    y_name: str,
    interior_mesh_axis: Optional[str] = None,
    partner_block: Optional[jax.Array] = None,
    vector_axis_code: Optional[int] = None,
    interior_mesh_axis_x: Optional[str] = None,
) -> jax.Array:
    """Pad a (…, fpd, ny_loc, nx_loc) block of local faces with cross-face
    halos at per-axis widths.

    Must run inside ``shard_map`` with ``fpd`` contiguous faces per device
    along ``face_mesh_axis``; when ``interior_mesh_axis`` is given each
    face's rows are split into contiguous blocks of ``ny_loc`` along that
    second mesh axis, and when ``interior_mesh_axis_x`` is given the
    columns are likewise split along a third mesh axis (the full
    face x y x x 3-D decomposition — the reference chunks faces and both
    core dims simultaneously under dask, ``padding.py:70-335`` composed
    with ``grid_ufunc.py:990-1066``).  ``plan_params`` are the per-device
    (fpd, 4) rows of the FaceHaloPlan arrays.  ``vector_axis_code``: 0 if
    this array is the x_axis vector component, 1 for the y_axis component,
    None for scalars.  ``x_name``/``y_name`` are the grid-axis names (they
    fix the replacement and mixed-mode prepad order, which the
    single-device assembly runs in sorted-name order).

    The result reproduces the single-device
    :func:`xgcm_tpu.core.padding._pad_face_connections` bit-for-bit on
    every cell, including corner halo cells, at any widths up to the rows
    (columns) per interior shard.
    """
    from ..core.padding import BOUNDARY_TO_PAD_MODE, _extrapolate_pad
    from .halo import pad_axis_local_or_ring

    connected, src_face, src_side, tang_flip, sign_o, sign_t, swap = plan_params
    fpd, ny_loc, nx_loc = face_block.shape[-3:]
    P = 1 if interior_mesh_axis is None else lax.axis_size(interior_mesh_axis)
    Q = (
        1
        if interior_mesh_axis_x is None
        else lax.axis_size(interior_mesh_axis_x)
    )
    ny = ny_loc * P
    nx = nx_loc * Q
    L = max(ny, nx)
    w = max(tuple(widths_x) + tuple(widths_y))
    if w == 0:
        return face_block
    if P > 1 and w > ny_loc:
        raise ValueError(
            f"halo width {w} exceeds the {ny_loc} rows per interior shard"
        )
    if Q > 1 and w > nx_loc:
        raise ValueError(
            f"halo width {w} exceeds the {nx_loc} columns per interior shard"
        )
    p_idx = 0 if P == 1 else lax.axis_index(interior_mesh_axis)
    q_idx = 0 if Q == 1 else lax.axis_index(interior_mesh_axis_x)
    interior_axes = tuple(
        a for a in (interior_mesh_axis, interior_mesh_axis_x) if a is not None
    )

    # ---- face-global canonical strip pool: (..., F, 4, w, L) ------------
    # Strips are canonical (offset increasing inward, tangential increasing
    # in the global coordinate).  Each shard contributes the cells it owns
    # (orthogonal ownership masked, tangential segment placed at the
    # shard's global offset); a psum over the interior axes completes each
    # face's strips before the face-axis all_gather builds the pool.
    def strip_pool(block):
        kg = jnp.arange(w)

        def cols_from(gidx):
            # columns of the face-global strip this shard owns
            if Q == 1:
                return _cols_lane_major(block, gidx)
            lidx = gidx - q_idx * nx_loc
            ok = (lidx >= 0) & (lidx < nx_loc)
            cols_t = _cols_lane_major(block, lidx)
            return jnp.where(
                ok[:, None], cols_t, jnp.zeros_like(cols_t)
            )  # (..., fpd, w, ny_loc)

        xl = cols_from(kg)
        xr = cols_from(nx - 1 - kg)

        def rows_from(gidx):
            # rows of the face-global strip this shard owns (zeros elsewhere)
            if P == 1:
                return jnp.take(block, gidx, axis=-2)
            lidx = gidx - p_idx * ny_loc
            ok = (lidx >= 0) & (lidx < ny_loc)
            rows = jnp.take(block, jnp.clip(lidx, 0, ny_loc - 1), axis=-2)
            return jnp.where(ok[:, None], rows, jnp.zeros_like(rows))

        yl = rows_from(kg)  # (..., fpd, w, nx_loc)
        yr = rows_from(ny - 1 - kg)

        def pad_L(s):
            need = L - s.shape[-1]
            if need:
                s = jnp.pad(s, [(0, 0)] * (s.ndim - 1) + [(0, need)])
            return s

        def place(s, n_shards, offset):
            # put the local tangential segment at its global offset
            if n_shards == 1:
                return pad_L(s)
            buf = jnp.zeros(s.shape[:-1] + (L,), s.dtype)
            return lax.dynamic_update_slice_in_dim(
                buf, s, offset, buf.ndim - 1
            )

        stack = jnp.stack(
            [
                place(xl, P, p_idx * ny_loc),
                place(xr, P, p_idx * ny_loc),
                place(yl, Q, q_idx * nx_loc),
                place(yr, Q, q_idx * nx_loc),
            ],
            axis=-3,
        )
        if interior_axes:
            stack = lax.psum(stack, interior_axes)
        return _merge_face_pool(lax.all_gather(stack, face_mesh_axis))

    pool_self = strip_pool(face_block)
    if partner_block is not None:
        pool_partner = strip_pool(partner_block)
    else:
        pool_partner = pool_self

    # ---- basic-BC prepad of the local block at uniform width w ----------
    # Mixed-mode prepad order mirrors _pad_basic: one jnp.pad call (numpy
    # pads array axes in order, y before x in the canonical layout) when
    # the modes coincide, sorted-axis-name order otherwise.
    mode_x = BOUNDARY_TO_PAD_MODE[boundary_x]
    mode_y = BOUNDARY_TO_PAD_MODE[boundary_y]
    key_x = (mode_x, float(fill_value_x) if mode_x == "constant" else 0.0)
    key_y = (mode_y, float(fill_value_y) if mode_y == "constant" else 0.0)
    if key_x == key_y:
        prepad_order = ("y", "x")
    else:
        prepad_order = ("x", "y") if x_name < y_name else ("y", "x")

    b = face_block
    for which in prepad_order:
        if which == "y":
            b = pad_axis_local_or_ring(
                b, b.ndim - 2, (w, w), interior_mesh_axis,
                boundary_y, float(fill_value_y),
            )
        else:
            b = pad_axis_local_or_ring(
                b, b.ndim - 1, (w, w), interior_mesh_axis_x,
                boundary_x, float(fill_value_x),
            )
    prepadded = b  # (..., fpd, ny_loc + 2w, nx_loc + 2w)

    # ---- connected-edge strip assembly ---------------------------------
    def extend_tang(strip, axis_role):
        """Tangential extension by w each side with the basic BC — equal to
        slicing the source's prepadded face (BC modes are pointwise in the
        strip's ortho direction)."""
        bc, fv = (
            (boundary_y, fill_value_y)
            if axis_role == "y"
            else (boundary_x, fill_value_x)
        )
        mode = BOUNDARY_TO_PAD_MODE[bc]
        if mode == "extrapolate":
            return _extrapolate_pad(strip, strip.ndim - 1, (w, w))
        widths = [(0, 0)] * (strip.ndim - 1) + [(w, w)]
        if mode == "constant":
            return jnp.pad(
                strip, widths, mode="constant", constant_values=float(fv)
            )
        return jnp.pad(strip, widths, mode=mode)

    def halo_strip(fl, side):
        """Canonical (…, w, L_t + 2w) halo strip for local face fl's side:
        inward-offset rows, tangential from global -w to L_t + w."""
        sf = src_face[fl, side]
        ss = src_side[fl, side]
        use_partner = swap[fl, side] if partner_block is not None else False
        pool = jnp.where(
            use_partner,
            jnp.take(pool_partner, sf, axis=-4),
            jnp.take(pool_self, sf, axis=-4),
        )
        strip = jnp.take(pool, ss, axis=-3)  # (..., w, L)
        L_t = ny if side < 2 else nx
        strip = strip[..., :L_t]
        # the extension BC follows the SOURCE side's tangential axis
        # (ss is a traced scalar: compute both, select)
        strip = jnp.where(
            ss < 2, extend_tang(strip, "y"), extend_tang(strip, "x")
        )
        strip = jnp.where(tang_flip[fl, side], jnp.flip(strip, -1), strip)
        if vector_axis_code is not None:
            my_axis = side // 2
            is_parallel = vector_axis_code == my_axis
            sign = jnp.where(is_parallel, sign_o[fl, side], sign_t[fl, side])
            strip = strip * sign.astype(strip.dtype)
        return strip

    replace_order = ("x", "y") if x_name < y_name else ("y", "x")

    def put_x(face, fl, side):
        strip = halo_strip(fl, side)  # (..., w, ny + 2w)
        if P == 1:
            seg = strip
        else:
            seg = lax.dynamic_slice_in_dim(
                strip, p_idx * ny_loc, ny_loc + 2 * w, strip.ndim - 1
            )
        # only the column-edge shard owns this face edge's halo columns
        own = connected[fl, side] & (q_idx == (0 if side == 0 else Q - 1))
        if side == 0:
            h = jnp.swapaxes(jnp.flip(seg, -2), -1, -2)  # (..., seg_len, w)
            region = face[..., :, 0:w]
            return face.at[..., :, 0:w].set(jnp.where(own, h, region))
        h = jnp.swapaxes(seg, -1, -2)
        region = face[..., :, w + nx_loc : w + nx_loc + w]
        return face.at[..., :, w + nx_loc : w + nx_loc + w].set(
            jnp.where(own, h, region)
        )

    def put_y(face, fl, side):
        strip = halo_strip(fl, side)  # (..., w, nx + 2w)
        if Q == 1:
            seg = strip
        else:
            seg = lax.dynamic_slice_in_dim(
                strip, q_idx * nx_loc, nx_loc + 2 * w, strip.ndim - 1
            )
        own = connected[fl, side] & (p_idx == (0 if side == 2 else P - 1))
        if side == 2:
            h = jnp.flip(seg, -2)
            region = face[..., 0:w, :]
            return face.at[..., 0:w, :].set(jnp.where(own, h, region))
        region = face[..., w + ny_loc : w + ny_loc + w, :]
        return face.at[..., w + ny_loc : w + ny_loc + w, :].set(
            jnp.where(own, seg, region)
        )

    out_faces = []
    for fl in range(fpd):
        face = prepadded[..., fl, :, :]
        for which in replace_order:
            if which == "x":
                face = put_x(face, fl, 0)
                face = put_x(face, fl, 1)
            else:
                face = put_y(face, fl, 2)
                face = put_y(face, fl, 3)
        out_faces.append(face)
    out = jnp.stack(out_faces, axis=-3)

    lwx, rwx = widths_x
    lwy, rwy = widths_y
    return out[
        ..., w - lwy : w + ny_loc + rwy, w - lwx : w + nx_loc + rwx
    ]


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
    interior_mesh_axis: Optional[str] = None,
    interior_mesh_axis_x: Optional[str] = None,
) -> GriddedArray:
    """Apply a 1D built-in stencil op on a face-sharded field.

    ``da`` must have dims (..., facedim, ydim, xdim) with the face dim
    sharded one-or-more-faces-per-device along ``facedim_mesh_axis`` and,
    optionally, the within-face rows sharded along ``interior_mesh_axis``
    and/or the columns along ``interior_mesh_axis_x`` (the face x interior
    2-D/3-D decomposition).  A vector component is passed
    as a single-entry dict ``{vector_axis: array}`` with its partner in
    ``other_component`` (strips from the partner feed swapped-axis halos,
    with the reference's sign rules).  Result equals the single-device
    ``grid.<funcname>`` everywhere.

    This is a thin selector over the generic face-aware sharded engine
    (:func:`~xgcm_tpu.parallel.sharded_ufunc.sharded_apply_as_grid_ufunc`)
    using the same gridops kernel the single-device dispatch picks — the
    stencil body lives in ONE place (``ops/stencils.PAIR_OPS``).
    """
    from ..core import gridops
    from ..core.grid import _select_grid_ufunc
    from ..core.signature import GridUFuncSignature
    from .halo import _SHARDABLE_WIDTHS
    from .sharded_ufunc import sharded_apply_as_grid_ufunc

    arr = da if not isinstance(da, dict) else next(iter(da.values()))
    ax = grid.axes[axis_name]
    from_pos, _ = ax._get_position_name(arr)
    to_pos = to or ax.default_shifts[from_pos]
    if (from_pos, to_pos) not in _SHARDABLE_WIDTHS:
        raise NotImplementedError(
            f"face-sharded ops support only length-preserving shifts, got "
            f"{from_pos}->{to_pos}"
        )
    sig = GridUFuncSignature.from_string(
        f"({axis_name}:{from_pos})->({axis_name}:{to_pos})"
    )
    grid_ufunc, remaining = _select_grid_ufunc(
        funcname, sig, module=gridops, boundary=boundary, fill_value=fill_value
    )
    dim_to_mesh_axis = {grid._facedim: facedim_mesh_axis}
    if interior_mesh_axis is not None:
        for d in grid.axes[y_axis].coords.values():
            dim_to_mesh_axis[d] = interior_mesh_axis
    if interior_mesh_axis_x is not None:
        for d in grid.axes[x_axis].coords.values():
            dim_to_mesh_axis[d] = interior_mesh_axis_x
    return sharded_apply_as_grid_ufunc(
        grid_ufunc.ufunc,
        da,
        axis=[(axis_name,)],
        grid=grid,
        signature=grid_ufunc.signature,
        mesh=mesh,
        dim_to_mesh_axis=dim_to_mesh_axis,
        boundary_width=grid_ufunc.boundary_width,
        boundary=remaining.get("boundary"),
        fill_value=remaining.get("fill_value"),
        other_component=other_component,
    )


def sharded_face_cumsum(
    grid: Grid,
    da: GriddedArray,
    axis_name: str,
    mesh: Mesh,
    facedim_mesh_axis: str,
    x_axis: str,
    y_axis: str,
    to: Optional[str] = None,
    boundary: Optional[str] = None,
    fill_value: Optional[float] = None,
    interior_mesh_axis: Optional[str] = None,
    interior_mesh_axis_x: Optional[str] = None,
) -> GriddedArray:
    """Position-shifting cumsum on a face-sharded field with an explicit
    per-face collective plan.

    The single-device ``Grid.cumsum`` (reference grid.py:1038-1190) is a
    per-face prefix sum, a one-element trim for the shifting pairs, and a
    width-1 face pad of the TRIMMED array.  Here the prefix sum runs
    locally per shard (plus a log-depth ``all_gather`` of block totals
    along the interior axis when the summed rows are sharded), the trim is
    emulated by overwriting the last global element with its predecessor
    (width-1 halos only ever read edge lines, and the dropped element is
    sliced away afterwards), and the shift element comes from ONE strip
    exchange — no face is ever gathered whole, unlike the GSPMD fallback
    this replaces, whose gather/concat padding emitted unplanned
    all-to-alls.  Result equals ``grid.cumsum`` for the length-preserving
    position pairs.

    Axis-swapping face connections raise NotImplementedError: the trim
    makes faces non-square along the summed axis, and the single-device
    assembly (ours and the reference's xarray concat alike) fails on them
    — there is no behaviour to reproduce.
    """
    from jax import shard_map

    from .mesh import partition_spec

    ax = grid.axes[axis_name]
    from_pos, dim = ax._get_position_name(da)
    to_pos = to or ax.default_shifts[from_pos]
    pairs_shift = {("center", "left"), ("right", "center")}
    pairs_noshift = {("center", "right"), ("left", "center")}
    if (from_pos, to_pos) not in pairs_shift | pairs_noshift:
        raise NotImplementedError(
            f"face-sharded cumsum supports only length-preserving shifts, "
            f"got {from_pos}->{to_pos}"
        )
    shift = (from_pos, to_pos) in pairs_shift

    bc = grid._complete_user_kwargs_using_axis_defaults(boundary, "boundary")
    fv = grid._complete_user_kwargs_using_axis_defaults(
        fill_value, "fill_value"
    )

    facedim = grid._facedim
    n_faces = grid._ds.dims[facedim]
    f_size = mesh.shape[facedim_mesh_axis]
    fpd = -(-n_faces // f_size)
    n_padded = fpd * f_size
    plan = compile_face_plan(grid, x_axis, y_axis, n_faces_total=n_padded)
    if shift and np.any(plan.swap):
        raise NotImplementedError(
            "cumsum on grids with axis-swapping face connections is not "
            "supported (the trim makes faces non-square; the single-device "
            "assembly fails on them too)"
        )
    plan_params = _plan_device_params(plan, mesh, facedim_mesh_axis)

    _, ydim = grid.axes[y_axis]._get_position_name(da)
    _, xdim = grid.axes[x_axis]._get_position_name(da)
    rest = [d for d in da.dims if d not in (facedim, ydim, xdim)]
    ordered = da.transpose(*rest, facedim, ydim, xdim)

    data = ordered.data
    if n_padded != n_faces:
        widths = [(0, 0)] * data.ndim
        widths[-3] = (0, n_padded - n_faces)
        data = jnp.pad(data, widths)

    axis_is_x = axis_name == x_axis
    d2m = {facedim: facedim_mesh_axis}
    if interior_mesh_axis is not None:
        d2m[ydim] = interior_mesh_axis
    if interior_mesh_axis_x is not None:
        d2m[xdim] = interior_mesh_axis_x
    in_spec = partition_spec(ordered.dims, d2m)
    plan_spec = PartitionSpec(facedim_mesh_axis)
    # mesh axis sharding the summed dim (None if that dim is unsharded)
    op_mesh_axis = interior_mesh_axis_x if axis_is_x else interior_mesh_axis

    def local(block, *plan_local):
        opax = block.ndim + (-1 if axis_is_x else -2)
        n_loc = block.shape[opax]
        cs = jnp.cumsum(block, axis=opax)
        if op_mesh_axis is not None:
            # distributed prefix sum: add the totals of preceding shards
            total = lax.slice_in_dim(cs, n_loc - 1, n_loc, axis=opax)
            totals = lax.all_gather(total, op_mesh_axis)
            idx = lax.axis_index(op_mesh_axis)
            nsh = lax.axis_size(op_mesh_axis)
            # SELECT earlier shards' totals (0*NaN in a mask-multiply
            # would flow a later shard's NaN backward; see parallel/halo)
            mask = (jnp.arange(nsh) < idx).reshape(
                (nsh,) + (1,) * (totals.ndim - 1)
            )
            cs = cs + jnp.sum(
                jnp.where(mask, totals, jnp.asarray(0, totals.dtype)),
                axis=0,
            ).astype(totals.dtype)  # cumsum dtype, NOT block dtype: bool
            # blocks cumsum to int32, and a bool cast clamps the offset
        if not shift:
            return cs
        # emulate the reference's pre-pad trim: the last GLOBAL element is
        # replaced by its predecessor, so every width-1 edge line equals
        # the trimmed array's; the bogus element itself is sliced away
        last = lax.slice_in_dim(cs, n_loc - 2, n_loc - 1, axis=opax)
        iota = lax.broadcasted_iota(jnp.int32, cs.shape, opax)
        is_last = iota == n_loc - 1
        if op_mesh_axis is not None:
            is_last = is_last & (
                lax.axis_index(op_mesh_axis)
                == lax.axis_size(op_mesh_axis) - 1
            )
        emul = jnp.where(is_last, last, cs)
        wx = (1, 0) if axis_is_x else (0, 0)
        wy = (0, 0) if axis_is_x else (1, 0)
        padded = face_halo_pad_widths(
            emul, plan_local, wx, wy, facedim_mesh_axis,
            bc[x_axis], bc[y_axis], float(fv[x_axis]), float(fv[y_axis]),
            x_axis, y_axis, interior_mesh_axis=interior_mesh_axis,
            interior_mesh_axis_x=interior_mesh_axis_x,
        )
        return lax.slice_in_dim(padded, 0, n_loc, axis=opax)

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(in_spec,) + (plan_spec,) * len(plan_params),
        out_specs=in_spec,
    )
    result = f(data, *plan_params)
    if n_padded != n_faces:
        index = [slice(None)] * result.ndim
        index[-3] = slice(0, n_faces)
        result = result[tuple(index)]
    out_dim = ax.coords[to_pos]
    out_dims = tuple(
        out_dim if d == dim else d for d in ordered.dims
    )
    out = GriddedArray(result, out_dims, name=da.name)
    desired = tuple(out_dim if d == dim else d for d in da.dims)
    return out.transpose(*desired)
