"""Fused Pallas TPU kernels for the hot stencil ops.

The XLA path (:mod:`xgcm_tpu.ops.stencils` under jit) is the always-correct
reference; these kernels exist to hit HBM speed-of-light on the benchmark
workloads by fusing whole multi-op expressions into a single pass:

* :func:`fused_vorticity` — C-grid relative vorticity
  ``zeta = (v - roll_x(v)) * inv_dx - (u - roll_y(u)) * inv_dy`` computed in
  ONE kernel: reads u and v once, writes zeta once (3 arrays of HBM traffic,
  the bandwidth lower bound).  The reference computes this as two separate
  padded diffs plus arithmetic (4+ passes over memory).
* :func:`fused_cgrid_diagnostics` — vorticity + divergence + kinetic energy
  in one pass (2 reads, 3 writes).
* :func:`shift_op` — single 1D stencil (diff/interp/min/max, center<->left/
  right) along the last axis with the boundary condition applied in-kernel
  via a lane roll + first/last-column select, so no padded intermediate is
  ever materialised.

Kernels use blocked BlockSpec pipelines (double-buffered by Pallas); the
y-neighbour rows of a tile arrive as extra 8-row input blocks whose index
maps wrap to the adjacent (or periodic-opposite) tile, avoiding manual DMA
and Mosaic's 8-sublane slice-alignment restrictions.  Kernels require the
trailing dim to be a multiple of 128 lanes and f32/bf16 inputs (bf16
neighbour rolls upcast in-register, see :func:`_roll`); callers fall back to
the XLA path otherwise (see :func:`supports_pallas`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_vorticity",
    "fused_cgrid_diagnostics",
    "shift_op",
    "face_shift_op",
    "supports_pallas",
    "supports_face_shift",
]


def supports_pallas(*arrays, tile_rows: int = 128) -> bool:
    """Whether these arrays meet the Pallas kernel constraints."""
    if jax.default_backend() not in ("tpu",):
        return False
    for a in arrays:
        if a.ndim != 2:
            return False
        if a.shape[-1] % 128 != 0:
            return False
        # bf16 rides the same kernels via _roll's register-level upcast
        if a.dtype not in (jnp.float32, jnp.bfloat16):
            return False
    return True


def _roll(x, shift: int, axis: int):
    """pltpu.roll that also works on bf16.

    Mosaic's dynamic_rotate rejects bf16 vectors, so sub-f32 dtypes roll as
    their f32 upcast and convert back — registers only (the HBM blocks stay
    bf16), and bf16->f32->bf16 is an exact round-trip."""
    if x.dtype == jnp.float32:
        return pltpu.roll(x, shift, axis)
    return pltpu.roll(x.astype(jnp.float32), shift, axis).astype(x.dtype)


# ---------------------------------------------------------------------------
# Fused C-grid vorticity
# ---------------------------------------------------------------------------


def _vorticity_kernel(u_ref, u_up_ref, v_ref, inv_dx_ref, inv_dy_ref, out_ref):
    """One row-tile of zeta = (v - roll_x v) * inv_dx - (u - roll_y u) * inv_dy.

    Periodic in both directions.  The x-neighbour is a lane roll; the
    y-neighbour of the tile's first row comes from ``u_up_ref`` — an 8-row
    block whose index map points at the 8 rows ending just above this tile
    (wrapping to the array's last rows for the first tile).  The pipeline
    double-buffers all blocks automatically; no manual DMA.
    """
    out_dtype = u_ref.dtype
    f32 = jnp.float32
    # compute in f32 (bf16 inputs round once at the output store, matching
    # XLA's fused-elementwise behaviour and avoiding per-op bf16 rounding)
    v_blk = v_ref[:, :].astype(f32)
    u_blk = u_ref[:, :].astype(f32)

    dvdx = v_blk - _roll(v_blk, 1, 1)  # periodic x-neighbour via lane roll

    rows = jax.lax.broadcasted_iota(jnp.int32, u_blk.shape, 0)
    u_shift = _roll(u_blk, 1, 0)  # u[j-1] within the tile
    # neighbour row of row 0 = last row of the 8-row block above; rotate it
    # onto sublane 0 so it reads as an aligned (1, nx) slice
    prev_row_vec = _roll(u_up_ref[:, :].astype(f32), 1, 0)[0:1, :]
    u_prev = jnp.where(rows == 0, prev_row_vec, u_shift)
    dudy = u_blk - u_prev

    out_ref[:, :] = (
        dvdx * inv_dx_ref[0:1, :].astype(f32)
        - dudy * inv_dy_ref[:, :].astype(f32)
    ).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("tile_rows",))
def fused_vorticity(
    u: jax.Array,
    v: jax.Array,
    inv_dx: jax.Array,
    inv_dy: jax.Array,
    tile_rows: int = 128,
) -> jax.Array:
    """zeta[j,i] = (v[j,i]-v[j,i-1])*inv_dx[i] - (u[j,i]-u[j-1,i])*inv_dy[j],
    periodic in x and y; u, v shaped (ny, nx) with ny a multiple of 8."""
    ny, nx = u.shape
    T = min(tile_rows, ny)
    while ny % T:
        T //= 2
    n_tiles = ny // T
    blocks_per_tile = T // 8

    inv_dx_b = jnp.broadcast_to(inv_dx.reshape(1, nx), (8, nx))
    inv_dy_row = inv_dy.reshape(ny, 1)

    def up_index(t):
        # 8-row block ending at row t*T - 1 (wrapping for t == 0), in units
        # of 8-row blocks
        return (((t - 1) % n_tiles) * blocks_per_tile + blocks_per_tile - 1, 0)

    return pl.pallas_call(
        _vorticity_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((T, nx), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nx), up_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, nx), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nx), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, nx), lambda t: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ny, nx), u.dtype),
    )(u, u, v, inv_dx_b, inv_dy_row)


# ---------------------------------------------------------------------------
# Fused C-grid diagnostics: vorticity + divergence + kinetic energy
# ---------------------------------------------------------------------------


def _diagnostics_kernel(
    u_ref, u_up_ref, v_ref, v_dn_ref, inv_dx_ref, inv_dy_ref,
    zeta_ref, div_ref, ke_ref,
):
    """One row-tile of the full C-grid diagnostic set, single pass.

    u on (yc, xg), v on (yg, xc), periodic both ways:
      zeta[j,i] = (v[j,i]-v[j,i-1])*inv_dx[i] - (u[j,i]-u[j-1,i])*inv_dy[j]
      div [j,i] = (u[j,i+1]-u[j,i])*inv_dx[i] + (v[j+1,i]-v[j,i])*inv_dy[j]
      ke  [j,i] = 0.5*(mean(u[j,i],u[j,i+1])^2 + mean(v[j,i],v[j+1,i])^2)

    Reads u and v once, writes three outputs: 5 arrays of HBM traffic for
    what takes >=9 as separate padded ops.
    """
    out_dtype = u_ref.dtype
    f32 = jnp.float32
    u_blk = u_ref[:, :].astype(f32)
    v_blk = v_ref[:, :].astype(f32)
    T = u_blk.shape[0]
    nx = u_blk.shape[1]

    rows = jax.lax.broadcasted_iota(jnp.int32, u_blk.shape, 0)

    # neighbours
    v_xm = _roll(v_blk, 1, 1)  # v[j, i-1]
    u_xp = _roll(u_blk, nx - 1, 1)  # u[j, i+1]
    u_shift_up = _roll(u_blk, 1, 0)
    u_prev = jnp.where(
        rows == 0, _roll(u_up_ref[:, :].astype(f32), 1, 0)[0:1, :], u_shift_up
    )  # u[j-1, i]
    v_shift_dn = _roll(v_blk, T - 1, 0)
    v_next = jnp.where(
        rows == T - 1, v_dn_ref[0:1, :].astype(f32), v_shift_dn
    )  # v[j+1, i]

    ix = inv_dx_ref[0:1, :].astype(f32)
    iy = inv_dy_ref[:, :].astype(f32)

    zeta_ref[:, :] = ((v_blk - v_xm) * ix - (u_blk - u_prev) * iy).astype(
        out_dtype
    )
    div_ref[:, :] = ((u_xp - u_blk) * ix + (v_next - v_blk) * iy).astype(
        out_dtype
    )
    u_c = (u_blk + u_xp) * 0.5
    v_c = (v_blk + v_next) * 0.5
    ke_ref[:, :] = ((u_c * u_c + v_c * v_c) * 0.5).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("tile_rows",))
def fused_cgrid_diagnostics(
    u: jax.Array,
    v: jax.Array,
    inv_dx: jax.Array,
    inv_dy: jax.Array,
    tile_rows: int = 64,  # 2 in + 3 out double-buffered tiles must fit VMEM
):
    """(zeta, div, ke) of a periodic C-grid velocity field in ONE kernel."""
    ny, nx = u.shape
    T = min(tile_rows, ny)
    while ny % T:
        T //= 2
    n_tiles = ny // T
    bpt = T // 8  # 8-row blocks per tile

    inv_dx_b = jnp.broadcast_to(inv_dx.reshape(1, nx), (8, nx))
    inv_dy_col = inv_dy.reshape(ny, 1)

    def up_index(t):
        return (((t - 1) % n_tiles) * bpt + bpt - 1, 0)

    def down_index(t):
        return (((t + 1) % n_tiles) * bpt, 0)

    out_spec = pl.BlockSpec((T, nx), lambda t: (t, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((ny, nx), u.dtype)
    return pl.pallas_call(
        _diagnostics_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((T, nx), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nx), up_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, nx), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nx), down_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nx), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(shape, shape, shape),
    )(u, u, v, v, inv_dx_b, inv_dy_col)


# ---------------------------------------------------------------------------
# Generic fused 1D shift stencil
# ---------------------------------------------------------------------------


def _shift_kernel(x_ref, out_ref, *, op, direction, bc, fill_value):
    """out = op(x, neighbour) where neighbour is x shifted by one along the
    last axis; BC fixes the wrapped column in-register."""
    out_dtype = x_ref.dtype
    x = x_ref[:, :].astype(jnp.float32)
    nx = x.shape[-1]
    if direction == "left":
        nb = _roll(x, 1, 1)  # nb[i] = x[i-1], nb[0] = x[-1] (periodic)
        edge_col = 0
    else:
        # pltpu.roll requires a non-negative shift: nx-1 == -1 (mod nx)
        nb = _roll(x, nx - 1, 1)  # nb[i] = x[i+1]
        edge_col = nx - 1

    if bc == "fill":
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        nb = jnp.where(col == edge_col, jnp.asarray(fill_value, x.dtype), nb)
    elif bc == "extend":
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        nb = jnp.where(col == edge_col, x, nb)
    # periodic: roll already wraps

    if op == "diff":
        out = x - nb if direction == "left" else nb - x
    elif op == "interp":
        out = (x + nb) * 0.5
    elif op == "min":
        out = jnp.minimum(x, nb)
    elif op == "max":
        out = jnp.maximum(x, nb)
    else:
        raise ValueError(op)
    out_ref[:, :] = out.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("op", "direction", "bc", "fill_value", "tile_rows")
)
def shift_op(
    x: jax.Array,
    op: str = "diff",
    direction: str = "left",
    bc: str = "periodic",
    fill_value: float = 0.0,
    tile_rows: int = 128,
) -> jax.Array:
    """Fused pad+stencil along the last axis of a 2D array.

    ``direction='left'``: out[i] = op(x[i-1], x[i]) (center->left family);
    ``direction='right'``: out[i] = op(x[i], x[i+1]) (center->right family).
    """
    ny, nx = x.shape
    T = min(tile_rows, ny)
    while ny % T:
        T //= 2
    n_tiles = ny // T
    kernel = functools.partial(
        _shift_kernel, op=op, direction=direction, bc=bc, fill_value=fill_value
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((T, nx), lambda t: (t, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, nx), lambda t: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ny, nx), x.dtype),
    )(x)


# ---------------------------------------------------------------------------
# Face-connected fused 1D shift stencil
# ---------------------------------------------------------------------------


def _apply_shift_pair(op, direction, x, nb):
    # single source of truth for the op -> expression mapping
    from .fused import _apply_pair

    return _apply_pair(op, direction, x, nb)


def _face_tile_rows(ny: int, nx: int, itemsize: int,
                    tile_rows: int = 256):
    """Row-tile height for :func:`face_shift_op`, or ``None`` when no valid
    tile exists.  A valid T must divide ny, be a multiple of 8 (the
    y-kernel reads the neighbour tile as an aligned 8-row block at offset
    ``t * T/8 * 8``, and (1, T, nx) VMEM stores need 8-sublane alignment),
    and keep one (T, nx) block under ~2 MB so double-buffered in/out tiles
    plus f32 temporaries fit 16 MB VMEM."""
    cap = min(tile_rows, ny)
    while cap > 8 and cap * nx * itemsize > 2 * 1024 * 1024:
        cap //= 2
    for cand in range(cap - cap % 8, 7, -8):
        if ny % cand == 0:
            return cand
    return None


def supports_face_shift(x) -> bool:
    """Pallas face-shift constraints: TPU, exactly (F, ny, nx) layout,
    lane-aligned nx, f32/bf16, and an 8-row-aligned tile height dividing
    ny within the VMEM budget (non-square faces like ny=40, nx=16384 have
    no such tile and take the XLA path instead)."""
    if jax.default_backend() != "tpu":
        return False
    if x.ndim != 3:
        return False
    if x.shape[-1] % 128 != 0 or x.shape[-2] % 8 != 0:
        return False
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if _face_tile_rows(x.shape[-2], x.shape[-1], x.dtype.itemsize) is None:
        return False
    return True


def _face_shift_x_kernel(x_ref, h_ref, out_ref, *, op, direction):
    """One (1, T, nx) row-tile of one face; the wrapped edge COLUMN is
    replaced by this tile's slice of the precomputed halo strip."""
    out_dtype = x_ref.dtype
    x = x_ref[0].astype(jnp.float32)  # (T, nx)
    h = h_ref[0].astype(jnp.float32)  # (T, 1)
    nx = x.shape[-1]
    if direction == "left":
        nb = _roll(x, 1, 1)
        edge = 0
    else:
        nb = _roll(x, nx - 1, 1)
        edge = nx - 1
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    nb = jnp.where(col == edge, h, nb)
    out_ref[0] = _apply_shift_pair(op, direction, x, nb).astype(out_dtype)


def _face_shift_y_kernel(x_ref, x_nb_ref, h_ref, out_ref, *, op, direction,
                         n_tiles):
    """One (1, T, nx) row-tile of one face; the y-neighbour of the tile's
    boundary row comes from an 8-row block of the adjacent tile, and the
    face-edge row is replaced by the halo strip on the edge tile."""
    out_dtype = x_ref.dtype
    x = x_ref[0].astype(jnp.float32)  # (T, nx)
    h = h_ref[0].astype(jnp.float32)  # (1, nx)
    T = x.shape[0]
    t = pl.program_id(1)
    if direction == "left":
        # nb[j] = x[j-1]; row 0's neighbour is the tile above's last row
        prev = x_nb_ref[0][7:8, :].astype(jnp.float32)
        nb = jnp.concatenate([prev, x[: T - 1, :]], axis=0)
        is_edge_tile = t == 0
        edge_row = 0
    else:
        # nb[j] = x[j+1]; last row's neighbour is the tile below's first row
        nxt = x_nb_ref[0][0:1, :].astype(jnp.float32)
        nb = jnp.concatenate([x[1:, :], nxt], axis=0)
        is_edge_tile = t == n_tiles - 1
        edge_row = T - 1
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    nb = jnp.where((rows == edge_row) & is_edge_tile, h, nb)
    out_ref[0] = _apply_shift_pair(op, direction, x, nb).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("op", "direction", "axis_is_x", "tile_rows")
)
def face_shift_op(
    x: jax.Array,
    halo: jax.Array,
    op: str,
    direction: str,
    axis_is_x: bool,
    tile_rows: int = 256,
) -> jax.Array:
    """Fused per-face shift stencil: out = op(x, neighbour) on (F, ny, nx)
    faces, where the one wrapped edge line per face is replaced by the
    caller-provided ``halo`` strip ((F, ny) for an x-axis op, (F, nx) for
    a y-axis op) — the correctly rotated/flipped neighbour-face line from
    the compiled face plan, with basic BCs already applied on unconnected
    edges (see ops/fused.fused_face_shift_op).  HBM traffic is x in + out
    out; the reference's pad-and-concat assembly materialises every padded
    face (xgcm padding.py:70-335)."""
    nf, ny, nx = x.shape
    T = _face_tile_rows(ny, nx, x.dtype.itemsize, tile_rows)
    if T is None:
        raise ValueError(
            f"no 8-aligned row tile divides ny={ny} at nx={nx}; gate "
            f"callers on supports_face_shift"
        )
    n_tiles = ny // T
    bpt = T // 8
    tile3 = lambda f, t: (f, t, 0)  # noqa: E731

    if axis_is_x:
        h3 = halo.reshape(nf, ny, 1)
        return pl.pallas_call(
            functools.partial(_face_shift_x_kernel, op=op, direction=direction),
            grid=(nf, n_tiles),
            in_specs=[
                pl.BlockSpec((1, T, nx), tile3, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, 1), tile3, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, T, nx), tile3, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x, h3)

    h3 = halo.reshape(nf, 1, nx)
    if direction == "left":
        # 8-row block ending just above this tile (clamped for tile 0: its
        # content is unused — the halo row overwrites it)
        def nb_index(f, t):
            tt = jnp.maximum(t - 1, 0)
            return (f, tt * bpt + bpt - 1, 0)
    else:
        def nb_index(f, t):
            tt = jnp.minimum(t + 1, n_tiles - 1)
            return (f, tt * bpt, 0)

    return pl.pallas_call(
        functools.partial(
            _face_shift_y_kernel, op=op, direction=direction, n_tiles=n_tiles
        ),
        grid=(nf, n_tiles),
        in_specs=[
            pl.BlockSpec((1, T, nx), tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, nx), nb_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nx), lambda f, t: (f, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, nx), tile3, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, x, h3)
