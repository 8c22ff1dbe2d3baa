"""Fused XLA fast path for the hot 1D shift stencils.

The generic engine realises boundary conditions by materialising a padded
array (``jnp.pad`` -> concatenate) and slicing — semantically clean and
fully general, but XLA fuses the roll formulation measurably better (~1.5x
on the 4096^2 vorticity benchmark): compute ``op(x, shift(x))`` where the
shift is a ``jnp.roll`` and the one wrapped edge column is fixed up
in-register with a ``where``.  This is the XLA twin of the Pallas
``shift_op`` kernel and produces bit-identical results to the generic
pad-then-stencil path for every length-preserving position pair.

Two fast paths live here: :func:`fused_shift_op` for face-less grids and
:func:`fused_face_shift_op` for face-connected grids (per-face roll + a
plan-driven edge-line fixup).  Both serve scalars; the face path also
serves vector components (partner strips + sign rules via
``partner``/``vector_axis_code``); anything else falls back to the
generic engine.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax

__all__ = ["fused_shift_op", "FUSABLE_PAIRS"]

# (from_pos, to_pos) -> neighbour direction, for length-preserving shifts.
# "left": out[i] = op(x[i-1], x[i]);  "right": out[i] = op(x[i], x[i+1]).
FUSABLE_PAIRS = {
    ("center", "left"): "left",
    ("right", "center"): "left",
    ("left", "center"): "right",
    ("center", "right"): "right",
}

FUSABLE_OPS = ("diff", "interp", "min", "max")


def fused_shift_op(
    x: jnp.ndarray,
    axis: int,
    op: str,
    direction: str,
    boundary: Optional[str],
    fill_value: float = 0.0,
) -> jnp.ndarray:
    """op(x, neighbour) along ``axis`` with the BC applied in-register."""
    n = x.shape[axis]
    if direction == "left":
        nb = jnp.roll(x, 1, axis=axis)
        edge = 0
    else:
        nb = jnp.roll(x, -1, axis=axis)
        edge = n - 1

    if boundary == "fill":
        idx = lax.broadcasted_iota(jnp.int32, x.shape, axis)
        nb = jnp.where(idx == edge, jnp.asarray(fill_value, x.dtype), nb)
    elif boundary == "extend":
        idx = lax.broadcasted_iota(jnp.int32, x.shape, axis)
        nb = jnp.where(idx == edge, x, nb)
    elif boundary == "extrapolate":
        # linear: one cell beyond the edge is 2*edge - next-inward
        idx = lax.broadcasted_iota(jnp.int32, x.shape, axis)
        inward = jnp.roll(x, -1 if direction == "left" else 1, axis=axis)
        nb = jnp.where(idx == edge, 2.0 * x - inward, nb)
    # periodic / None: the roll already wraps

    return _apply_pair(op, direction, x, nb)


def _apply_pair(op: str, direction: str, x, nb):
    """2-point op on (x, its rolled neighbour nb); the body lives in the
    shared :data:`xgcm_tpu.ops.stencils.PAIR_OPS` table.  ``direction``
    says which side ``nb`` came from: "left" means nb = x[i-1] (so nb is
    the lower-index operand), "right" means nb = x[i+1]."""
    from .stencils import apply_pair

    if direction == "left":
        return apply_pair(op, nb, x)
    return apply_pair(op, x, nb)


def _column_as_row(x: jnp.ndarray, col: int) -> jnp.ndarray:
    """Lane-major (..., ny) copy of column ``col`` of ``x`` (..., ny, nx).

    ``x[..., :, col]`` looks free but is a layout change: on TPU, XLA's
    layout assignment gives the strip a lanes-major layout and then sinks
    the transpose into the PARENT array — a full {1,2,0}-relayout copy of
    the whole field (observed in the LLC4320 vorticity HLO: a 1.94 GB
    read+write per loop iteration to extract 450 KB of column).  Instead,
    slice the one 128-lane tile block containing the column and select it
    with a one-hot over the lanes: the reduce performs the reorientation,
    no transpose exists for layout assignment to sink, and the pass reads
    ~nx/128th of the array.  Exact for every value including NaN/inf:
    unselected lanes are REPLACED by 0.0 before the reduce, never
    multiplied (``0.0 * NaN`` would poison the sum through any non-finite
    value sharing the 128-lane window, and NaN land masks are routine in
    this domain).  Sole caveat: a selected ``-0.0`` comes back as ``+0.0``
    (value-equal; XLA's reduce does not preserve the sign of zero)."""
    nx = x.shape[-1]
    if nx < 128 or not jnp.issubdtype(x.dtype, jnp.inexact):
        # sub-tile arrays: nothing to win; integer/bool: jnp.sum would
        # promote the dtype (the sharded twin keeps the same guard)
        return x[..., :, col]
    start = min(col - col % 128, nx - 128)
    blk = x[..., :, start : start + 128]
    onehot = jnp.arange(128) == (col - start)
    return jnp.sum(jnp.where(onehot, blk, jnp.asarray(0.0, x.dtype)), axis=-1)


def _edge_strips(x: jnp.ndarray, ny: int, nx: int) -> jnp.ndarray:
    """Lane-major (..., face, 4, L) table of the four one-wide edge strips
    (X-left, X-right, Y-left, Y-right), tangential in increasing
    coordinate.  Column strips go through :func:`_column_as_row`."""
    if ny != nx:
        # mixed strip lengths cannot form one table; callers fall back to
        # the generic engine (same contract as the jnp.stack this replaces)
        raise ValueError("edge-strip table requires square faces")
    return jnp.stack(
        [
            _column_as_row(x, 0),
            _column_as_row(x, nx - 1),
            x[..., 0, :],
            x[..., ny - 1, :],
        ],
        axis=-2,
    )


def _inward_line(x: jnp.ndarray, side: int, ny: int, nx: int) -> jnp.ndarray:
    """The one-inward line of ``side`` as a lane-major (..., face, L)
    strip (columns via :func:`_column_as_row`)."""
    if side == 0:
        return _column_as_row(x, 1)
    if side == 1:
        return _column_as_row(x, nx - 2)
    if side == 2:
        return x[..., 1, :]
    return x[..., ny - 2, :]


def fused_face_shift_op(
    x: jnp.ndarray,
    plan,
    axis_is_x: bool,
    face_axis: int,
    op: str,
    direction: str,
    boundary: Optional[str],
    fill_value: float = 0.0,
    partner: Optional[jnp.ndarray] = None,
    vector_axis_code: Optional[int] = None,
) -> jnp.ndarray:
    """Face-connected 1D shift stencil without materialising padded faces.

    ``x`` has dims (..., face, ny, nx); the stencil along the chosen axis is
    a per-face roll, and the one wrapped edge line per face is overwritten
    with the correctly-oriented neighbour strip selected from the compiled
    :class:`~xgcm_tpu.parallel.face_sharded.FaceHaloPlan` — 2 arrays of HBM
    traffic plus O(F * L) strip work, versus the pad-and-concat path's full
    padded intermediates.  Vector components pass the partner component's
    array as ``partner`` and ``vector_axis_code`` (0 = the x_axis
    component, 1 = y_axis): on axis-swapping connections the halo strip
    comes from the partner, and the reference's sign rules apply
    (orthogonal component negated on reverse, tangential on
    swap-without-reverse — xgcm padding.py:239-258).  Semantics identical
    to the halo-assembly padding away from (unread) corner cells.
    """
    assert face_axis == x.ndim - 3, "expected (..., face, ny, nx) layout"
    ny, nx = x.shape[-2:]
    nf = x.shape[-3]

    # canonical one-wide edge strips, tangential in increasing coordinate:
    # side 0 = X-left, 1 = X-right, 2 = Y-left, 3 = Y-right
    import numpy as _np

    if _np.any(plan.swap) and ny != nx:
        raise ValueError("cross-axis face connections require square faces")
    strips = _edge_strips(x, ny, nx)  # (..., face, 4, L)

    # which side of THIS face needs a halo, and the roll axis
    if axis_is_x:
        side = 0 if direction == "left" else 1
        roll_axis = -1
        edge = 0 if direction == "left" else nx - 1
    else:
        side = 2 if direction == "left" else 3
        roll_axis = -2
        edge = 0 if direction == "left" else ny - 1

    connected = jnp.asarray(plan.connected[:, side])  # (F,)
    src_face = jnp.asarray(plan.src_face[:, side])
    src_side = jnp.asarray(plan.src_side[:, side])
    tang_flip = jnp.asarray(plan.tang_flip[:, side])

    # gather each face's source strip: (..., F, 4, L) -> (..., F, L);
    # side selection via a tiny (F, 4) one-hot sum (no gather)
    src_strips = jnp.take(strips, src_face, axis=-3)
    if partner is not None:
        # axis-swapping connections read the PARTNER component's edge
        strips_p = _edge_strips(partner, ny, nx)
        src_strips_p = jnp.take(strips_p, src_face, axis=-3)
        swap_side = jnp.asarray(plan.swap[:, side])  # (F,)
        src_strips = jnp.where(
            swap_side[:, None, None], src_strips_p, src_strips
        )
    # SELECT the source side, never multiply by a 0/1 one-hot: a NaN on a
    # non-selected edge of the source face would poison the sum (0*NaN),
    # diverging from the generic engine's exact NaN footprint
    side_sel = jnp.arange(4) == src_side[:, None]  # (F, 4) bool
    picked = jnp.sum(
        jnp.where(
            side_sel[:, :, None], src_strips, jnp.asarray(0.0, x.dtype)
        ),
        axis=-2,
    ).astype(x.dtype)  # undo jnp.sum's small-int promotion
    picked = jnp.where(tang_flip[:, None], picked[..., ::-1], picked)
    if vector_axis_code is not None:
        # sides 0/1 are x-axis halos, 2/3 y-axis halos
        is_parallel = vector_axis_code == (side // 2)
        sign = jnp.asarray(
            plan.sign_ortho[:, side] if is_parallel
            else plan.sign_tang[:, side]
        ).astype(x.dtype)
        picked = picked * sign[:, None]

    # basic BC for unconnected edges (within-face wrap / fill / extend)
    opposite = {0: 1, 1: 0, 2: 3, 3: 2}[side]
    if boundary in ("periodic", None):
        basic = strips[..., opposite, :]
    elif boundary == "fill":
        basic = jnp.full_like(strips[..., side, :], fill_value)
    elif boundary == "extend":
        basic = strips[..., side, :]
    elif boundary == "extrapolate":
        inward = _inward_line(x, side, ny, nx)
        basic = 2.0 * strips[..., side, :] - inward
    else:
        raise ValueError(f"unknown boundary {boundary!r}")

    halo = jnp.where(connected[:, None], picked, basic)  # (..., F, L)

    # Pallas kernel path for narrow faces; the concat formulation below is
    # the default elsewhere — measured on v5e (6x2048^2): the kernel and
    # the XLA concat+sub fusion both sit at the shifted-pattern ceiling
    # (~21 Ggps vs ~26 for a pure stream at that shape), but concat lets
    # XLA fuse the strip prep into the same pass (+10% end-to-end), while
    # at 13x1024^2 the kernel keeps a similar edge — so pick by lane width
    if x.ndim == 3 and x.shape[-1] < 2048:
        from .pallas_stencils import face_shift_op, supports_face_shift

        if supports_face_shift(x):
            return face_shift_op(x, halo, op, direction, axis_is_x)

    # concat formulation: the shifted neighbour IS [halo, x-minus-an-edge]
    # concatenated, which XLA fuses with the strip prep and the stencil
    # into one read+write pass — bit-identical to the roll + at[].set
    # sequence it replaces, and it serves bf16 and any leading batch dims
    if axis_is_x:
        if direction == "left":
            nb = jnp.concatenate([halo[..., :, None], x[..., :, :-1]], -1)
        else:
            nb = jnp.concatenate([x[..., :, 1:], halo[..., :, None]], -1)
    else:
        if direction == "left":
            nb = jnp.concatenate([halo[..., None, :], x[..., :-1, :]], -2)
        else:
            nb = jnp.concatenate([x[..., 1:, :], halo[..., None, :]], -2)
    return _apply_pair(op, direction, x, nb)
