"""Last-axis stencil kernel bodies (XLA path).

These are the operator cores that grid ufuncs wrap, acting along the **last**
array axis by convention (the engine transposes core dims to the end first,
matching the reference's "function acts along the last axis" rule,
``docs/grid_ufuncs.md``).  Each body is a pure ``jnp`` function: under ``jit``
XLA fuses the preceding pad and the stencil into one HBM-bandwidth-bound
kernel, which replaces the reference's numpy slice arithmetic
(``gridops.py:23-127``) and is the always-correct fallback for the fused
Pallas kernels in :mod:`xgcm_tpu.ops.pallas_stencils`.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "PAIR_OPS",
    "apply_pair",
    "diff_forward",
    "interp_forward",
    "pairwise_min",
    "pairwise_max",
    "cumsum_trim_last",
    "cumsum_full",
]

# THE single home for the 2-point stencil semantics (reference
# gridops.py:23-24 diff, :77-78 interp, :124-127 min, :173-176 max).
# ``lo`` is the lower-index neighbour, ``hi`` the higher-index one; every
# consumer (engine kernels below, the sharded-halo stencil in
# parallel/halo.py, the fused roll path in ops/fused.py) phrases its
# operands in those terms so a semantics fix lands everywhere at once.
PAIR_OPS = {
    "diff": lambda lo, hi: hi - lo,
    "interp": lambda lo, hi: (hi + lo) * 0.5,
    "min": jnp.minimum,
    "max": jnp.maximum,
}


def apply_pair(op: str, lo, hi):
    """Apply a named 2-point op to (lower-index, higher-index) operands."""
    try:
        return PAIR_OPS[op](lo, hi)
    except KeyError:
        raise ValueError(f"unknown op {op!r}") from None


def diff_forward(a):
    """a[..., i+1] - a[..., i]  (reference gridops.py:23-24)."""
    return PAIR_OPS["diff"](a[..., :-1], a[..., 1:])


def interp_forward(a):
    """Two-point average (reference gridops.py:77-78)."""
    return PAIR_OPS["interp"](a[..., :-1], a[..., 1:])


def pairwise_min(a):
    """Minimum of adjacent points (reference gridops.py:124-127)."""
    return PAIR_OPS["min"](a[..., :-1], a[..., 1:])


def pairwise_max(a):
    """Maximum of adjacent points (reference gridops.py:173-176)."""
    return PAIR_OPS["max"](a[..., :-1], a[..., 1:])


def cumsum_full(a):
    """Inclusive scan along the last axis.

    ``jnp.cumsum`` lowers to XLA's parallel prefix scan — the operation the
    reference had to special-case out of its chunked path entirely
    (reference grid.py:682-684)."""
    return jnp.cumsum(a, axis=-1)


def cumsum_trim_last(a):
    """Inclusive scan dropping the final element (reference gridops.py:229)."""
    return jnp.cumsum(a, axis=-1)[..., :-1]
