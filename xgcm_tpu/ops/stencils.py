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
    "diff_forward",
    "interp_forward",
    "pairwise_min",
    "pairwise_max",
    "cumsum_trim_last",
    "cumsum_full",
]


def diff_forward(a):
    """a[..., i+1] - a[..., i]  (reference gridops.py:23-24)."""
    return a[..., 1:] - a[..., :-1]


def interp_forward(a):
    """Two-point average (reference gridops.py:77-78)."""
    return (a[..., :-1] + a[..., 1:]) * 0.5


def pairwise_min(a):
    """Minimum of adjacent points (reference gridops.py:124-127)."""
    return jnp.minimum(a[..., :-1], a[..., 1:])


def pairwise_max(a):
    """Maximum of adjacent points (reference gridops.py:173-176)."""
    return jnp.maximum(a[..., :-1], a[..., 1:])


def cumsum_full(a):
    """Inclusive scan along the last axis.

    ``jnp.cumsum`` lowers to XLA's parallel prefix scan — the operation the
    reference had to special-case out of its chunked path entirely
    (reference grid.py:682-684)."""
    return jnp.cumsum(a, axis=-1)


def cumsum_trim_last(a):
    """Inclusive scan dropping the final element (reference gridops.py:229)."""
    return jnp.cumsum(a, axis=-1)[..., :-1]
