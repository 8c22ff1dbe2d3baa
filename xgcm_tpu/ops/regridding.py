"""Legacy vertical binning regridder.

Parity with reference ``regridding.py:10-74`` (the pre-``transform`` vertical
binner, kept in the reference tree but not exported): values of ``q`` are
accumulated into tracer bins per column.  The reference's per-column
``np.digitize`` + ``np.bincount`` loop becomes a single vectorized
``searchsorted`` + one-hot ``segment-sum`` expressed as a matmul over the
(small) bin dimension — batched onto the MXU, no Python loops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.dataarray import GriddedArray

__all__ = ["regrid_vertical"]


def _regrid_vertical(q, tr, trlevs, axis=0):
    """Bin ``q`` by the values of co-located tracer ``tr`` along ``axis``.

    Values below the first bin clip into bin 0, values at/above the last
    edge clip into the final bin (matching reference regridding.py:57-61).
    """
    q = jnp.asarray(q)
    tr = jnp.asarray(tr)
    trlevs = jnp.asarray(trlevs)
    if q.shape != tr.shape:
        raise ValueError("q and tr must have the same shape")
    nbins = trlevs.shape[0] - 1

    q = jnp.moveaxis(q, axis, -1)
    tr = jnp.moveaxis(tr, axis, -1)

    idx = jnp.searchsorted(trlevs, tr, side="right") - 1
    idx = jnp.clip(idx, 0, nbins - 1)

    # one-hot accumulate: out[..., b] = sum_k q[..., k] * [idx[..., k] == b],
    # realised as select-then-sum: an einsum against a 0/1 one-hot would
    # (a) spread a NaN q value into EVERY bin via 0*NaN where the
    # reference's np.bincount confines it to its own bin
    # (regridding.py:33-74), and (b) ride the MXU, whose default f32
    # precision is a single bf16 pass on TPU
    member = idx[..., None] == jnp.arange(nbins)
    out = jnp.sum(
        jnp.where(member, q[..., None], jnp.asarray(0, q.dtype)), axis=-2
    ).astype(q.dtype)
    return jnp.moveaxis(out, -1, axis)


def regrid_vertical(q: GriddedArray, tr: GriddedArray, trlevs, dim: str):
    """Regrid ``q`` (co-located with tracer ``tr``) onto tracer bins.

    Returns a GriddedArray whose ``dim`` is replaced by ``<tr.name>_coord``
    with ``len(trlevs) - 1`` cells (centres at bin midpoints, available via
    the returned array's ``attrs["bin_centers"]``).
    """
    trlevs = np.asarray(trlevs)
    ax = q.get_axis_num(dim)
    data = _regrid_vertical(q.data, tr.data, trlevs, axis=ax)
    new_dim = (tr.name or "tracer") + "_coord"
    dims = tuple(new_dim if d == dim else d for d in q.dims)
    centers = 0.5 * (trlevs[1:] + trlevs[:-1])
    return GriddedArray(
        data, dims, name=q.name, attrs={"bin_centers": centers}
    )
