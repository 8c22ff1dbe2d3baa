"""JAX-native labeled array container.

This is the hot-path data model of xgcm_tpu: a thin pytree wrapping a
``jax.Array`` together with a static tuple of dimension *names*.  It replaces
the reference's use of ``xarray.DataArray`` (see ``/root/reference/xgcm``
throughout) in a form that is transparent to ``jax.jit`` — the array is the
only pytree leaf, the dims/name are static aux data, so every grid operation
traces to pure XLA with zero host overhead.

Coordinate *labels* deliberately do not live here.  Following the build plan
(SURVEY.md §7 "Coordinate/label fidelity"), coordinate bookkeeping is isolated
in :mod:`xgcm_tpu.core.dataset` and the optional xarray adapter, keeping this
container free of anything that would force host synchronisation.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["GriddedArray"]


@jax.tree_util.register_pytree_node_class
class GriddedArray:
    """An n-dimensional array with named dimensions.

    Parameters
    ----------
    data : array-like
        The underlying array (``jax.Array``, numpy array, or nested sequence).
    dims : sequence of str
        One name per axis of ``data``.
    name : str, optional
        Label used when attaching the result to a Dataset or naming outputs
        (mirrors ``xarray.DataArray.name`` usage in reference
        ``transform.py:224-228``).
    attrs : dict, optional
        Arbitrary metadata (used by the COMODO/SGRID parsers).
    """

    __slots__ = ("data", "dims", "name", "attrs")

    def __init__(
        self,
        data: Any,
        dims: Sequence[str],
        name: Optional[str] = None,
        attrs: Optional[Mapping[str, Any]] = None,
    ):
        if isinstance(data, GriddedArray):
            data = data.data
        if not isinstance(data, (jax.Array, np.ndarray)):
            data = np.asarray(data)
        dims = tuple(dims)
        if len(dims) != np.ndim(data):
            raise ValueError(
                f"dims {dims} has {len(dims)} entries but data has "
                f"{np.ndim(data)} dimensions"
            )
        if len(set(dims)) != len(dims):
            raise ValueError(f"duplicate dimension names in {dims}")
        self.data = data
        self.dims = dims
        self.name = name
        self.attrs = dict(attrs) if attrs else {}

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.data,), (self.dims, self.name)

    @classmethod
    def tree_unflatten(cls, aux, children):
        dims, name = aux
        (data,) = children
        obj = object.__new__(cls)
        obj.data = data
        obj.dims = dims
        obj.name = name
        obj.attrs = {}
        return obj

    # -- basic introspection ----------------------------------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.data.shape)

    @property
    def ndim(self) -> int:
        return len(self.dims)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def sizes(self) -> Dict[str, int]:
        return dict(zip(self.dims, self.data.shape))

    @property
    def size(self) -> int:
        out = 1
        for n in self.data.shape:
            out *= int(n)
        return out

    @property
    def values(self) -> np.ndarray:
        """Data as a numpy array (xarray-compatible accessor; forces a
        device-to-host transfer for jax arrays — keep off hot paths)."""
        return np.asarray(self.data)

    def get_axis_num(self, dim: str) -> int:
        try:
            return self.dims.index(dim)
        except ValueError:
            raise KeyError(f"dimension {dim!r} not found in {self.dims}")

    # -- functional label-preserving ops ----------------------------------
    def with_data(self, data, dims: Optional[Sequence[str]] = None) -> "GriddedArray":
        return GriddedArray(
            data, self.dims if dims is None else dims, name=self.name, attrs=self.attrs
        )

    def rename_dims(self, mapping: Mapping[str, str]) -> "GriddedArray":
        return self.with_data(
            self.data, dims=tuple(mapping.get(d, d) for d in self.dims)
        )

    def rename(self, name: Optional[str]) -> "GriddedArray":
        return GriddedArray(self.data, self.dims, name=name, attrs=self.attrs)

    def isel(self, indexers: Mapping[str, Any]) -> "GriddedArray":
        """Positional selection by dimension name (slices keep the dim,
        integers drop it) — the analog of ``xr.DataArray.isel``."""
        index: list = [slice(None)] * self.ndim
        out_dims = list(self.dims)
        dropped = []
        for dim, idx in indexers.items():
            ax = self.get_axis_num(dim)
            index[ax] = idx
            if isinstance(idx, int):
                dropped.append(dim)
        out_dims = [d for d in out_dims if d not in dropped]
        return GriddedArray(
            self.data[tuple(index)], out_dims, name=self.name, attrs=self.attrs
        )

    def transpose(self, *dims: str) -> "GriddedArray":
        if set(dims) != set(self.dims):
            raise ValueError(f"transpose dims {dims} do not match {self.dims}")
        perm = [self.dims.index(d) for d in dims]
        return GriddedArray(
            jnp.transpose(self.data, perm), dims, name=self.name, attrs=self.attrs
        )

    def expand_dims(self, dim: str, axis: int = 0) -> "GriddedArray":
        new_dims = list(self.dims)
        new_dims.insert(axis, dim)
        return GriddedArray(
            jnp.expand_dims(self.data, axis), new_dims, name=self.name, attrs=self.attrs
        )

    def flip(self, dim: str) -> "GriddedArray":
        ax = self.get_axis_num(dim)
        return self.with_data(jnp.flip(self.data, axis=ax))

    def move_dims_last(self, dims: Sequence[str]) -> "GriddedArray":
        """Transpose so that `dims` appear, in order, as the trailing axes."""
        rest = [d for d in self.dims if d not in dims]
        return self.transpose(*rest, *dims)

    # -- arithmetic --------------------------------------------------------
    def _binop(self, other, op):
        if isinstance(other, GriddedArray):
            a, b, dims = _broadcast_align(self, other)
            return GriddedArray(op(a, b), dims, name=self.name)
        return self.with_data(op(self.data, other))

    def __add__(self, other):
        return self._binop(other, jnp.add)

    def __radd__(self, other):
        return self.with_data(jnp.add(other, self.data))

    def __sub__(self, other):
        return self._binop(other, jnp.subtract)

    def __rsub__(self, other):
        return self.with_data(jnp.subtract(other, self.data))

    def __mul__(self, other):
        return self._binop(other, jnp.multiply)

    def __rmul__(self, other):
        return self.with_data(jnp.multiply(other, self.data))

    def __truediv__(self, other):
        return self._binop(other, jnp.divide)

    def __rtruediv__(self, other):
        return self.with_data(jnp.divide(other, self.data))

    def __neg__(self):
        return self.with_data(-self.data)

    def __abs__(self):
        return self.with_data(jnp.abs(self.data))

    def __pow__(self, other):
        return self._binop(other, jnp.power)

    def __rpow__(self, other):
        return self.with_data(jnp.power(other, self.data))

    def __mod__(self, other):
        return self._binop(other, jnp.mod)

    def __floordiv__(self, other):
        return self._binop(other, jnp.floor_divide)

    # comparisons return boolean masks with xarray-style broadcast
    # alignment — the everyday `da > 0` masking idiom
    def __lt__(self, other):
        return self._binop(other, jnp.less)

    def __le__(self, other):
        return self._binop(other, jnp.less_equal)

    def __gt__(self, other):
        return self._binop(other, jnp.greater)

    def __ge__(self, other):
        return self._binop(other, jnp.greater_equal)

    def __eq__(self, other):  # noqa: D105 — mask semantics, like xarray
        return self._binop(other, jnp.equal)

    def __ne__(self, other):
        return self._binop(other, jnp.not_equal)

    # mask semantics for == / != make GriddedArray unhashable, as in xarray
    __hash__ = None

    def where(self, cond, other=jnp.nan) -> "GriddedArray":
        """Elementwise select: keep self where ``cond`` else ``other``
        (xarray ``DataArray.where`` semantics, NaN default)."""
        cond_data = cond.data if isinstance(cond, GriddedArray) else cond
        if isinstance(cond, GriddedArray):
            a, c, dims = _broadcast_align(self, cond)
        else:
            a, c, dims = self.data, cond_data, self.dims
        o = other.data if isinstance(other, GriddedArray) else other
        return GriddedArray(
            jnp.where(c, a, o), dims, name=self.name, attrs=self.attrs
        )

    def clip(self, min=None, max=None) -> "GriddedArray":
        return self.with_data(jnp.clip(self.data, min, max))

    def isnan(self) -> "GriddedArray":
        return self.with_data(jnp.isnan(self.data))

    def fillna(self, value) -> "GriddedArray":
        """Replace NaNs (xarray ``DataArray.fillna``)."""
        return self.with_data(
            jnp.where(jnp.isnan(self.data), value, self.data)
        )

    def sum(self, dims: Union[str, Sequence[str], None] = None, **kwargs):
        return self._reduce(jnp.sum, dims, **kwargs)

    def mean(self, dims: Union[str, Sequence[str], None] = None, **kwargs):
        return self._reduce(jnp.mean, dims, **kwargs)

    def _reduce(self, fn, dims, **kwargs):
        if dims is None:
            return GriddedArray(fn(self.data, **kwargs), (), name=self.name)
        if isinstance(dims, str):
            dims = [dims]
        axes = tuple(self.get_axis_num(d) for d in dims)
        out_dims = tuple(d for d in self.dims if d not in dims)
        return GriddedArray(fn(self.data, axis=axes, **kwargs), out_dims, name=self.name)

    def cumsum(self, dim: str) -> "GriddedArray":
        """Inclusive prefix sum along a named dimension.

        Uses ``jnp.cumsum``, which XLA lowers to a logarithmic-depth parallel
        scan — natively parallel where the reference's dask version could not
        chunk (reference ``grid.py:682-684``)."""
        return self.with_data(jnp.cumsum(self.data, axis=self.get_axis_num(dim)))

    def astype(self, dtype) -> "GriddedArray":
        return self.with_data(self.data.astype(dtype))

    def __repr__(self):
        return (
            f"<GriddedArray {self.name or ''}{dict(zip(self.dims, self.shape))} "
            f"dtype={self.dtype}>"
        )


def _broadcast_align(a: GriddedArray, b: GriddedArray):
    """Align two GriddedArrays by dimension name for broadcasting.

    Output dims are a's dims followed by b's extra dims (order of first
    appearance, matching xarray's broadcasting convention closely enough for
    the metric-weighting paths in reference ``grid.py:675-677``).
    """
    out_dims = list(a.dims) + [d for d in b.dims if d not in a.dims]
    ad = _expand_to(a, out_dims)
    bd = _expand_to(b, out_dims)
    return ad, bd, tuple(out_dims)


def _expand_to(x: GriddedArray, out_dims: Sequence[str]):
    """Reshape x.data so its dims line up with out_dims (size-1 for missing)."""
    shape = [1] * len(out_dims)
    for d in x.dims:
        if d not in out_dims:
            raise ValueError(f"dim {d} missing from target dims {out_dims}")
    # transpose x's dims into the order they appear in out_dims
    ordered = [d for d in out_dims if d in x.dims]
    x = x.transpose(*ordered)
    for i, d in enumerate(out_dims):
        if d in x.dims:
            shape[i] = x.sizes[d]
    return jnp.reshape(x.data, shape)

