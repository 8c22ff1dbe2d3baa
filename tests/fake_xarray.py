"""A minimal duck-typed stand-in for xarray, used ONLY by the adapter tests.

The build image has no xarray, so tests/test_xarray_adapter.py skips
entirely there.  This stub implements exactly the surface the adapter
consumes (``Dataset.coords/data_vars/sizes/attrs``, ``DataArray.data/dims/
name/attrs/assign_coords``) so the bridge logic — including the coordinate
reattachment rule ported from reference grid_ufunc.py:1195-1266 — runs in
CI regardless.  tests/test_xarray_adapter_stub.py installs this module as
``sys.modules["xarray"]`` and reloads the adapter around each test.

Not a general xarray replacement: no indexing, alignment, or lazy arrays.
"""

from __future__ import annotations

import numpy as np

__all__ = ["DataArray", "Dataset"]


def _as_dims(dims):
    if dims is None:
        return None
    if isinstance(dims, str):
        return (dims,)
    return tuple(dims)


class DataArray:
    def __init__(self, data, dims=None, name=None, attrs=None, coords=None):
        self.data = np.asarray(data)
        dims = _as_dims(dims)
        if dims is None:
            dims = tuple(f"dim_{i}" for i in range(self.data.ndim))
        if len(dims) != self.data.ndim:
            raise ValueError(f"dims {dims} do not match shape {self.data.shape}")
        self.dims = dims
        self.name = name
        self.attrs = dict(attrs) if attrs else {}
        self.coords = {
            k: _coerce_variable(k, v) for k, v in (coords or {}).items()
        }

    @property
    def values(self):
        return self.data

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def sizes(self):
        return dict(zip(self.dims, self.data.shape))

    def assign_coords(self, mapping=None, **kwargs):
        # real xarray VALIDATES assigned coordinates against the array's
        # dimension sizes and raises ValueError("conflicting sizes ...");
        # the adapter's padding-hint rewrap (xarray_adapter.py:141-150 =
        # reference grid_ufunc.py:1240-1248) catches exactly that message
        # prefix, so the stub must reproduce the behaviour
        mapping = dict(mapping or {})
        mapping.update(kwargs)
        out = DataArray(
            self.data, dims=self.dims, name=self.name, attrs=self.attrs,
            coords=self.coords,
        )
        sizes = self.sizes
        for k, v in mapping.items():
            var = _coerce_variable(k, v)
            for d, n in zip(var.dims, var.data.shape):
                if d not in sizes:
                    raise ValueError(
                        "cannot add coordinates with new dimensions to "
                        f"a DataArray: {d!r}"
                    )
                if sizes[d] != n:
                    raise ValueError(
                        f"conflicting sizes for dimension {d!r}: length "
                        f"{sizes[d]} on the data but length {n} on "
                        f"coordinate {k!r}"
                    )
            out.coords[k] = var
        return out

    def copy(self):
        return DataArray(
            self.data.copy(), dims=self.dims, name=self.name,
            attrs=self.attrs, coords=dict(self.coords),
        )

    def to_dataset(self, name=None):
        name = name or self.name
        if name is None:
            raise ValueError("unable to convert unnamed DataArray")
        return Dataset(
            data_vars={name: (self.dims, self.data, self.attrs)},
            coords=self.coords,
        )

    def drop_vars(self, names):
        if isinstance(names, str):
            names = [names]
        out = DataArray(
            self.data, dims=self.dims, name=self.name, attrs=self.attrs,
            coords={k: v for k, v in self.coords.items() if k not in names},
        )
        return out

    def __getitem__(self, key):
        return self.coords[key]

    # dim-name-based broadcasting arithmetic (the slice xarray ops the
    # adapter round-trip relies on: derivative's diff/metric, user math)
    def _binop(self, other, op, reflexive=False):
        if not isinstance(other, DataArray):
            data = op(other, self.data) if reflexive else op(self.data, other)
            return DataArray(
                data, dims=self.dims, name=self.name, coords=self.coords
            )
        all_dims = list(self.dims) + [
            d for d in other.dims if d not in self.dims
        ]

        def expand(da):
            data, dims = da.data, list(da.dims)
            for d in all_dims:
                if d not in dims:
                    data = data[None, ...]
                    dims = [d] + dims
            return np.transpose(data, [dims.index(d) for d in all_dims])

        a, b = expand(self), expand(other)
        data = op(b, a) if reflexive else op(a, b)
        coords = dict(other.coords)
        coords.update(self.coords)  # first (self) wins
        return DataArray(data, dims=all_dims, name=self.name, coords=coords)

    def __add__(self, other):
        return self._binop(other, lambda a, b: a + b)

    def __radd__(self, other):
        return self._binop(other, lambda a, b: a + b, reflexive=True)

    def __sub__(self, other):
        return self._binop(other, lambda a, b: a - b)

    def __rsub__(self, other):
        return self._binop(other, lambda a, b: a - b, reflexive=True)

    def __mul__(self, other):
        return self._binop(other, lambda a, b: a * b)

    def __rmul__(self, other):
        return self._binop(other, lambda a, b: a * b, reflexive=True)

    def __truediv__(self, other):
        return self._binop(other, lambda a, b: a / b)

    def __rtruediv__(self, other):
        return self._binop(other, lambda a, b: a / b, reflexive=True)


def _coerce_variable(name, value):
    """Accept a DataArray, the xarray tuple forms (dims, data) /
    (dims, data, attrs), or a bare array (xarray assigns it along the
    same-named dimension)."""
    if isinstance(value, DataArray):
        return DataArray(
            value.data, dims=value.dims, name=name, attrs=value.attrs
        )
    if (
        isinstance(value, tuple)
        and len(value) in (2, 3)
        and isinstance(value[0], (str, list, tuple))
    ):
        dims, data, *rest = value
        attrs = rest[0] if rest else None
        return DataArray(data, dims=_as_dims(dims), name=name, attrs=attrs)
    arr = np.asarray(value)
    return DataArray(arr, dims=(name,) if arr.ndim == 1 else None, name=name)


class Dataset:
    def __init__(self, data_vars=None, coords=None, attrs=None):
        self.data_vars = {
            k: _coerce_variable(k, v) for k, v in (data_vars or {}).items()
        }
        self.coords = {
            k: _coerce_variable(k, v) for k, v in (coords or {}).items()
        }
        self.attrs = dict(attrs) if attrs else {}
        sizes = {}
        for var in list(self.data_vars.values()) + list(self.coords.values()):
            for d, n in zip(var.dims, var.data.shape):
                if sizes.setdefault(d, n) != n:
                    raise ValueError(f"conflicting sizes for dim {d!r}")
        self.sizes = sizes

    def __getitem__(self, key):
        if key in self.data_vars:
            return self.data_vars[key]
        return self.coords[key]

    def __contains__(self, key):
        return key in self.data_vars or key in self.coords

    def __getattr__(self, key):
        # xarray-style attribute access to variables/coords; only called
        # when normal attribute lookup fails
        try:
            dv = object.__getattribute__(self, "data_vars")
            co = object.__getattribute__(self, "coords")
        except AttributeError:
            raise AttributeError(key)
        if key in dv:
            return dv[key]
        if key in co:
            return co[key]
        raise AttributeError(key)
