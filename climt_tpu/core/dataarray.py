"""Units-aware labeled array.

The reference uses ``sympl.DataArray`` (an xarray.DataArray subclass with a
``to_units`` method; see /root/reference/docs/interaction.rst).  Neither
xarray nor pint exists in this environment, and a full xarray is the wrong
tool for a compiled model anyway: this class is a *thin host-side label* —
(array, dims, attrs) — used at model-build and IO time.  Inside the compiled
step, state is a plain pytree of raw arrays; DataArrays never cross into jit.

Wrapped values may be numpy arrays (mutable host state) or jax Arrays
(device state); all operations dispatch on the wrapped array's own namespace.
"""

from __future__ import annotations

import numpy as np

from .units import conversion_factor, units_are_same


class DataArray:
    __slots__ = ('values', 'dims', 'attrs', 'name')

    def __init__(self, values, dims=None, attrs=None, name=None):
        if isinstance(values, DataArray):
            dims = dims if dims is not None else values.dims
            attrs = attrs if attrs is not None else values.attrs
            values = values.values
        if np.isscalar(values) or (hasattr(values, 'ndim')
                                   and values.ndim == 0):
            values = np.asarray(values)
        self.values = values
        if dims is None:
            dims = tuple('dim_{}'.format(i) for i in range(values.ndim))
        dims = tuple(dims)
        if len(dims) != values.ndim:
            raise ValueError(
                'dims {} do not match array of rank {}'.format(
                    dims, values.ndim))
        self.dims = dims
        self.attrs = dict(attrs) if attrs else {}
        self.name = name

    # -- basic array protocol -------------------------------------------------
    @property
    def shape(self):
        return self.values.shape

    @property
    def ndim(self):
        return self.values.ndim

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def size(self):
        return self.values.size

    def __len__(self):
        return len(self.values)

    def __array__(self, dtype=None):
        return np.asarray(self.values, dtype=dtype)

    @property
    def units(self):
        return self.attrs.get('units', 'dimensionless')

    # -- units ---------------------------------------------------------------
    def to_units(self, units: str) -> 'DataArray':
        """Return a new DataArray converted to the given units."""
        if units_are_same(self.units, units):
            out = DataArray(self.values, self.dims, self.attrs, self.name)
            out.attrs['units'] = units
            return out
        scale, shift = conversion_factor(self.units, units)
        values = self.values * scale
        if shift != 0.0:
            values = values + shift
        attrs = dict(self.attrs)
        attrs['units'] = units
        return DataArray(values, self.dims, attrs, self.name)

    # -- xarray-compatible helpers -------------------------------------------
    def transpose(self, *dims) -> 'DataArray':
        if not dims:
            dims = self.dims[::-1]
        axes = [self.dims.index(d) for d in dims]
        xp = _namespace_of(self.values)
        return DataArray(xp.transpose(self.values, axes), dims, self.attrs,
                         self.name)

    def rename(self, name) -> 'DataArray':
        return DataArray(self.values, self.dims, self.attrs, name)

    def copy(self) -> 'DataArray':
        values = self.values
        values = values.copy() if isinstance(values, np.ndarray) else values
        return DataArray(values, self.dims, self.attrs, self.name)

    def mean(self, axis=None, **kw):
        result = self.values.mean(axis=axis, **kw)
        return self._reduce_result(result, axis)

    def sum(self, axis=None, **kw):
        result = self.values.sum(axis=axis, **kw)
        return self._reduce_result(result, axis)

    def min(self, axis=None, **kw):
        return self._reduce_result(self.values.min(axis=axis, **kw), axis)

    def max(self, axis=None, **kw):
        return self._reduce_result(self.values.max(axis=axis, **kw), axis)

    def _reduce_result(self, result, axis):
        if axis is None:
            return DataArray(result, (), self.attrs, self.name)
        if isinstance(axis, int):
            axis = (axis,)
        axis = tuple(a % self.ndim for a in axis)
        dims = tuple(d for i, d in enumerate(self.dims) if i not in axis)
        return DataArray(result, dims, self.attrs, self.name)

    # -- indexing ------------------------------------------------------------
    def __getitem__(self, key):
        if not isinstance(key, tuple):
            key = (key,)
        # expand Ellipsis
        if Ellipsis in key:
            i = key.index(Ellipsis)
            n_explicit = len([k for k in key if k is not Ellipsis])
            key = (key[:i] + (slice(None),) * (self.ndim - n_explicit)
                   + key[i + 1:])
        new_dims = []
        di = 0
        for k in key:
            if isinstance(k, (int, np.integer)):
                di += 1
            elif k is None:
                new_dims.append('dim_new_{}'.format(len(new_dims)))
            else:
                new_dims.append(self.dims[di])
                di += 1
        new_dims.extend(self.dims[di:])
        return DataArray(self.values[key], tuple(new_dims), self.attrs,
                         self.name)

    def __setitem__(self, key, value):
        if isinstance(value, DataArray):
            value = value.values
        self.values[key] = value

    # -- arithmetic (dims/attrs follow the left operand) ----------------------
    def _binop(self, other, op, keep_units):
        ov = other.values if isinstance(other, DataArray) else other
        result = op(self.values, ov)
        attrs = dict(self.attrs) if keep_units else {}
        dims = self.dims
        if hasattr(result, 'ndim') and result.ndim != self.ndim:
            if (isinstance(other, DataArray)
                    and result.ndim == other.values.ndim):
                dims = other.dims
            else:
                dims = None
        return DataArray(result, dims, attrs, self.name)

    def __add__(self, o):
        return self._binop(o, lambda a, b: a + b, True)

    def __radd__(self, o):
        return self._binop(o, lambda a, b: b + a, True)

    def __sub__(self, o):
        return self._binop(o, lambda a, b: a - b, True)

    def __rsub__(self, o):
        return self._binop(o, lambda a, b: b - a, True)

    def __mul__(self, o):
        return self._binop(o, lambda a, b: a * b, False)

    def __rmul__(self, o):
        return self._binop(o, lambda a, b: b * a, False)

    def __truediv__(self, o):
        return self._binop(o, lambda a, b: a / b, False)

    def __rtruediv__(self, o):
        return self._binop(o, lambda a, b: b / a, False)

    def __pow__(self, o):
        return self._binop(o, lambda a, b: a ** b, False)

    def __neg__(self):
        return DataArray(-self.values, self.dims, self.attrs, self.name)

    def __abs__(self):
        return DataArray(abs(self.values), self.dims, self.attrs, self.name)

    def __iadd__(self, o):
        ov = o.values if isinstance(o, DataArray) else o
        if isinstance(self.values, np.ndarray):
            self.values += ov
        else:
            self.values = self.values + ov
        return self

    def __isub__(self, o):
        ov = o.values if isinstance(o, DataArray) else o
        if isinstance(self.values, np.ndarray):
            self.values -= ov
        else:
            self.values = self.values - ov
        return self

    def __imul__(self, o):
        ov = o.values if isinstance(o, DataArray) else o
        if isinstance(self.values, np.ndarray):
            self.values *= ov
        else:
            self.values = self.values * ov
        return self

    # comparisons return raw boolean arrays (like xarray's .values semantics)
    def __eq__(self, o):
        return self.values == (o.values if isinstance(o, DataArray) else o)

    def __ne__(self, o):
        return self.values != (o.values if isinstance(o, DataArray) else o)

    def __lt__(self, o):
        return self.values < (o.values if isinstance(o, DataArray) else o)

    def __le__(self, o):
        return self.values <= (o.values if isinstance(o, DataArray) else o)

    def __gt__(self, o):
        return self.values > (o.values if isinstance(o, DataArray) else o)

    def __ge__(self, o):
        return self.values >= (o.values if isinstance(o, DataArray) else o)

    def __hash__(self):
        return id(self)

    def __repr__(self):
        return ('<DataArray {} dims={} units={!r}>\n{}'.format(
            'x'.join(str(s) for s in self.shape), self.dims, self.units,
            self.values))


def _namespace_of(values):
    if isinstance(values, np.ndarray):
        return np
    import jax.numpy as jnp
    return jnp
