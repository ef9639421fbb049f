"""Utilities for comparing component outputs against the reference
regression caches (/root/reference/tests/cached_component_output/*.cache,
NetCDF classic files written by the reference's test harness,
/root/reference/tests/test_components.py:34-43).

Each cache file holds one output dict (tendencies / diagnostics / new_state,
in the component's return order) as netCDF variables with a ``units``
attribute.  We compare by variable name with per-test tolerances.
"""

from __future__ import annotations

import glob
import os

import numpy as np
from scipy.io import netcdf_file

CACHE_DIR = '/root/reference/tests/cached_component_output'

reference_available = os.path.isdir(CACHE_DIR)


REPAIRED_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'repaired_caches')


def load_cache(filename):
    """Load one cache file -> {name: (array, units, dims)}.

    If a repaired copy exists in tests/repaired_caches/ (written by
    tools/repair_dcmip_cache.py for a cache whose on-mirror bytes are
    corrupted), it is preferred over the mirror file.
    """
    repaired = os.path.join(REPAIRED_DIR, os.path.basename(filename))
    if os.path.exists(repaired):
        filename = repaired
    f = netcdf_file(filename, 'r', mmap=False)
    out = {}
    for name, var in f.variables.items():
        units = getattr(var, 'units', b'')
        if isinstance(units, bytes):
            units = units.decode()
        out[name] = (np.array(var.data), units, var.dimensions)
    f.close()
    return out


def load_cached_outputs(test_name, descriptor):
    """Load the ordered list of cached output dicts for a reference test."""
    pattern = os.path.join(
        CACHE_DIR, '{}-{}-*.cache'.format(test_name, descriptor))
    files = sorted(glob.glob(pattern))
    if not files:
        raise FileNotFoundError(pattern)
    return [load_cache(f) for f in files]


def compare_dict(current, cached, rtol=1e-6, atol=1e-10, context='',
                 ignore=()):
    """Compare a dict of DataArrays against one cached dict.

    Alignment is by dim name: the current array is transposed so its dims
    match the cached variable's dims (the reference harness proves outputs
    are layout-independent, tests/test_components.py:216-250).
    """
    for name, (cached_values, cached_units, cached_dims) in cached.items():
        if name == 'time' or name in ignore:
            continue
        assert name in current, \
            '{}: missing output {!r} (have {})'.format(
                context, name, sorted(current.keys()))
        value = current[name]
        if cached_units and value.units != cached_units:
            value = value.to_units(cached_units)
        if cached_values.dtype.kind == 'S':
            # netCDF stores strings as fixed-width char arrays: join the
            # trailing char axis and compare as strings
            joined = cached_values.view('S{}'.format(
                cached_values.shape[-1])).squeeze(-1)
            decoded = np.char.decode(joined)
            current_str = np.asarray(value.values).astype(str)
            assert np.array_equal(
                np.sort(current_str.ravel()), np.sort(decoded.ravel())), \
                '{}: string mismatch in {!r}'.format(context, name)
            continue
        arr = value
        # align dims by name where possible
        if set(value.dims) == set(cached_dims) and value.dims != tuple(
                cached_dims):
            arr = value.transpose(*cached_dims)
        np.testing.assert_allclose(
            np.asarray(arr.values), cached_values,
            rtol=_tol_for(rtol, name), atol=_tol_for(atol, name),
            err_msg='{}: mismatch in {!r}'.format(context, name))
    for name in current:
        if name == 'time' or name in ignore:
            continue
        assert name in cached, \
            '{}: extra output {!r} not in cache (cache has {})'.format(
                context, name, sorted(cached.keys()))


def _tol_for(tol, name):
    """Per-quantity tolerance: a plain float applies to every field; a
    dict maps substrings of the quantity name to values, with
    'default' as the fallback (e.g. flux vs heating-rate scales for the
    LW surrogate families)."""
    if isinstance(tol, dict):
        for key, v in tol.items():
            if key != 'default' and key in name:
                return v
        return tol['default']
    return tol


def compare_outputs(output, cached_list, rtol=1e-6, atol=1e-10, context='',
                    ignore=()):
    """Compare a component's output (dict or tuple of dicts) against the
    ordered cached dicts."""
    if isinstance(output, dict):
        output = (output,)
    assert len(output) == len(cached_list), \
        '{}: produced {} dicts, cache has {}'.format(
            context, len(output), len(cached_list))
    for i, (cur, cac) in enumerate(zip(output, cached_list)):
        compare_dict(cur, cac, rtol=rtol, atol=atol,
                     context='{}[{}]'.format(context, i), ignore=ignore)
