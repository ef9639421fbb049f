"""Native async NetCDF writer: build/load of the _fastio C extension.

The C extension (io/_fastio.c) owns the record-append data path: a
writer pthread drains a bounded queue and performs byte-swapped,
GIL-free appends.  This module owns the cold metadata path in Python:

- building the extension with the system compiler on first use (no pip
  available in this environment; the .so is cached next to the source
  and rebuilt when _fastio.c changes);
- constructing the NetCDF classic (CDF-2, 64-bit offset) header for a
  fixed schema of f8 record variables, with numrecs=STREAMING so a
  crash mid-run leaves a well-defined file (close() finalizes it).

``AsyncNetCDFWriter`` is the user-facing class; ``NetCDFMonitor``
(io/monitors.py) routes through it when the extension is available.
"""

from __future__ import annotations

import os
import struct
import subprocess
import sys
import sysconfig

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, '_fastio.c')

NC_DIMENSION = 0x0A
NC_VARIABLE = 0x0B
NC_ATTRIBUTE = 0x0C
NC_CHAR = 2
NC_DOUBLE = 6
STREAMING = 0xFFFFFFFF

_module = None
_build_error = None


def _so_path():
    suffix = sysconfig.get_config_var('EXT_SUFFIX') or '.so'
    return os.path.join(_HERE, '_fastio' + suffix)


def _build():
    so = _so_path()
    if (os.path.exists(so)
            and os.path.getmtime(so) >= os.path.getmtime(_SRC)):
        return so
    cc = (sysconfig.get_config_var('CC') or 'cc').split()
    include = sysconfig.get_paths()['include']
    cmd = cc + ['-O2', '-fPIC', '-shared', '-pthread',
                '-I' + include, _SRC, '-o', so]
    subprocess.run(cmd, check=True, capture_output=True)
    return so


def load_fastio():
    """Import the C extension, building it on first use.

    Returns the module, or None when no working compiler exists (the
    monitor then falls back to the pure-Python scipy writer).
    """
    global _module, _build_error
    if _module is not None or _build_error is not None:
        return _module
    try:
        _build()
        if _HERE not in sys.path:
            sys.path.insert(0, _HERE)
        import _fastio
        _module = _fastio
    except Exception as exc:                    # no compiler / bad env
        _build_error = exc
        _module = None
    return _module


def _pad4(b):
    return b + b'\x00' * ((4 - len(b) % 4) % 4)


def _name(s):
    b = s.encode()
    return struct.pack('>I', len(b)) + _pad4(b)


def build_header(dims, variables):
    """NetCDF CDF-2 header for f8 record variables.

    Args:
      dims: list of (name, size) for the fixed dimensions, in id order;
        the record dimension 'time' (size 0) is prepended automatically.
      variables: list of (name, dim_names, units); every variable is a
        record variable of doubles with dims ('time',) + dim_names.
        'time' itself is added first with units 'seconds since start'.
    Returns:
      (header_bytes, record_size_bytes)
    """
    all_dims = [('time', 0)] + list(dims)
    dim_ids = {n: i for i, (n, _) in enumerate(all_dims)}
    dim_sizes = dict(all_dims)

    out = [b'CDF\x02', struct.pack('>I', STREAMING)]
    out.append(struct.pack('>II', NC_DIMENSION, len(all_dims)))
    for n, size in all_dims:
        out.append(_name(n) + struct.pack('>I', size))
    out.append(struct.pack('>II', 0, 0))        # no global attributes

    all_vars = ([('time', (), 'seconds since start')]
                + [(n, tuple(dn), u) for n, dn, u in variables])
    out.append(struct.pack('>II', NC_VARIABLE, len(all_vars)))

    # per-variable record sizes (vsize, padded to 4 — doubles: no pad)
    vsizes = []
    for n, dnames, units in all_vars:
        count = 1
        for d in dnames:
            count *= dim_sizes[d]
        vsizes.append(count * 8)
    recsize = sum(vsizes)

    # header size must be known to place begins: assemble var entries
    # with a placeholder pass first
    def var_entry(n, dnames, units, begin):
        e = [_name(n)]
        dids = ('time',) + dnames if False else ('time',) + dnames
        e.append(struct.pack('>I', len(dids)))
        for d in dids:
            e.append(struct.pack('>I', dim_ids[d]))
        ub = units.encode() if isinstance(units, str) else bytes(units)
        e.append(struct.pack('>II', NC_ATTRIBUTE, 1))
        e.append(_name('units'))
        e.append(struct.pack('>II', NC_CHAR, len(ub)))
        e.append(_pad4(ub))
        e.append(struct.pack('>I', NC_DOUBLE))
        e.append(struct.pack('>I', vsizes[all_vars.index((n, dnames,
                                                          units))]))
        e.append(struct.pack('>Q', begin))      # CDF-2: 64-bit begin
        return b''.join(e)

    placeholder = b''.join(var_entry(n, d, u, 0) for n, d, u in all_vars)
    header_size = sum(len(b) for b in out) + len(placeholder)

    begins = []
    off = header_size
    for vs in vsizes:
        begins.append(off)
        off += vs
    final = b''.join(var_entry(n, d, u, bg)
                     for (n, d, u), bg in zip(all_vars, begins))
    return b''.join(out) + final, recsize


class AsyncNetCDFWriter:
    """Streaming record appender over the _fastio extension.

    One append() per model store: hands the record to the C writer
    thread and returns; flush() blocks until everything queued is on
    disk; close() finalizes numrecs in the header.
    """

    def __init__(self, filename, dims, variables):
        fastio = load_fastio()
        if fastio is None:
            raise RuntimeError(
                'native writer unavailable: {}'.format(_build_error))
        self._fastio = fastio
        header, self.record_size = build_header(dims, variables)
        self._var_names = [n for n, _, _ in variables]
        self._handle = fastio.open(filename, header)
        self.records = 0

    def append(self, time_seconds, fields):
        """fields: {name: ndarray} matching the declared schema."""
        parts = [np.asarray([time_seconds], '=f8').tobytes()]
        for n in self._var_names:
            parts.append(np.ascontiguousarray(
                fields[n], dtype='=f8').tobytes())
        rec = b''.join(parts)
        # record_size (from build_header) already counts the leading
        # time scalar's 8 bytes
        if len(rec) != self.record_size:
            raise ValueError('record size mismatch: got {} expected {}'
                             .format(len(rec), self.record_size))
        self._fastio.append(self._handle, rec)
        self.records += 1

    def flush(self):
        return self._fastio.flush(self._handle)

    def close(self):
        if self._handle is not None:
            n = self._fastio.close(self._handle)
            self._handle = None
            return n
