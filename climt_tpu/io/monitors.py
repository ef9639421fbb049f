"""Monitors: streaming model output to NetCDF files and live plots.

Behavioral parity with the sympl monitors the reference uses
(/root/reference/examples/gmd_aquaplanet.py:43-46): ``NetCDFMonitor`` with
``store_names`` filtering and ``write_on_store`` appending, and
``PlotFunctionMonitor`` calling a user function with a matplotlib figure.

NetCDF output uses scipy's NetCDF-3 writer (self-contained, the same
format the reference's regression caches use); fields are gathered to host
numpy at store time.
"""

from __future__ import annotations

import datetime
import os

import numpy as np

from ..core.dataarray import DataArray


class NetCDFMonitor:
    """Accumulates states and writes them to a NetCDF file.

    Args:
        filename: output path.
        store_names: optional iterable restricting which quantities are
            stored.
        write_on_store: if True, every store call lands on disk before
            the next model step can be lost (crash-safe appending
            semantics).
        time_units: units string for the time axis.
        backend: 'auto' (default), 'native', or 'scipy'.  With
            ``write_on_store`` the 'native' backend streams each record
            through the _fastio C extension (io/native.py): appends are
            O(record) and performed by a writer pthread off the step
            loop, where the scipy path rewrites the whole file per store
            (O(n^2) over a run).  'auto' uses the native writer when the
            extension builds, else falls back to scipy; 'native' raises
            if unavailable.
    """

    def __init__(self, filename, store_names=None, write_on_store=False,
                 time_units='seconds', backend='auto'):
        if backend not in ('auto', 'native', 'scipy'):
            raise ValueError('backend must be auto|native|scipy')
        self._filename = filename
        self._store_names = set(store_names) if store_names else None
        self._write_on_store = write_on_store
        self._time_units = time_units
        self._backend = backend
        self._snapshots = []
        self._reference_time = None
        self._writer = None         # AsyncNetCDFWriter once streaming
        self._count = 0

    def _want_native(self):
        return self._write_on_store and self._backend in ('auto', 'native')

    def _open_native(self, snapshot):
        """Fix the schema from the first snapshot and open the streaming
        writer; returns False (with scipy fallback arranged) when the
        extension is unavailable and backend='auto'."""
        from .native import AsyncNetCDFWriter
        dim_sizes = {}
        variables = []
        for name, (arr, dims, units) in snapshot.items():
            for d, s in zip(dims, arr.shape):
                if dim_sizes.setdefault(d, s) != s:
                    raise ValueError(
                        'dimension {!r} has conflicting sizes'.format(d))
            variables.append((name, tuple(dims), units))
        try:
            self._writer = AsyncNetCDFWriter(
                self._filename, list(dim_sizes.items()), variables)
        except RuntimeError:
            if self._backend == 'native':
                raise
            self._backend = 'scipy'
            return False
        return True

    def store(self, state):
        time = state.get('time')
        if self._reference_time is None:
            self._reference_time = time
        snapshot = {}
        for name, value in state.items():
            if name == 'time':
                continue
            if self._store_names and name not in self._store_names:
                continue
            if isinstance(value, DataArray):
                arr = np.asarray(value.values)
                if arr.dtype.kind in 'fiu':
                    snapshot[name] = (arr.copy(), value.dims, value.units)
        if isinstance(time, datetime.datetime) and isinstance(
                self._reference_time, datetime.datetime):
            seconds = (time - self._reference_time).total_seconds()
        else:
            seconds = float(self._count)
        self._count += 1
        if self._want_native():
            if self._writer is None and not self._open_native(snapshot):
                pass                        # fell back to scipy below
            if self._writer is not None:
                self._writer.append(
                    seconds, {n: a for n, (a, _, _) in snapshot.items()})
                return
        self._snapshots.append((seconds, snapshot))
        if self._write_on_store:
            self.write()

    def write(self):
        """Flush everything stored so far to disk.

        Streaming (native) mode: block until the writer thread has
        drained its queue.  Buffered (scipy) mode: rewrite the file with
        all accumulated snapshots.
        """
        if self._writer is not None:
            self._writer.flush()
            return
        from scipy.io import netcdf_file
        if not self._snapshots:
            return
        f = netcdf_file(self._filename, 'w', mmap=False)
        try:
            n_time = len(self._snapshots)
            f.createDimension('time', n_time)
            times = f.createVariable('time', 'd', ('time',))
            times[:] = [s for s, _ in self._snapshots]
            times.units = 'seconds since start'

            first = self._snapshots[0][1]
            dim_sizes = {}
            for name, (arr, dims, units) in first.items():
                for d, s in zip(dims, arr.shape):
                    dim_sizes.setdefault(d, s)
            for d, s in dim_sizes.items():
                f.createDimension(d, s)

            for name, (arr0, dims, units) in first.items():
                var = f.createVariable(name, 'd', ('time',) + tuple(dims))
                data = np.stack(
                    [snap[name][0] for _, snap in self._snapshots])
                var[:] = data
                var.units = units.encode() if isinstance(units, str) \
                    else units
        finally:
            f.close()

    def close(self):
        """Finalize the file.  Streaming mode patches the netCDF record
        count (left at the STREAMING sentinel while open so a crash
        leaves a readable file); buffered mode performs a final write."""
        if self._writer is not None:
            self._writer.close()
            self._writer = None
        elif not self._write_on_store:
            self.write()


class PlotFunctionMonitor:
    """Calls a user plotting function with (figure, state) on store.

    Works headless (Agg backend) when no display is available; set
    ``interactive=False`` to only save figures via the user function.
    """

    def __init__(self, plot_function, interactive=True):
        import matplotlib
        if not os.environ.get('DISPLAY'):
            matplotlib.use('Agg')
            interactive = False
        import matplotlib.pyplot as plt
        self._plt = plt
        self._plot_function = plot_function
        self._interactive = interactive
        if interactive:
            plt.ion()
        self._figure = plt.figure()

    def store(self, state):
        self._figure.clear()
        self._plot_function(self._figure, state)
        if self._interactive:
            self._figure.canvas.draw()
            self._plt.pause(0.001)


class RestartMonitor:
    """Checkpoint/resume of the full model state.

    State arrays are saved as an .npz plus a small metadata sidecar;
    ``load`` reconstructs the dict of labeled DataArrays.  (For sharded
    device states the compiled-model path checkpoints the raw pytree with
    the same format after gathering.)
    """

    def __init__(self, filename):
        self._filename = filename

    def store(self, state):
        arrays = {}
        meta = {}
        for name, value in state.items():
            if name == 'time':
                if isinstance(value, datetime.datetime):
                    meta['time'] = value.isoformat()
                continue
            if isinstance(value, DataArray):
                arrays[name] = np.asarray(value.values)
                meta[name] = {'dims': list(value.dims),
                              'units': value.units}
        import json
        np.savez(self._filename, **arrays)
        with open(self._filename + '.meta.json', 'w') as fh:
            json.dump(meta, fh)

    def load(self):
        import json
        path = self._filename
        if not path.endswith('.npz'):
            path = path + '.npz'
        with open(self._filename + '.meta.json') as fh:
            meta = json.load(fh)
        data = np.load(path, allow_pickle=False)
        state = {}
        for name in data.files:
            info = meta[name]
            state[name] = DataArray(
                data[name], tuple(info['dims']),
                {'units': info['units']}, name)
        if 'time' in meta:
            state['time'] = datetime.datetime.fromisoformat(meta['time'])
        return state
