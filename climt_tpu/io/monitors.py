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
        write_on_store: if True, rewrite the file on every store call
            (crash-safe appending semantics).
        time_units: units string for the time axis.
    """

    def __init__(self, filename, store_names=None, write_on_store=False,
                 time_units='seconds'):
        self._filename = filename
        self._store_names = set(store_names) if store_names else None
        self._write_on_store = write_on_store
        self._time_units = time_units
        self._snapshots = []
        self._reference_time = None

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
            seconds = float(len(self._snapshots))
        self._snapshots.append((seconds, snapshot))
        if self._write_on_store:
            self.write()

    def write(self):
        """Write all accumulated snapshots to the NetCDF file."""
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
