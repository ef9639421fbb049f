"""Native async NetCDF writer (climt_tpu/io/_fastio.c + io/native.py).

The reference's output path is sympl's NetCDFMonitor
(/root/reference/examples/gmd_aquaplanet.py:43-46); the rebuild's native
backend must produce files the same readers accept, byte-semantics
checked here with scipy's independent netCDF-3 implementation.
"""

import os
import struct

import numpy as np
import pytest
from scipy.io import netcdf_file

from climt_tpu.core.dataarray import DataArray
from climt_tpu.io.monitors import NetCDFMonitor
from climt_tpu.io.native import (
    AsyncNetCDFWriter, build_header, load_fastio)

native_available = load_fastio() is not None

needs_native = pytest.mark.skipif(
    not native_available, reason='no working C compiler for _fastio')


@needs_native
def test_writer_roundtrip_scipy_readable(tmp_path):
    path = str(tmp_path / 'out.nc')
    rng = np.random.RandomState(0)
    nz, ny = 4, 3
    fields = [rng.rand(nz, ny) for _ in range(5)]
    w = AsyncNetCDFWriter(
        path, [('mid_levels', nz), ('lat', ny)],
        [('air_temperature', ('mid_levels', 'lat'), 'degK'),
         ('surface_air_pressure', ('lat',), 'Pa')])
    for i, f2d in enumerate(fields):
        w.append(10.0 * i, {'air_temperature': f2d,
                            'surface_air_pressure': f2d[0] * 1e5})
    n = w.close()
    assert n == len(fields)

    f = netcdf_file(path, 'r', mmap=False)
    assert f.variables['time'].data.tolist() == [
        10.0 * i for i in range(len(fields))]
    assert f.variables['air_temperature'].units == b'degK'
    assert f.variables['air_temperature'].dimensions == (
        'time', 'mid_levels', 'lat')
    np.testing.assert_array_equal(
        f.variables['air_temperature'].data, np.stack(fields))
    np.testing.assert_array_equal(
        f.variables['surface_air_pressure'].data,
        np.stack([f2d[0] * 1e5 for f2d in fields]))
    f.close()


@needs_native
def test_streaming_sentinel_then_finalized(tmp_path):
    """While open, numrecs holds the netCDF STREAMING sentinel (a crash
    leaves a spec-valid file whose record count is computed from the file
    size); close() patches the real count in place."""
    path = str(tmp_path / 'stream.nc')
    w = AsyncNetCDFWriter(path, [('x', 2)], [('q', ('x',), 'kg')])
    header, recsize = build_header([('x', 2)], [('q', ('x',), 'kg')])
    w.append(0.0, {'q': np.arange(2.0)})
    w.append(1.0, {'q': np.arange(2.0) + 5})
    w.flush()
    with open(path, 'rb') as fh:
        raw = fh.read()
    assert struct.unpack('>I', raw[4:8])[0] == 0xFFFFFFFF
    # data region holds exactly 2 records (recsize counts time + q)
    assert len(raw) == len(header) + 2 * recsize
    w.close()
    with open(path, 'rb') as fh:
        assert struct.unpack('>I', fh.read(8)[4:8])[0] == 2
    f = netcdf_file(path, 'r', mmap=False)
    np.testing.assert_array_equal(f.variables['q'].data,
                                  [[0.0, 1.0], [5.0, 6.0]])
    f.close()


@needs_native
def test_record_size_mismatch_raises(tmp_path):
    w = AsyncNetCDFWriter(str(tmp_path / 'bad.nc'), [('x', 3)],
                          [('q', ('x',), '')])
    with pytest.raises(ValueError):
        w.append(0.0, {'q': np.zeros(2)})
    w.close()


def _state(i):
    return {
        'air_temperature': DataArray(
            270.0 + i + np.arange(12.0).reshape(3, 4),
            ('mid_levels', 'lat'), {'units': 'degK'}, 'air_temperature'),
        'surface_air_pressure': DataArray(
            1e5 + i * np.ones(4), ('lat',), {'units': 'Pa'},
            'surface_air_pressure'),
    }


def _read_all(path):
    f = netcdf_file(path, 'r', mmap=False)
    out = {name: (np.array(var.data), getattr(var, 'units', b''),
                  var.dimensions)
           for name, var in f.variables.items()}
    f.close()
    return out


@needs_native
def test_monitor_native_matches_scipy(tmp_path):
    """The streaming native backend and the buffered scipy backend must
    produce equivalent files for the same store sequence."""
    p_nat = str(tmp_path / 'native.nc')
    p_sp = str(tmp_path / 'scipy.nc')
    m_nat = NetCDFMonitor(p_nat, write_on_store=True, backend='native')
    m_sp = NetCDFMonitor(p_sp, write_on_store=True, backend='scipy')
    for i in range(4):
        m_nat.store(_state(i))
        m_sp.store(_state(i))
    m_nat.close()
    m_sp.close()
    a, b = _read_all(p_nat), _read_all(p_sp)
    assert set(a) == set(b)
    for name in a:
        np.testing.assert_array_equal(a[name][0], b[name][0], err_msg=name)
        if name != 'time':
            assert a[name][1] == b[name][1]
            assert a[name][2] == b[name][2]


def test_monitor_backend_auto_always_works(tmp_path):
    """backend='auto' must produce a readable file whether or not the
    extension builds."""
    path = str(tmp_path / 'auto.nc')
    m = NetCDFMonitor(path, write_on_store=True)
    for i in range(3):
        m.store(_state(i))
    m.write()
    m.close()
    out = _read_all(path)
    assert out['air_temperature'][0].shape == (3, 3, 4)
    np.testing.assert_allclose(out['air_temperature'][0][2, 0, 0], 272.0)


def test_monitor_store_names_filter(tmp_path):
    path = str(tmp_path / 'filtered.nc')
    m = NetCDFMonitor(path, store_names=['surface_air_pressure'],
                      write_on_store=True)
    m.store(_state(0))
    m.close()
    out = _read_all(path)
    assert 'surface_air_pressure' in out
    assert 'air_temperature' not in out
