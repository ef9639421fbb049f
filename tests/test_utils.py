"""Unit tests of core utilities (reference test strategy item (5):
/root/reference/tests/test_utils.py): mixing-ratio conversion with unit
round trips, interface interpolation identity, q_sat reference values,
plus the units engine and wrappers."""

from datetime import timedelta

import numpy as np
import pytest

import climt_tpu as ct
from climt_tpu.core.units import conversion_factor, units_are_compatible
from climt_tpu.core.util import (
    bolton_q_sat, calculate_q_sat, get_interface_values,
    mass_to_volume_mixing_ratio)


def test_mass_to_volume_mixing_ratio():
    q = np.array([1e-3, 2e-3])
    vmr = mass_to_volume_mixing_ratio(q, molecular_weight=44.01)
    np.testing.assert_allclose(vmr, q * 28.964 / 44.01)
    with pytest.raises(ValueError):
        mass_to_volume_mixing_ratio(q)


def test_interface_interpolation_identity():
    """A constant profile must interpolate to the same constant."""
    nz, ncol = 10, 3
    p_int = np.linspace(1e5, 1e4, nz + 1)[:, None] * np.ones((1, ncol))
    p_mid = 0.5 * (p_int[:-1] + p_int[1:])
    values = np.full((nz, ncol), 7.25)
    surface = np.full(ncol, 7.25)
    interface = np.asarray(get_interface_values(
        values, surface, p_mid, p_int))
    np.testing.assert_allclose(interface, 7.25, rtol=1e-12)
    assert interface.shape == (nz + 1, ncol)


def test_q_sat_reference_values():
    # ~100% RH at 300 K / 1000 hPa is about 22-23 g/kg
    qs = float(np.asarray(calculate_q_sat(
        np.array([300.]), np.array([1e5]), 287., 461.5))[0])
    assert 0.021 < qs < 0.025
    qb = float(np.asarray(bolton_q_sat(
        np.array([300.]), np.array([1e5]), 287., 461.5))[0])
    assert 0.021 < qb < 0.025
    # colder -> drier
    qs_cold = float(np.asarray(calculate_q_sat(
        np.array([260.]), np.array([1e5]), 287., 461.5))[0])
    assert qs_cold < qs / 5


def test_units_engine():
    assert conversion_factor('mbar', 'Pa') == (100.0, 0.0)
    scale, shift = conversion_factor('degK day^-1', 'degK s^-1')
    assert scale == pytest.approx(1 / 86400.)
    scale, shift = conversion_factor('km', 'm')
    assert scale == 1000.0
    scale, shift = conversion_factor('degrees_north', 'radians')
    assert scale == pytest.approx(np.pi / 180.)
    assert units_are_compatible('W m^-2', 'W/m^2')
    assert not units_are_compatible('W m^-2', 'degK')
    scale, shift = conversion_factor('degC', 'degK')
    assert shift == pytest.approx(273.15)
    assert conversion_factor('mm day^-1', 'm s^-1')[0] == pytest.approx(
        1e-3 / 86400.)


def test_dataarray_to_units():
    da = ct.DataArray(np.array([1000.0]), ('lat',), {'units': 'mbar'})
    pa = da.to_units('Pa')
    assert float(pa.values[0]) == pytest.approx(1e5)
    assert pa.units == 'Pa'


def test_constants_registry():
    g = ct.get_constant('gravitational_acceleration', 'm/s^2')
    assert g == pytest.approx(9.80665)
    ct.set_constant('gravitational_acceleration', 3.71, 'm s^-2')
    assert ct.get_constant(
        'gravitational_acceleration', 'm/s^2') == pytest.approx(3.71)
    ct.reset_constants()
    assert ct.get_constant(
        'gravitational_acceleration', 'm/s^2') == pytest.approx(9.80665)
    # unit conversion at retrieval
    cp_cgs = ct.get_constant(
        'heat_capacity_of_dry_air_at_constant_pressure', 'J g^-1 K^-1')
    assert cp_cgs == pytest.approx(1.00464)


def test_update_frequency_wrapper():
    """Caching semantics (reference tests/test_components.py:520-541)."""
    from datetime import datetime
    calls = []

    class Recorder(ct.TendencyComponent):
        input_properties = {}
        tendency_properties = {}
        diagnostic_properties = {}

        def array_call(self, state):
            calls.append(1)
            return {}, {}

    comp = ct.UpdateFrequencyWrapper(Recorder(), timedelta(seconds=1000))
    state = {'time': datetime(2000, 1, 1)}
    comp(state)
    comp(state)
    assert len(calls) == 1
    state['time'] += timedelta(seconds=1500)
    comp(state)
    assert len(calls) == 2


def test_scaling_wrapper():
    hs = ct.ScalingWrapper(
        ct.HeldSuarez(), tendency_scale_factors={'eastward_wind': 0.5})
    state = ct.get_default_state(
        [hs], grid_state=ct.get_grid(nx=None, ny=None, nz=10))
    state['eastward_wind'].values[:] = 10.0
    tendencies_scaled, _ = hs(state)
    tendencies_ref, _ = ct.HeldSuarez()(state)
    np.testing.assert_allclose(
        np.asarray(tendencies_scaled['eastward_wind'].values),
        0.5 * np.asarray(tendencies_ref['eastward_wind'].values))


def test_tracer_registry():
    from climt_tpu.core.tracers import (
        get_tracer_names, register_tracer, reset_tracers)
    reset_tracers()
    register_tracer('my_tracer', 'kg/kg')
    assert get_tracer_names() == ('my_tracer',)
    register_tracer('my_tracer', 'kg/kg')  # idempotent
    with pytest.raises(ValueError):
        register_tracer('my_tracer', 'm')
    reset_tracers()
    assert get_tracer_names() == ()


def test_netcdf_monitor_roundtrip(tmp_path):
    from climt_tpu.io.monitors import NetCDFMonitor
    from scipy.io import netcdf_file
    path = str(tmp_path / 'out.nc')
    monitor = NetCDFMonitor(path, store_names=['air_temperature'])
    state = ct.get_default_state(
        [ct.GrayLongwaveRadiation()],
        grid_state=ct.get_grid(nx=4, ny=3, nz=5))
    monitor.store(state)
    state['air_temperature'].values[:] += 1
    state['time'] += timedelta(hours=1)
    monitor.store(state)
    monitor.write()
    f = netcdf_file(path, 'r', mmap=False)
    T = np.array(f.variables['air_temperature'].data)
    assert T.shape == (2, 5, 3, 4)
    np.testing.assert_allclose(T[1] - T[0], 1.0)
    np.testing.assert_allclose(np.array(f.variables['time'].data),
                               [0., 3600.])
    f.close()


def test_restart_monitor_roundtrip(tmp_path):
    from climt_tpu.io.monitors import RestartMonitor
    path = str(tmp_path / 'restart')
    monitor = RestartMonitor(path)
    state = ct.get_default_state(
        [ct.HeldSuarez()], grid_state=ct.get_grid(nx=4, ny=3, nz=5))
    monitor.store(state)
    loaded = monitor.load()
    np.testing.assert_allclose(
        np.asarray(loaded['air_temperature'].values),
        np.asarray(state['air_temperature'].values))
    assert loaded['air_temperature'].dims == \
        state['air_temperature'].dims
    assert loaded['time'] == state['time']
