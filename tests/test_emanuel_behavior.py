"""Behavioral tests of the Emanuel convection scheme on a moist unstable
column (the golden caches only cover the trivially-dry no-convection case)."""

from datetime import timedelta

import numpy as np
import pytest

import climt_tpu as ct


def moist_tropical_state(nz=28, q0=0.02):
    state = ct.get_default_state(
        [ct.EmanuelConvection()],
        grid_state=ct.get_grid(nx=None, ny=None, nz=nz))
    p = np.asarray(state['air_pressure'].values).ravel()
    # conditionally unstable tropical-ish profile
    T_surf = 303.0
    height = 287.0 * 260.0 / 9.81 * np.log(1e5 / p)
    T = T_surf - 7.8e-3 * height
    T = np.maximum(T, 195.0)
    state['air_temperature'].values[:] = T.reshape(
        state['air_temperature'].shape)
    q = q0 * (p / p[0]) ** 3
    state['specific_humidity'].values[:] = q.reshape(
        state['specific_humidity'].shape)
    # seed the cloud-base mass-flux memory (the scheme's trigger requires
    # either prior convection or parcel buoyancy above the CIN threshold)
    state['cloud_base_mass_flux'].values[:] = 1e-3
    return state


def test_dry_state_no_convection():
    conv = ct.EmanuelConvection()
    state = ct.get_default_state(
        [conv], grid_state=ct.get_grid(nx=None, ny=None, nz=30))
    tendencies, diagnostics = conv(state, timedelta(minutes=10))
    for name, value in tendencies.items():
        assert np.allclose(np.asarray(value.values), 0.0), name
    assert np.allclose(
        np.asarray(diagnostics['convective_state'].values), 0.0)


def test_moist_unstable_column_convects():
    conv = ct.EmanuelConvection()
    state = moist_tropical_state()
    # spin the mass flux up over a few calls (quasi-equilibrium relaxation)
    dt = timedelta(minutes=10)
    for _ in range(5):
        tendencies, diagnostics = conv(state, dt)
        state['cloud_base_mass_flux'].values[:] = np.asarray(
            diagnostics['cloud_base_mass_flux'].values)
    iflag = np.asarray(diagnostics['convective_state'].values).ravel()[0]
    assert iflag in (1, 4), 'convection should be active, got {}'.format(
        iflag)
    cape = np.asarray(diagnostics[
        'atmosphere_convective_available_potential_energy'].values)
    assert cape.ravel()[0] > 0.0
    cbmf = np.asarray(diagnostics['cloud_base_mass_flux'].values)
    assert cbmf.ravel()[0] > 0.0
    dT = np.asarray(tendencies['air_temperature'].values)
    dq = np.asarray(tendencies['specific_humidity'].values)
    assert np.abs(dT).max() > 0.0
    assert not np.isnan(dT).any() and not np.isnan(dq).any()
    # tendencies should be bounded (no numerical blowup)
    assert np.abs(dT).max() < 50.0 / 86400.0 * 100
    # enthalpy conservation fix: column integral of Cp dT + Lv dq ~ 0
    p_int = np.asarray(
        state['air_pressure_on_interface_levels'].values).ravel()
    dp = (p_int[:-1] - p_int[1:])
    cp = 1004.64
    lv = 2.5e6
    integral = np.sum((cp * dT.ravel() + lv * dq.ravel()) * dp)
    scale = np.sum(np.abs(cp * dT.ravel()) * dp) + 1e-10
    assert abs(integral) / scale < 5e-2, (integral, scale)


def test_momentum_conservation():
    conv = ct.EmanuelConvection(
        convective_momentum_transfer_coefficient=0.7)
    state = moist_tropical_state()
    state['eastward_wind'].values[:] = np.linspace(
        -5, 25, state['eastward_wind'].size).reshape(
        state['eastward_wind'].shape)
    dt = timedelta(minutes=10)
    for _ in range(3):
        tendencies, diagnostics = conv(state, dt)
        state['cloud_base_mass_flux'].values[:] = np.asarray(
            diagnostics['cloud_base_mass_flux'].values)
    du = np.asarray(tendencies['eastward_wind'].values).ravel()
    p_int = np.asarray(
        state['air_pressure_on_interface_levels'].values).ravel()
    dp = p_int[:-1] - p_int[1:]
    # the conservation fix forces the mass-weighted momentum tendency to 0
    integral = np.sum(du * dp)
    scale = np.sum(np.abs(du) * dp) + 1e-10
    assert abs(integral) / scale < 1e-6
