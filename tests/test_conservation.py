"""Conservation tests.

Mirrors the reference test strategy item (3)
(/root/reference/tests/test_conservation.py): after one short step, the
change in vertically-integrated moist enthalpy (int (Cp T + Lv q) dp / g)
must equal the net boundary energy fluxes (surface + TOA).
"""

from datetime import timedelta

import numpy as np
import pytest

import climt_tpu as ct

CP = 1004.64
LV = 2.5e6
G = 9.80665


def column_state(components, nz=30):
    grid = ct.get_grid(nx=None, ny=None, nz=nz)
    state = ct.get_default_state(components, grid_state=grid)
    for name in ('air_temperature', 'specific_humidity'):
        if name not in state:
            state.update(ct.get_init_diagnostic(name)(grid))
    p = np.asarray(state['air_pressure'].values).ravel()
    Ts = 300.
    state['air_temperature'].values[:] = np.maximum(
        Ts * (p / p[0]) ** (2. / 7. * 0.8), 200.).reshape(
        state['air_temperature'].shape)
    state['specific_humidity'].values[:] = (
        0.01 * (p / p[0]) ** 3).reshape(state['specific_humidity'].shape)
    if 'surface_temperature' in state:
        state['surface_temperature'].values[:] = Ts
    return state


def moist_enthalpy(state):
    T = np.asarray(state['air_temperature'].values).ravel()
    q = np.asarray(state['specific_humidity'].values).ravel()
    p_int = np.asarray(
        state['air_pressure_on_interface_levels'].values).ravel()
    dp = p_int[:-1] - p_int[1:]
    return np.sum((CP * T + LV * q) * dp) / G


def boundary_fluxes(state):
    """Net energy into the column from surface and TOA (W/m^2)."""
    net = 0.0
    for name, sign_sfc, sign_toa in [
            ('downwelling_longwave_flux_in_air', -1, +1),
            ('upwelling_longwave_flux_in_air', +1, -1),
            ('downwelling_shortwave_flux_in_air', -1, +1),
            ('upwelling_shortwave_flux_in_air', +1, -1)]:
        if name in state:
            flux = np.asarray(state[name].values).ravel()
            net += sign_sfc * flux[0] + sign_toa * flux[-1]
    for name in ('surface_upward_sensible_heat_flux',
                 'surface_upward_latent_heat_flux'):
        if name in state:
            net += np.ravel(np.asarray(state[name].values))[0]
    return net


@pytest.mark.parametrize('make_component', [
    lambda: ct.RRTMGLongwave(),
    lambda: ct.RRTMGShortwave(),
], ids=['rrtmg_lw', 'rrtmg_sw'])
def test_radiation_conserves_energy(make_component):
    component = make_component()
    state = column_state([component])
    if 'zenith_angle' in state:
        state['zenith_angle'].values[:] = np.arccos(0.5)
    stepper = ct.AdamsBashforth([component])
    dt = timedelta(seconds=1.)
    h0 = moist_enthalpy(state)
    diagnostics, new_state = stepper(state, dt)
    state.update(diagnostics)
    h1 = moist_enthalpy({**state, **new_state})
    dh_dt = h1 - h0  # J/m^2 over 1 s == W/m^2
    fluxes = boundary_fluxes(state)
    assert dh_dt == pytest.approx(fluxes, abs=2e-2), (dh_dt, fluxes)


def test_gray_radiation_conserves_energy():
    component = ct.GrayLongwaveRadiation()
    state = column_state([component])
    stepper = ct.AdamsBashforth([component])
    h0 = moist_enthalpy(state)
    diagnostics, new_state = stepper(state, timedelta(seconds=1.))
    state.update(diagnostics)
    h1 = moist_enthalpy({**state, **new_state})
    assert (h1 - h0) == pytest.approx(boundary_fluxes(state), abs=2e-2)


def test_dry_convection_conserves_enthalpy_and_water():
    component = ct.DryConvectiveAdjustment()
    state = column_state([component])
    # super-adiabatic near-surface layer to force adjustment
    state['air_temperature'].values[0] += 10.
    p_int = np.asarray(
        state['air_pressure_on_interface_levels'].values).ravel()
    dp = p_int[:-1] - p_int[1:]
    T0 = np.asarray(state['air_temperature'].values).ravel()
    q0 = np.asarray(state['specific_humidity'].values).ravel()
    cp_moist = CP * (1 - q0) + 1846. * q0
    h0 = np.sum(cp_moist * T0 * dp) / G
    w0 = np.sum(q0 * dp) / G
    _, new_state = component(state, timedelta(seconds=10.))
    T1 = np.asarray(new_state['air_temperature'].values).ravel()
    q1 = np.asarray(new_state['specific_humidity'].values).ravel()
    assert not np.allclose(T1, T0)  # adjustment happened
    cp1 = CP * (1 - q0) + 1846. * q0  # reference uses pre-adjustment q
    h1 = np.sum(cp1 * T1 * dp) / G
    w1 = np.sum(q1 * dp) / G
    assert w1 == pytest.approx(w0, rel=1e-10)
    assert h1 == pytest.approx(h0, rel=1e-4)


def test_simple_physics_water_balance():
    """Moisture gained by the column equals evaporation minus precip."""
    component = ct.SimplePhysics()
    state = column_state([component])
    state['eastward_wind'].values[:] = 8.
    dt = 600.
    p_int = np.asarray(
        state['air_pressure_on_interface_levels'].values).ravel()
    dp = p_int[:-1] - p_int[1:]
    q0 = np.asarray(state['specific_humidity'].values).ravel()
    diag, new_state = component(state, timedelta(seconds=dt))
    q1 = np.asarray(new_state['specific_humidity'].values).ravel()
    dw_dt = np.sum((q1 - q0) * dp) / G / dt          # kg/m^2/s
    evap = np.ravel(np.asarray(
        diag['surface_upward_latent_heat_flux'].values))[0] / LV
    precip = np.ravel(np.asarray(
        diag['stratiform_precipitation_rate'].values))[0] * 1000.
    assert dw_dt == pytest.approx(evap - precip, rel=2e-2)


def test_slab_surface_flux_response():
    component = ct.SlabSurface()
    state = column_state([component])
    state['downwelling_longwave_flux_in_air'].values[:] = 400.
    state['upwelling_longwave_flux_in_air'].values[:] = 460.
    tendencies, diagnostics = component(state)
    dTs = np.ravel(np.asarray(
        tendencies['surface_temperature'].values))[0]
    # net -60 W/m^2 over 50 m slab of sea water
    rho_c_d = 1.029e3 * 4.1813e3 * 50.
    assert dTs == pytest.approx(-60. / rho_c_d, rel=1e-6)
