"""DCMIP (2012) idealized initial conditions, tests 4 and 5.

Behavioral parity with /root/reference/climt/_components/dcmip/component.py:14-150
and the underlying analytic formulas
(_lib/dcmip/dcmip_initial_conditions_test_4_v3.f90 — the
Jablonowski-Williamson baroclinic wave — and
dcmip_initial_conditions_test_5_v1.f90 — the Reed-Jablonowski analytic
tropical cyclone).  All formulas are closed-form and elementwise, so the
per-point Fortran subroutines become whole-grid jnp expressions; the
tropical cyclone's fixed-point height iteration becomes a fixed-count
masked Newton loop.

Physical constants are the DCMIP-prescribed values hard-coded in the
reference Fortran (not the registry), as required for numerical parity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.base_components import DiagnosticComponent
from ..core.constants import get_constant

# DCMIP-prescribed constants (test-4 header, f90:56-95)
_A = 6371220.0
_RD = 287.0
_G = 9.80616
_OMEGA_4 = 7.29212e-5
_P0 = 100000.0
_ETA_TROPO = 0.2
_U0 = 35.0
_T0 = 288.0
_ETA0 = 0.252
_RADIUS = 10.0
_PERT_AMPL = 1.0
_PERT_LON = np.deg2rad(20.0)   # plain numpy: importing the
_PERT_LAT = np.deg2rad(40.0)   # package must not init the XLA backend
_DELTA_T = 480000.0
_GAMMA_4 = 0.005
_Q0_4 = 0.021
_LAT_HW = 2.0 * np.pi / 9.0
_P_HW = 34000.0


def _t_mean(eta):
    exponent = _RD * _GAMMA_4 / _G
    base = _T0 * eta ** exponent
    return jnp.where(eta >= _ETA_TROPO, base,
                     base + _DELTA_T * jnp.maximum(
                         _ETA_TROPO - eta, 0.0) ** 5)


def _t_deviation(lat, eta):
    factor = eta * jnp.pi * _U0 / _RD
    phi_v = (eta - _ETA0) * 0.5 * jnp.pi
    return factor * 1.5 * jnp.sin(phi_v) * jnp.cos(phi_v) ** 0.5 * (
        (-2.0 * jnp.sin(lat) ** 6 * (jnp.cos(lat) ** 2 + 1.0 / 3.0)
         + 10.0 / 63.0) * _U0 * jnp.cos(phi_v) ** 1.5
        + (8.0 / 5.0 * jnp.cos(lat) ** 3
           * (jnp.sin(lat) ** 2 + 2.0 / 3.0)
           - jnp.pi / 4.0) * _A * _OMEGA_4 * 0.5)


def _surface_geopotential_bw(lat):
    cos_tmp = _U0 * jnp.cos((1.0 - _ETA0) * jnp.pi * 0.5) ** 1.5
    return ((-2.0 * jnp.sin(lat) ** 6 * (jnp.cos(lat) ** 2 + 1.0 / 3.0)
             + 10.0 / 63.0) * cos_tmp
            + (8.0 / 5.0 * jnp.cos(lat) ** 3
               * (jnp.sin(lat) ** 2 + 2.0 / 3.0)
               - jnp.pi / 4.0) * _A * _OMEGA_4) * cos_tmp


@partial(jax.jit, static_argnums=(3, 4))
def baroclinic_wave_ics(p, lon, lat, perturb=True, moist=False):
    """Jablonowski-Williamson baroclinic wave on (nz, ncol) pressure."""
    ps = jnp.full(lon.shape, _P0)
    eta = p / _P0

    phi_v = (eta - _ETA0) * 0.5 * jnp.pi
    u = jnp.cos(phi_v) ** 1.5 * 4.0 * _U0 * (
        jnp.sin(lat) ** 2 * jnp.cos(lat) ** 2)[None, :]
    if perturb:
        r = jnp.arccos(
            jnp.sin(_PERT_LAT) * jnp.sin(lat)
            + jnp.cos(_PERT_LAT) * jnp.cos(lat)
            * jnp.cos(lon - _PERT_LON))
        u = u + (_PERT_AMPL * jnp.exp(-(r * _RADIUS) ** 2))[None, :]
    v = jnp.zeros_like(u)

    t = _t_mean(eta) + _t_deviation(lat[None, :], eta)
    phis = _surface_geopotential_bw(lat)

    if moist:
        q = _Q0_4 * jnp.exp(-(lat[None, :] / _LAT_HW) ** 4) * jnp.exp(
            -((eta - 1.0) * _P0 / _P_HW) ** 2)
        t = t / (1.0 + 0.608 * q)
    else:
        q = jnp.zeros_like(t)
    return u, v, t, q, ps, phis


# Tropical cyclone constants (test-5 header, f90:57-80)
_OMEGA_5 = 7.292115e-5
_RP = 282000.0
_DP = 1115.0
_ZP = 7000.0
_Q0_5 = 0.021
_GAMMA_5 = 0.007
_TS0 = 302.15
_P00 = 101500.0
_CEN_LAT = np.deg2rad(10.0)
_CEN_LON = np.deg2rad(180.0)
_ZQ1 = 3000.0
_ZQ2 = 8000.0
_EXPPR = 1.5
_EXPPZ = 2.0
_ZTROP = 15000.0
_QTROP = 1e-11
_RFPI = 1000000.0
_CONST_TV = 0.608
_EPS_WIND = 1e-25
_EXPONENT_5 = _RD * _GAMMA_5 / _G
_T0_5 = _TS0 * (1.0 + _CONST_TV * _Q0_5)
_TTROP = _T0_5 - _GAMMA_5 * _ZTROP


def _fpi_f(p, gr, z):
    return p - (_P00 - _DP * jnp.exp(-(gr / _RP) ** _EXPPR)
                * jnp.exp(-(z / _ZP) ** _EXPPZ)) \
        * ((_T0_5 - _GAMMA_5 * z) / _T0_5) ** (_G / (_RD * _GAMMA_5))


def _fpi_dfdz(gr, z):
    expo = _G / (_RD * _GAMMA_5)
    decay = jnp.exp(-(gr / _RP) ** _EXPPR) * jnp.exp(-(z / _ZP) ** _EXPPZ)
    ratio = (_T0_5 - _GAMMA_5 * z) / _T0_5
    return (-_EXPPZ * z * _DP * decay / (_ZP * _ZP) * ratio ** expo
            + _G / (_RD * _T0_5)
            * (_P00 - _DP * decay) * ratio ** (expo - 1.0))


@jax.jit
def tropical_cyclone_ics(p, lon, lat):
    """Reed-Jablonowski analytic tropical cyclone on (nz, ncol) pressure."""
    f = 2.0 * _OMEGA_5 * jnp.sin(_CEN_LAT)
    gr = _A * jnp.arccos(
        jnp.sin(_CEN_LAT) * jnp.sin(lat)
        + jnp.cos(_CEN_LAT) * jnp.cos(lat) * jnp.cos(lon - _CEN_LON))

    ps = _P00 - _DP * jnp.exp(-(gr / _RP) ** _EXPPR)

    height = (_T0_5 / _GAMMA_5) * (1.0 - (p / ps[None, :]) ** _EXPONENT_5)

    # Newton refinement of the height near the vortex center (the
    # reference's fixed-point iteration, f90:161-174), fixed 20 iterations
    # with per-point masking
    gr2 = gr[None, :]

    def newton(z, _):
        z_new = z - _fpi_f(p, gr2, z) / _fpi_dfdz(gr2, z)
        return jnp.where(gr2 < _RFPI, z_new, z), None

    height, _ = jax.lax.scan(newton, height, None, length=20)

    d1 = jnp.sin(_CEN_LAT) * jnp.cos(lat) - \
        jnp.cos(_CEN_LAT) * jnp.sin(lat) * jnp.cos(lon - _CEN_LON)
    d2 = jnp.cos(_CEN_LAT) * jnp.sin(lon - _CEN_LON)
    d = jnp.maximum(_EPS_WIND, jnp.sqrt(d1 ** 2 + d2 ** 2))
    ufac = (d1 / d)[None, :]
    vfac = (d2 / d)[None, :]

    t_minus = _T0_5 - _GAMMA_5 * height
    exp_gr = jnp.exp((gr2 / _RP) ** _EXPPR)
    exp_z = jnp.exp((height / _ZP) ** _EXPPZ)
    denom = (_EXPPZ * height * _RD * t_minus / (_G * _ZP ** _EXPPZ)
             + (1.0 - _P00 / _DP * exp_gr * exp_z))
    tangential = (-f * gr2 / 2.0
                  + jnp.sqrt(jnp.maximum(
                      (f * gr2 / 2.0) ** 2
                      - _EXPPR * (gr2 / _RP) ** _EXPPR * _RD * t_minus
                      / denom, 0.0)))
    in_troposphere = height <= _ZTROP
    u = jnp.where(in_troposphere, ufac * tangential, 0.0)
    v = jnp.where(in_troposphere, vfac * tangential, 0.0)

    q = jnp.where(in_troposphere,
                  _Q0_5 * jnp.exp(-height / _ZQ1)
                  * jnp.exp(-(height / _ZQ2) ** _EXPPZ),
                  _QTROP)
    t = jnp.where(
        in_troposphere,
        t_minus / (1.0 + _CONST_TV * q)
        / (1.0 + _EXPPZ * _RD * t_minus * height
           / (_G * _ZP ** _EXPPZ
              * (1.0 - _P00 / _DP * exp_gr * exp_z))),
        _TTROP)

    phis = jnp.zeros_like(ps)
    return u, v, t, q, ps, phis


class DcmipInitialConditions(DiagnosticComponent):
    """Analytic DCMIP baroclinic-wave / tropical-cyclone initial states."""

    input_properties = {
        'latitude': {'dims': ['*'], 'units': 'degrees_north'},
        'longitude': {'dims': ['*'], 'units': 'degrees_east'},
        'air_pressure': {'dims': ['mid_levels', '*'], 'units': 'Pa'},
        'atmosphere_hybrid_sigma_pressure_a_coordinate_on_interface_levels': {
            'dims': ['interface_levels', '*'], 'units': 'dimensionless',
            'alias': 'ak'},
        'atmosphere_hybrid_sigma_pressure_b_coordinate_on_interface_levels': {
            'dims': ['interface_levels', '*'], 'units': 'dimensionless',
            'alias': 'bk'},
    }

    diagnostic_properties = {
        'eastward_wind': {'dims': ['mid_levels', '*'], 'units': 'm s^-1'},
        'northward_wind': {'dims': ['mid_levels', '*'], 'units': 'm s^-1'},
        'air_temperature': {'dims': ['mid_levels', '*'], 'units': 'degK'},
        'surface_geopotential': {'dims': ['*'], 'units': 'm^2 s^-2'},
        'surface_air_pressure': {'dims': ['*'], 'units': 'Pa'},
        'specific_humidity': {'dims': ['mid_levels', '*'], 'units': 'g/g'},
        'air_pressure': {'dims': ['mid_levels', '*'], 'units': 'Pa'},
        'air_pressure_on_interface_levels': {
            'dims': ['interface_levels', '*'], 'units': 'Pa'},
    }

    def __init__(self, condition_type='baroclinic_wave',
                 add_perturbation=True, moist=False, **kwargs):
        if condition_type not in ('baroclinic_wave', 'tropical_cyclone'):
            raise ValueError(
                "condition_type must be 'baroclinic_wave' or "
                "'tropical_cyclone'")
        if condition_type == 'tropical_cyclone' and not moist:
            raise ValueError(
                'moist must be True for the tropical cyclone test')
        self._condition_type = condition_type
        self._add_perturbation = add_perturbation
        self._moist = moist
        super().__init__(**kwargs)

    def array_call(self, state):
        toa_pressure = get_constant('top_of_model_pressure', 'Pa')
        rd = get_constant('gas_constant_of_dry_air', 'J kg^-1 K^-1')
        cpd = get_constant(
            'heat_capacity_of_dry_air_at_constant_pressure', 'J kg^-1 K^-1')

        lon = jnp.deg2rad(jnp.asarray(state['longitude']))
        lat = jnp.deg2rad(jnp.asarray(state['latitude']))
        p = jnp.asarray(state['air_pressure'])

        if self._condition_type == 'baroclinic_wave':
            u, v, t, q, ps, phis = baroclinic_wave_ics(
                p, lon, lat, self._add_perturbation, self._moist)
        else:
            u, v, t, q, ps, phis = tropical_cyclone_ics(p, lon, lat)

        p_interface = (jnp.asarray(state['ak'])
                       + jnp.asarray(state['bk'])
                       * (ps[None, :] - toa_pressure))
        delta_p = p_interface[1:] - p_interface[:-1]
        rk = rd / cpd
        p_mid = ((p_interface[1:] ** (rk + 1)
                  - p_interface[:-1] ** (rk + 1))
                 / ((rk + 1) * delta_p)) ** (1.0 / rk)

        return {
            'eastward_wind': u,
            'northward_wind': v,
            'air_temperature': t,
            'surface_geopotential': phis,
            'specific_humidity': q,
            'surface_air_pressure': ps,
            'air_pressure': p_mid,
            'air_pressure_on_interface_levels': p_interface,
        }
