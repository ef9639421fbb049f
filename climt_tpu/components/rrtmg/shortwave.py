"""RRTMGShortwave: two-interval shortwave radiative transfer.

API parity with /root/reference/climt/_components/rrtmg/sw/component.py:27-630
(inputs incl. trace gases, cloud water/ice paths and particle sizes,
four-way surface albedos, banded direct-input cloud/aerosol optics, solar
cycle and earth-sun-distance adjustments; outputs all-sky and clear-sky
fluxes and heating rates; constructor options incl. the McICA advisories).

Radiative core: delta-two-stream adding (gas_optics.delta_two_stream) over
a UV/VIS interval (O3 + Rayleigh) and an NIR interval (H2O), after Lacis &
Hansen (1974)-type absorber scalings, with standard cloud optics
tau = 3 WP / (2 rho r_eff) and max-overlap cloud/clear blending.  The full
112-g-point correlated-k gas optics is the planned internal upgrade.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.base_components import TendencyComponent
from ...core.constants import get_constant
from .common import (
    rrtmg_cloud_ice_props_dict, rrtmg_cloud_liquid_props_dict,
    rrtmg_cloud_overlap_method_dict, rrtmg_cloud_props_dict,
    rrtmg_random_number_dict, validate_mcica_options)
from .gas_optics import _SW_VIS_FRACTION, delta_two_stream, sw_gas_optics


@jax.jit
def _sw_radiation(p_mid, p_int, T, q, o3, mu0, alb_dir_vis, alb_dif_vis,
                  alb_dir_nir, alb_dif_nir, solar_constant,
                  cloud_tau, cloud_omega, cloud_g, cloud_fraction,
                  g, cpd):
    dp = p_int[:-1] - p_int[1:]
    tau_gas, omega_gas, g_gas = sw_gas_optics(dp, q, o3, p_mid, mu0)

    day = mu0 > 0.0
    mu0_safe = jnp.where(day, mu0, 1.0)
    incident = jnp.stack([
        solar_constant * _SW_VIS_FRACTION * day,
        solar_constant * (1.0 - _SW_VIS_FRACTION) * day,
    ])

    albs_dir = (alb_dir_vis, alb_dir_nir)
    albs_dif = (alb_dif_vis, alb_dif_nir)

    def solve(tau, omega, gasym):
        downs, ups = [], []
        for b in range(2):
            d, u = delta_two_stream(
                tau[b], omega[b], gasym[b], mu0_safe,
                albs_dir[b], albs_dif[b], incident[b])
            downs.append(d)
            ups.append(u)
        return downs[0] + downs[1], ups[0] + ups[1]

    down_clear, up_clear = solve(tau_gas, omega_gas, g_gas)

    # combine gas + cloud optics per interval
    tau_tot = tau_gas + cloud_tau[None]
    omega_tot = (omega_gas * tau_gas + cloud_omega * cloud_tau[None]) \
        / jnp.maximum(tau_tot, 1e-12)
    g_tot = (g_gas * omega_gas * tau_gas
             + cloud_g * cloud_omega * cloud_tau[None]) / jnp.maximum(
        omega_tot * tau_tot, 1e-12)
    down_cloudy, up_cloudy = solve(tau_tot, omega_tot, g_tot)

    c_tot = jnp.max(cloud_fraction, axis=0)
    down = c_tot * down_cloudy + (1.0 - c_tot) * down_clear
    up = c_tot * up_cloudy + (1.0 - c_tot) * up_clear

    def heating(up_f, down_f):
        net = down_f - up_f
        return -(g / cpd) * (net[1:] - net[:-1]) / (
            p_int[1:] - p_int[:-1])

    hr = heating(up, down) * 86400.0
    hr_clear = heating(up_clear, down_clear) * 86400.0
    return up, down, up_clear, down_clear, hr, hr_clear


class RRTMGShortwave(TendencyComponent):
    """Shortwave radiative transfer with the RRTMG interface."""

    num_shortwave_bands = 14
    num_ecmwf_aerosols = 6
    num_reduced_g_intervals = 112

    input_properties = {
        'air_pressure': {'dims': ['mid_levels', '*'], 'units': 'mbar'},
        'air_pressure_on_interface_levels': {
            'dims': ['interface_levels', '*'], 'units': 'mbar'},
        'air_temperature': {'dims': ['mid_levels', '*'], 'units': 'degK'},
        'specific_humidity': {'dims': ['mid_levels', '*'],
                              'units': 'dimensionless'},
        'mole_fraction_of_ozone_in_air': {
            'dims': ['mid_levels', '*'], 'units': 'dimensionless'},
        'mole_fraction_of_carbon_dioxide_in_air': {
            'dims': ['mid_levels', '*'], 'units': 'dimensionless'},
        'mole_fraction_of_methane_in_air': {
            'dims': ['mid_levels', '*'], 'units': 'dimensionless'},
        'mole_fraction_of_nitrous_oxide_in_air': {
            'dims': ['mid_levels', '*'], 'units': 'dimensionless'},
        'mole_fraction_of_oxygen_in_air': {
            'dims': ['mid_levels', '*'], 'units': 'dimensionless'},
        'mass_content_of_cloud_ice_in_atmosphere_layer': {
            'dims': ['mid_levels', '*'], 'units': 'g m^-2'},
        'mass_content_of_cloud_liquid_water_in_atmosphere_layer': {
            'dims': ['mid_levels', '*'], 'units': 'g m^-2'},
        'cloud_ice_particle_size': {
            'dims': ['mid_levels', '*'], 'units': 'micrometer'},
        'cloud_water_droplet_radius': {
            'dims': ['mid_levels', '*'], 'units': 'micrometer'},
        'cloud_area_fraction_in_atmosphere_layer': {
            'dims': ['mid_levels', '*'], 'units': 'dimensionless'},
        'surface_temperature': {'dims': ['*'], 'units': 'degK'},
        'zenith_angle': {'dims': ['*'], 'units': 'radians'},
        'surface_albedo_for_direct_shortwave': {
            'dims': ['*'], 'units': 'dimensionless'},
        'surface_albedo_for_direct_near_infrared': {
            'dims': ['*'], 'units': 'dimensionless'},
        'surface_albedo_for_diffuse_near_infrared': {
            'dims': ['*'], 'units': 'dimensionless'},
        'surface_albedo_for_diffuse_shortwave': {
            'dims': ['*'], 'units': 'dimensionless'},
        'shortwave_optical_thickness_due_to_cloud': {
            'dims': ['mid_levels', '*', 'num_shortwave_bands'],
            'units': 'dimensionless'},
        'shortwave_optical_thickness_due_to_aerosol': {
            'dims': ['num_shortwave_bands', 'mid_levels', '*'],
            'units': 'dimensionless'},
        'single_scattering_albedo_due_to_cloud': {
            'dims': ['mid_levels', '*', 'num_shortwave_bands'],
            'units': 'dimensionless'},
        'single_scattering_albedo_due_to_aerosol': {
            'dims': ['num_shortwave_bands', 'mid_levels', '*'],
            'units': 'dimensionless'},
        'cloud_asymmetry_parameter': {
            'dims': ['mid_levels', '*', 'num_shortwave_bands'],
            'units': 'dimensionless'},
        'aerosol_asymmetry_parameter': {
            'dims': ['num_shortwave_bands', 'mid_levels', '*'],
            'units': 'dimensionless'},
        'cloud_forward_scattering_fraction': {
            'dims': ['mid_levels', '*', 'num_shortwave_bands'],
            'units': 'dimensionless'},
        'aerosol_optical_depth_at_55_micron': {
            'dims': ['num_ecmwf_aerosols', 'mid_levels', '*'],
            'units': 'dimensionless'},
        'solar_cycle_fraction': {'dims': [], 'units': 'dimensionless'},
        'flux_adjustment_for_earth_sun_distance': {
            'dims': [], 'units': 'dimensionless'},
    }

    tendency_properties = {
        'air_temperature': {'units': 'degK day^-1'},
    }

    diagnostic_properties = {
        'upwelling_shortwave_flux_in_air': {
            'dims': ['interface_levels', '*'], 'units': 'W m^-2'},
        'downwelling_shortwave_flux_in_air': {
            'dims': ['interface_levels', '*'], 'units': 'W m^-2'},
        'upwelling_shortwave_flux_in_air_assuming_clear_sky': {
            'dims': ['interface_levels', '*'], 'units': 'W m^-2'},
        'downwelling_shortwave_flux_in_air_assuming_clear_sky': {
            'dims': ['interface_levels', '*'], 'units': 'W m^-2'},
        'air_temperature_tendency_from_shortwave_assuming_clear_sky': {
            'dims': ['mid_levels', '*'], 'units': 'degK day^-1'},
        'air_temperature_tendency_from_shortwave': {
            'dims': ['mid_levels', '*'], 'units': 'degK day^-1'},
    }

    def __init__(self, cloud_overlap_method=None,
                 cloud_optical_properties='liquid_and_ice_clouds',
                 cloud_ice_properties='ebert_curry_two',
                 cloud_liquid_water_properties='radius_dependent_absorption',
                 mcica=False,
                 random_number_generator='mersenne_twister',
                 use_solar_constant_from_fortran=False,
                 ignore_day_of_year=False,
                 facular_sunspot_amplitude=None,
                 solar_variability_by_band=None,
                 aerosol_type='no_aerosol',
                 **kwargs):
        cloud_overlap_method = cloud_overlap_method or 'random'
        validate_mcica_options(
            mcica, cloud_overlap_method, cloud_optical_properties,
            cloud_ice_properties, cloud_liquid_water_properties,
            shortwave=True)
        self._cloud_overlap = rrtmg_cloud_overlap_method_dict[
            cloud_overlap_method]
        self._cloud_optics = rrtmg_cloud_props_dict[
            cloud_optical_properties]
        self._ice_props = rrtmg_cloud_ice_props_dict[cloud_ice_properties]
        self._liquid_props = rrtmg_cloud_liquid_props_dict[
            cloud_liquid_water_properties]
        self._mcica = mcica
        self._rng = rrtmg_random_number_dict[random_number_generator]
        self._aerosol_type = aerosol_type
        super().__init__(**kwargs)

    def _cloud_optics_fields(self, raw_state):
        """(tau, omega, g) grey shortwave cloud optics per layer."""
        T_shape = jnp.asarray(raw_state['air_temperature']).shape
        if self._cloud_overlap == 0:
            zero = jnp.zeros(T_shape)
            return zero, jnp.zeros(T_shape), jnp.zeros(T_shape)
        if self._cloud_optics == 0:  # direct_input: band-mean
            tau = jnp.mean(jnp.asarray(
                raw_state['shortwave_optical_thickness_due_to_cloud']),
                axis=-1)
            omega = jnp.mean(jnp.asarray(
                raw_state['single_scattering_albedo_due_to_cloud']),
                axis=-1)
            g_c = jnp.mean(jnp.asarray(
                raw_state['cloud_asymmetry_parameter']), axis=-1)
            return tau, omega, g_c
        lwp = jnp.asarray(raw_state[
            'mass_content_of_cloud_liquid_water_in_atmosphere_layer'])
        iwp = jnp.asarray(raw_state[
            'mass_content_of_cloud_ice_in_atmosphere_layer'])
        r_liq = jnp.asarray(raw_state['cloud_water_droplet_radius'])
        r_ice = jnp.asarray(raw_state['cloud_ice_particle_size'])
        # tau = 3 WP / (2 rho_w r_eff); WP in g/m^2, r in micron
        tau_liq = 1.5 * lwp / jnp.maximum(r_liq, 2.5)
        tau_ice = 1.5 * iwp / (0.9167 * jnp.maximum(r_ice, 5.0))
        tau = tau_liq + tau_ice
        omega = jnp.full_like(tau, 0.9995)
        g_c = jnp.full_like(tau, 0.85)
        return tau, omega, g_c

    def array_call(self, raw_state):
        g = get_constant('gravitational_acceleration', 'm/s^2')
        cpd = get_constant(
            'heat_capacity_of_dry_air_at_constant_pressure', 'J/kg/degK')
        solar_constant = get_constant('stellar_irradiance', 'W/m^2')

        p_mid = jnp.asarray(raw_state['air_pressure']) * 100.0
        p_int = jnp.asarray(
            raw_state['air_pressure_on_interface_levels']) * 100.0
        T = jnp.asarray(raw_state['air_temperature'])
        q = jnp.asarray(raw_state['specific_humidity'])
        o3 = jnp.asarray(raw_state['mole_fraction_of_ozone_in_air'])
        zenith = jnp.asarray(raw_state['zenith_angle'])
        mu0 = jnp.cos(zenith)
        mu0 = jnp.where(mu0 > 0.0, mu0, 0.0)
        adj = jnp.asarray(
            raw_state['flux_adjustment_for_earth_sun_distance'])
        cloud_fraction = jnp.asarray(
            raw_state['cloud_area_fraction_in_atmosphere_layer'])

        cloud_tau, cloud_omega, cloud_g = self._cloud_optics_fields(
            raw_state)
        if self._aerosol_type != 'no_aerosol':
            aer_tau = jnp.mean(jnp.asarray(raw_state[
                'shortwave_optical_thickness_due_to_aerosol']), axis=0)
            cloud_tau = cloud_tau + aer_tau
        if self._cloud_overlap == 0:
            cloud_fraction = jnp.zeros_like(cloud_fraction)

        up, down, up_clear, down_clear, hr, hr_clear = _sw_radiation(
            p_mid, p_int, T, q, o3, mu0,
            jnp.asarray(raw_state['surface_albedo_for_direct_shortwave']),
            jnp.asarray(
                raw_state['surface_albedo_for_diffuse_shortwave']),
            jnp.asarray(
                raw_state['surface_albedo_for_direct_near_infrared']),
            jnp.asarray(
                raw_state['surface_albedo_for_diffuse_near_infrared']),
            solar_constant * adj,
            cloud_tau, cloud_omega, cloud_g, cloud_fraction, g, cpd)

        tendencies = {'air_temperature': hr}
        diagnostics = {
            'upwelling_shortwave_flux_in_air': up,
            'downwelling_shortwave_flux_in_air': down,
            'upwelling_shortwave_flux_in_air_assuming_clear_sky':
                up_clear,
            'downwelling_shortwave_flux_in_air_assuming_clear_sky':
                down_clear,
            'air_temperature_tendency_from_shortwave': hr,
            'air_temperature_tendency_from_shortwave_assuming_clear_sky':
                hr_clear,
        }
        return tendencies, diagnostics
