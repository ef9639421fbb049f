"""RRTMGLongwave: multi-band longwave radiative transfer.

API parity with /root/reference/climt/_components/rrtmg/lw/component.py:24-470
(inputs incl. all trace gases, per-band surface emissivity, cloud water/ice
paths and particle sizes, direct-input cloud/aerosol optical thickness;
outputs all-sky and clear-sky fluxes and heating rates; constructor options
incl. the McICA flags with the reference's configuration advisories).

Radiative core: the 9-band gas-optics model of ``gas_optics`` (exact band
Planck fractions, pressure-scaled absorber paths, diffusivity-factor
transfer) with Ebert & Curry (1992)-type cloud longwave absorption and
max-overlap cloud/clear blending.  The full 140-g-point correlated-k gas
optics is the planned internal upgrade (same API).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.base_components import TendencyComponent
from ...core.constants import get_constant
from ...core.util import get_interface_values
from .common import (
    rrtmg_cloud_ice_props_dict, rrtmg_cloud_liquid_props_dict,
    rrtmg_cloud_overlap_method_dict, rrtmg_cloud_props_dict,
    rrtmg_random_number_dict, validate_mcica_options)
from .gas_optics import (
    NUM_LW_BANDS, lw_band_optical_depth, longwave_fluxes)


@jax.jit
def _lw_radiation(p_mid, p_int, T, T_sfc, q, o3, co2, emissivity,
                  cloud_tau_grey, cloud_fraction, g, cpd, sigma):
    """All-sky + clear-sky LW fluxes and heating rates.

    Shapes: (nz, ncol) mid-level fields, (nz+1, ncol) interfaces,
    (ncol,) surface; cloud_tau_grey (nz, ncol) grey cloud optical depth;
    emissivity (ncol,) band-mean.
    """
    dp = p_int[:-1] - p_int[1:]
    T_int = get_interface_values(T, T_sfc, p_mid, p_int)

    tau_gas = lw_band_optical_depth(dp, q, co2, o3, p_mid, T)
    emis_bands = jnp.broadcast_to(emissivity[None],
                                  (NUM_LW_BANDS, emissivity.shape[0]))

    up_clear, down_clear = longwave_fluxes(
        tau_gas, T, T_int, T_sfc, emis_bands, sigma)

    tau_cloudy = tau_gas + cloud_tau_grey[None]
    up_cloudy, down_cloudy = longwave_fluxes(
        tau_cloudy, T, T_int, T_sfc, emis_bands, sigma)

    # maximum-overlap total cloud cover blending
    c_tot = jnp.max(cloud_fraction, axis=0)
    up = c_tot * up_cloudy + (1.0 - c_tot) * up_clear
    down = c_tot * down_cloudy + (1.0 - c_tot) * down_clear

    def heating(up_f, down_f):
        net = up_f - down_f
        return (g / cpd) * (net[1:] - net[:-1]) / (p_int[1:] - p_int[:-1])

    hr = heating(up, down) * 86400.0
    hr_clear = heating(up_clear, down_clear) * 86400.0
    return up, down, up_clear, down_clear, hr, hr_clear


class RRTMGLongwave(TendencyComponent):
    """Longwave radiative transfer with the RRTMG interface."""

    num_longwave_bands = 16
    num_reduced_g_intervals = 140

    input_properties = {
        'air_pressure': {'dims': ['mid_levels', '*'], 'units': 'mbar'},
        'air_pressure_on_interface_levels': {
            'dims': ['interface_levels', '*'], 'units': 'mbar'},
        'air_temperature': {'dims': ['mid_levels', '*'], 'units': 'degK'},
        'surface_temperature': {'dims': ['*'], 'units': 'degK'},
        'specific_humidity': {'dims': ['mid_levels', '*'], 'units': 'g/g'},
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
        'mole_fraction_of_cfc11_in_air': {
            'dims': ['mid_levels', '*'], 'units': 'dimensionless'},
        'mole_fraction_of_cfc12_in_air': {
            'dims': ['mid_levels', '*'], 'units': 'dimensionless'},
        'mole_fraction_of_cfc22_in_air': {
            'dims': ['mid_levels', '*'], 'units': 'dimensionless'},
        'mole_fraction_of_carbon_tetrachloride_in_air': {
            'dims': ['mid_levels', '*'], 'units': 'dimensionless'},
        'surface_longwave_emissivity': {
            'dims': ['num_longwave_bands', '*'], 'units': 'dimensionless'},
        'cloud_area_fraction_in_atmosphere_layer': {
            'dims': ['mid_levels', '*'], 'units': 'dimensionless'},
        'longwave_optical_thickness_due_to_cloud': {
            'dims': ['mid_levels', '*', 'num_longwave_bands'],
            'units': 'dimensionless'},
        'mass_content_of_cloud_ice_in_atmosphere_layer': {
            'dims': ['mid_levels', '*'], 'units': 'g m^-2'},
        'mass_content_of_cloud_liquid_water_in_atmosphere_layer': {
            'dims': ['mid_levels', '*'], 'units': 'g m^-2'},
        'cloud_ice_particle_size': {
            'dims': ['mid_levels', '*'], 'units': 'micrometer'},
        'cloud_water_droplet_radius': {
            'dims': ['mid_levels', '*'], 'units': 'micrometer'},
        'longwave_optical_thickness_due_to_aerosol': {
            'dims': ['num_longwave_bands', 'mid_levels', '*'],
            'units': 'dimensionless'},
    }

    tendency_properties = {
        'air_temperature': {'dims': ['mid_levels', '*'],
                            'units': 'degK day^-1'},
    }

    diagnostic_properties = {
        'upwelling_longwave_flux_in_air': {
            'dims': ['interface_levels', '*'], 'units': 'W m^-2'},
        'downwelling_longwave_flux_in_air': {
            'dims': ['interface_levels', '*'], 'units': 'W m^-2'},
        'upwelling_longwave_flux_in_air_assuming_clear_sky': {
            'dims': ['interface_levels', '*'], 'units': 'W m^-2'},
        'downwelling_longwave_flux_in_air_assuming_clear_sky': {
            'dims': ['interface_levels', '*'], 'units': 'W m^-2'},
        'air_temperature_tendency_from_longwave_assuming_clear_sky': {
            'dims': ['mid_levels', '*'], 'units': 'degK day^-1'},
        'air_temperature_tendency_from_longwave': {
            'dims': ['mid_levels', '*'], 'units': 'degK day^-1'},
    }

    def __init__(self, calculate_change_up_flux=False,
                 cloud_overlap_method=None,
                 cloud_optical_properties='liquid_and_ice_clouds',
                 cloud_ice_properties='ebert_curry_two',
                 cloud_liquid_water_properties='radius_dependent_absorption',
                 calculate_interface_temperature=True,
                 mcica=False,
                 random_number_generator='mersenne_twister',
                 **kwargs):
        cloud_overlap_method = cloud_overlap_method or 'random'
        validate_mcica_options(mcica, cloud_overlap_method,
                               cloud_optical_properties)
        self._cloud_overlap = rrtmg_cloud_overlap_method_dict[
            cloud_overlap_method]
        self._cloud_optics = rrtmg_cloud_props_dict[
            cloud_optical_properties]
        self._ice_props = rrtmg_cloud_ice_props_dict[cloud_ice_properties]
        self._liquid_props = rrtmg_cloud_liquid_props_dict[
            cloud_liquid_water_properties]
        self._mcica = mcica
        self._rng = rrtmg_random_number_dict[random_number_generator]
        self._calc_dflxdt = calculate_change_up_flux
        self._interface_t = calculate_interface_temperature
        if not calculate_interface_temperature:
            self.input_properties = dict(self.input_properties)
            self.input_properties['air_temperature_on_interface_levels'] = {
                'dims': ['interface_levels', '*'], 'units': 'degK'}
        super().__init__(**kwargs)

    def _cloud_optical_depth(self, raw_state):
        """Grey longwave cloud optical depth per layer."""
        if self._cloud_overlap == 0:  # clear_only
            return jnp.zeros_like(
                jnp.asarray(raw_state['air_temperature']))
        if self._cloud_optics == 0:  # direct_input, per-band -> band mean
            tau = jnp.asarray(
                raw_state['longwave_optical_thickness_due_to_cloud'])
            return jnp.mean(tau, axis=-1)
        lwp = jnp.asarray(raw_state[
            'mass_content_of_cloud_liquid_water_in_atmosphere_layer'])
        iwp = jnp.asarray(raw_state[
            'mass_content_of_cloud_ice_in_atmosphere_layer'])
        r_ice = jnp.asarray(raw_state['cloud_ice_particle_size'])
        # Ebert & Curry (1992) broadband ice emissivity coefficients;
        # liquid mass absorption ~0.09 m^2/g
        tau_ice = iwp * (0.003448 + 2.431 / jnp.maximum(r_ice, 5.0))
        tau_liq = 0.09 * lwp
        return tau_ice + tau_liq

    def array_call(self, raw_state):
        g = get_constant('gravitational_acceleration', 'm/s^2')
        cpd = get_constant(
            'heat_capacity_of_dry_air_at_constant_pressure', 'J/kg/degK')
        sigma = get_constant('stefan_boltzmann_constant', 'W/m^2/K^4')

        p_mid = jnp.asarray(raw_state['air_pressure']) * 100.0
        p_int = jnp.asarray(
            raw_state['air_pressure_on_interface_levels']) * 100.0
        T = jnp.asarray(raw_state['air_temperature'])
        T_sfc = jnp.asarray(raw_state['surface_temperature'])
        q = jnp.asarray(raw_state['specific_humidity'])
        o3 = jnp.asarray(raw_state['mole_fraction_of_ozone_in_air'])
        co2 = jnp.asarray(
            raw_state['mole_fraction_of_carbon_dioxide_in_air'])
        emissivity = jnp.mean(jnp.asarray(
            raw_state['surface_longwave_emissivity']), axis=0)
        cloud_fraction = jnp.asarray(
            raw_state['cloud_area_fraction_in_atmosphere_layer'])
        aerosol_tau = jnp.mean(jnp.asarray(
            raw_state['longwave_optical_thickness_due_to_aerosol']),
            axis=0)

        cloud_tau = self._cloud_optical_depth(raw_state) + aerosol_tau
        if self._cloud_overlap == 0:
            cloud_fraction = jnp.zeros_like(cloud_fraction)

        up, down, up_clear, down_clear, hr, hr_clear = _lw_radiation(
            p_mid, p_int, T, T_sfc, q, o3, co2, emissivity,
            cloud_tau, cloud_fraction, g, cpd, sigma)

        tendencies = {'air_temperature': hr}
        diagnostics = {
            'upwelling_longwave_flux_in_air': up,
            'downwelling_longwave_flux_in_air': down,
            'upwelling_longwave_flux_in_air_assuming_clear_sky': up_clear,
            'downwelling_longwave_flux_in_air_assuming_clear_sky':
                down_clear,
            'air_temperature_tendency_from_longwave': hr,
            'air_temperature_tendency_from_longwave_assuming_clear_sky':
                hr_clear,
        }
        return tendencies, diagnostics
