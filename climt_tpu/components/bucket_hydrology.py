"""Manabe bucket land hydrology.

Behavioral parity with
/root/reference/climt/_components/bucket_hydrology/component.py:6-194:
bulk-aerodynamic sensible/latent heat fluxes, beta-limited evaporation from a
finite soil-moisture bucket, and explicit surface-temperature and
soil-moisture updates over the timestep.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.base_components import Stepper, timestep_seconds
from ..core.constants import get_constant


@jax.jit
def bucket_step(
        lw_down_sfc, sw_down_sfc, lw_up_sfc, sw_up_sfc,
        T_s, rho, thickness, soil_capacity, soil_moisture,
        conv_precip, strat_precip, q_lowest, q_surface, T_lowest,
        v_lowest, u_lowest, dt,
        s_max, beta_param, latent_heat, bulk_coeff):
    wind_speed = jnp.sqrt(u_lowest ** 2 + v_lowest ** 2)
    potential_evaporation = bulk_coeff * wind_speed * (q_surface - q_lowest)

    precipitation_rate = conv_precip + strat_precip

    beta_factor = jnp.where(
        soil_moisture <= beta_param * s_max,
        soil_moisture / (beta_param * s_max),
        1.0)
    evaporation_rate = beta_factor * potential_evaporation

    soil_moisture_tendency = jnp.where(
        (soil_moisture < s_max) | (precipitation_rate <= evaporation_rate),
        precipitation_rate - evaporation_rate,
        0.0)

    latent_flux = latent_heat * evaporation_rate
    sensible_flux = bulk_coeff * wind_speed * (T_s - T_lowest)

    net_heat_flux = (sw_down_sfc + lw_down_sfc - sw_up_sfc - lw_up_sfc
                     - sensible_flux - latent_flux)
    heat_capacity_surface = rho * thickness * soil_capacity

    new_T_s = T_s + net_heat_flux / heat_capacity_surface * dt
    new_soil_moisture = jnp.minimum(
        soil_moisture + soil_moisture_tendency * dt, s_max)
    return (precipitation_rate, latent_flux, sensible_flux,
            evaporation_rate, new_T_s, new_soil_moisture)


class BucketHydrology(Stepper):
    """Slab surface with a Manabe moisture bucket."""

    input_properties = {
        'downwelling_longwave_flux_in_air': {
            'dims': ['*', 'interface_levels'], 'units': 'W m^-2'},
        'downwelling_shortwave_flux_in_air': {
            'dims': ['*', 'interface_levels'], 'units': 'W m^-2'},
        'upwelling_longwave_flux_in_air': {
            'dims': ['*', 'interface_levels'], 'units': 'W m^-2'},
        'upwelling_shortwave_flux_in_air': {
            'dims': ['*', 'interface_levels'], 'units': 'W m^-2'},
        'surface_temperature': {'dims': ['*'], 'units': 'degK'},
        'surface_material_density': {'dims': ['*'], 'units': 'kg m^-3'},
        'soil_layer_thickness': {'dims': ['*'], 'units': 'm'},
        'heat_capacity_of_soil': {'dims': ['*'],
                                  'units': 'J kg^-1 degK^-1'},
        'lwe_thickness_of_soil_moisture_content': {
            'dims': ['*'], 'units': 'm'},
        'convective_precipitation_rate': {'dims': ['*'], 'units': 'm s^-1'},
        'stratiform_precipitation_rate': {'dims': ['*'], 'units': 'm s^-1'},
        'specific_humidity': {'dims': ['mid_levels', '*'], 'units': 'kg/kg'},
        'surface_specific_humidity': {'dims': ['*'], 'units': 'kg/kg'},
        'air_temperature': {'dims': ['mid_levels', '*'], 'units': 'degK'},
        'northward_wind': {'dims': ['mid_levels', '*'], 'units': 'm s^-1'},
        'eastward_wind': {'dims': ['mid_levels', '*'], 'units': 'm s^-1'},
        'area_type': {'dims': ['*'], 'units': 'dimensionless'},
    }

    diagnostic_properties = {
        'precipitation_rate': {'dims': ['*'], 'units': 'm s^-1'},
        'surface_upward_latent_heat_flux': {'dims': ['*'],
                                            'units': 'W m^-2'},
        'surface_upward_sensible_heat_flux': {'dims': ['*'],
                                              'units': 'W m^-2'},
        'evaporation_rate': {'dims': ['*'], 'units': 'm s^-1'},
    }

    output_properties = {
        'surface_temperature': {'dims': ['*'], 'units': 'degK'},
        'lwe_thickness_of_soil_moisture_content': {
            'dims': ['*'], 'units': 'm'},
    }

    def __init__(self, soil_moisture_max=0.15, beta_parameter=0.75,
                 specific_latent_heat_of_water=2260000,
                 bulk_coefficient=0.0011, **kwargs):
        self._smax = soil_moisture_max
        self._beta = beta_parameter
        self._latent = specific_latent_heat_of_water
        self._bulk = bulk_coefficient
        super().__init__(**kwargs)

    def array_call(self, state, timestep):
        dt = timestep_seconds(timestep)
        (precip, latent, sensible, evap, new_ts, new_moisture) = bucket_step(
            jnp.asarray(state['downwelling_longwave_flux_in_air'][:, 0]),
            jnp.asarray(state['downwelling_shortwave_flux_in_air'][:, 0]),
            jnp.asarray(state['upwelling_longwave_flux_in_air'][:, 0]),
            jnp.asarray(state['upwelling_shortwave_flux_in_air'][:, 0]),
            jnp.asarray(state['surface_temperature']),
            jnp.asarray(state['surface_material_density']),
            jnp.asarray(state['soil_layer_thickness']),
            jnp.asarray(state['heat_capacity_of_soil']),
            jnp.asarray(state['lwe_thickness_of_soil_moisture_content']),
            jnp.asarray(state['convective_precipitation_rate']),
            jnp.asarray(state['stratiform_precipitation_rate']),
            jnp.asarray(state['specific_humidity'][0]),
            jnp.asarray(state['surface_specific_humidity']),
            jnp.asarray(state['air_temperature'][0]),
            jnp.asarray(state['northward_wind'][0]),
            jnp.asarray(state['eastward_wind'][0]),
            dt, self._smax, self._beta, self._latent, self._bulk)
        diagnostics = {
            'precipitation_rate': precip,
            'surface_upward_latent_heat_flux': latent,
            'surface_upward_sensible_heat_flux': sensible,
            'evaporation_rate': evap,
        }
        outputs = {
            'surface_temperature': new_ts,
            'lwe_thickness_of_soil_moisture_content': new_moisture,
        }
        return diagnostics, outputs
