"""Manabe bucket land hydrology.

Behavioral parity with
/root/reference/climt/_components/bucket_hydrology/component.py (v0.31):
bulk-aerodynamic sensible/latent heat fluxes WITH the air-density
factors (the v0.30 dimensional fix — the fluxes are mass fluxes, so
rho enters both, and the evaporation rate is the liquid-water-equivalent
depth rate E/rho_water), beta-limited evaporation from a finite
soil-moisture bucket, and explicit surface-temperature and soil-moisture
updates.  ``num_layers=2`` adds a deep soil moisture/temperature store
with saturation-gradient exchange, optional drainage, overflow runoff,
and conductive thermal coupling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.base_components import Stepper, timestep_seconds
from ..core.constants import get_constant


@functools.partial(jax.jit, static_argnames=('two_layer', 'have_tau_drain'))
def bucket_step(
        lw_down_sfc, sw_down_sfc, lw_up_sfc, sw_up_sfc,
        T_s, rho_surf, thickness, soil_capacity, soil_moisture,
        conv_precip, strat_precip, q_lowest, q_surface, T_lowest,
        p_lowest, v_lowest, u_lowest, w_deep, T_deep, dt,
        s_max, beta_param, latent_heat, bulk_coeff, rd, cp, rho_water,
        deep_smax, tau_m, deep_ratio, tau_drain,
        two_layer, have_tau_drain):
    wind_speed = jnp.sqrt(u_lowest ** 2 + v_lowest ** 2)
    # lowest-level air density from the ideal gas law: the bulk formulae
    # are mass fluxes (reference HISTORY v0.30 dimensional fix)
    air_density = p_lowest / (rd * T_lowest)
    potential_evap_mass = (air_density * bulk_coeff * wind_speed
                           * (q_surface - q_lowest))

    precipitation_rate = conv_precip + strat_precip

    beta_factor = jnp.where(
        soil_moisture <= beta_param * s_max,
        soil_moisture / (beta_param * s_max), 1.0)
    evaporative_mass_flux = beta_factor * potential_evap_mass
    evaporation_rate = evaporative_mass_flux / rho_water

    latent_flux = latent_heat * evaporative_mass_flux
    sensible_flux = (air_density * cp * bulk_coeff * wind_speed
                     * (T_s - T_lowest))

    net_heat_flux = (sw_down_sfc + lw_down_sfc - sw_up_sfc - lw_up_sfc
                     - sensible_flux - latent_flux)

    if not two_layer:
        soil_moisture_tendency = jnp.where(
            (soil_moisture < s_max)
            | (precipitation_rate <= evaporation_rate),
            precipitation_rate - evaporation_rate, 0.0)
        heat_capacity_surface = rho_surf * thickness * soil_capacity
        new_T_s = T_s + net_heat_flux / heat_capacity_surface * dt
        new_soil = jnp.minimum(
            soil_moisture + soil_moisture_tendency * dt, s_max)
        zero = jnp.zeros_like(T_s)
        return (precipitation_rate, latent_flux, sensible_flux,
                evaporation_rate, new_T_s, new_soil,
                zero, zero, zero, zero)

    # two-layer mode: shallow<->deep exchange toward equal relative
    # saturation, optional deep drainage, overflow runoff, and
    # conductive shallow/deep thermal coupling
    f_sd = ((soil_moisture / s_max - w_deep / deep_smax)
            * (0.5 * (s_max + deep_smax)) / tau_m)
    drain = (w_deep / tau_drain) if have_tau_drain \
        else jnp.zeros_like(w_deep)

    w_s_new = soil_moisture + (precipitation_rate - evaporation_rate
                               - f_sd) * dt
    w_d_new = w_deep + (f_sd - drain) * dt
    over_s = jnp.maximum(w_s_new - s_max, 0.0)
    over_d = jnp.maximum(w_d_new - deep_smax, 0.0)
    runoff = (over_s + over_d) / dt
    w_s_new = jnp.clip(w_s_new - over_s, 0.0, s_max)
    w_d_new = jnp.clip(w_d_new - over_d, 0.0, deep_smax)

    k_soil = 2.0                      # W/m/degK (reference constant)
    dz_s = thickness
    dz_d = deep_ratio * thickness
    c_s = rho_surf * dz_s * soil_capacity
    c_d = rho_surf * dz_d * soil_capacity
    g_sd = k_soil * (T_s - T_deep) / (0.5 * (dz_s + dz_d))
    new_T_s = T_s + (net_heat_flux - g_sd) / c_s * dt
    new_T_d = T_deep + g_sd / c_d * dt
    return (precipitation_rate, latent_flux, sensible_flux,
            evaporation_rate, new_T_s, w_s_new,
            new_T_d, w_d_new, runoff, w_d_new / deep_smax)


class BucketHydrology(Stepper):
    """Slab surface with a Manabe moisture bucket (one or two layers)."""

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
        'heat_capacity_of_soil': {
            'dims': ['*'], 'units': 'J kg^-1 degK^-1'},
        'lwe_thickness_of_soil_moisture_content': {
            'dims': ['*'], 'units': 'm'},
        'convective_precipitation_rate': {
            'dims': ['*'], 'units': 'm s^-1'},
        'stratiform_precipitation_rate': {
            'dims': ['*'], 'units': 'm s^-1'},
        'specific_humidity': {'dims': ['mid_levels', '*'],
                              'units': 'kg/kg'},
        'surface_specific_humidity': {'dims': ['*'], 'units': 'kg/kg'},
        'air_temperature': {'dims': ['mid_levels', '*'], 'units': 'degK'},
        'air_pressure': {'dims': ['mid_levels', '*'], 'units': 'Pa'},
        'northward_wind': {'dims': ['mid_levels', '*'],
                           'units': 'm s^-1'},
        'eastward_wind': {'dims': ['mid_levels', '*'], 'units': 'm s^-1'},
        'area_type': {'dims': ['*'], 'units': 'dimensionless'},
    }

    diagnostic_properties = {
        'precipitation_rate': {'dims': ['*'], 'units': 'm s^-1'},
        'surface_upward_latent_heat_flux': {
            'dims': ['*'], 'units': 'W m^-2'},
        'surface_upward_sensible_heat_flux': {
            'dims': ['*'], 'units': 'W m^-2'},
        'evaporation_rate': {'dims': ['*'], 'units': 'm s^-1'},
    }

    output_properties = {
        'surface_temperature': {'dims': ['*'], 'units': 'degK'},
        'lwe_thickness_of_soil_moisture_content': {
            'dims': ['*'], 'units': 'm'},
    }

    def __init__(self, num_layers=1, soil_moisture_max=0.15,
                 beta_parameter=0.75,
                 specific_latent_heat_of_water=2260000,
                 bulk_coefficient=0.0011, deep_soil_moisture_max=0.50,
                 moisture_diffusion_timescale=None,
                 deep_layer_thickness_ratio=10.0,
                 deep_drainage_timescale=None, **kwargs):
        """num_layers=2 adds a deep moisture/temperature store (exchange
        toward equal relative saturation on moisture_diffusion_timescale,
        optional deep_drainage_timescale, overflow runoff_rate)."""
        if num_layers not in (1, 2):
            raise ValueError('num_layers must be 1 or 2')
        self._num_layers = num_layers
        self._smax = soil_moisture_max
        self._beta = beta_parameter
        self._latent = specific_latent_heat_of_water
        self._bulk = bulk_coefficient
        self._deep_smax = deep_soil_moisture_max
        self._tau_m = moisture_diffusion_timescale
        self._deep_ratio = deep_layer_thickness_ratio
        self._tau_drain = deep_drainage_timescale
        if num_layers == 2:
            self.input_properties = dict(self.input_properties)
            self.input_properties.update({
                'deep_soil_moisture_content': {
                    'dims': ['*'], 'units': 'm'},
                'deep_soil_temperature': {'dims': ['*'], 'units': 'degK'},
            })
            self.output_properties = dict(self.output_properties)
            self.output_properties.update({
                'deep_soil_moisture_content': {
                    'dims': ['*'], 'units': 'm'},
                'deep_soil_temperature': {'dims': ['*'], 'units': 'degK'},
            })
            self.diagnostic_properties = dict(self.diagnostic_properties)
            self.diagnostic_properties.update({
                'runoff_rate': {'dims': ['*'], 'units': 'm s^-1'},
                'deep_soil_moisture_fraction': {
                    'dims': ['*'], 'units': 'dimensionless'},
            })
        super().__init__(**kwargs)

    def array_call(self, raw_state, timestep):
        dt = timestep_seconds(timestep)
        rd = get_constant('gas_constant_of_dry_air', 'J kg^-1 K^-1')
        cp = get_constant(
            'heat_capacity_of_dry_air_at_constant_pressure',
            'J kg^-1 K^-1')
        rho_water = get_constant('density_of_liquid_water', 'kg m^-3')
        two_layer = self._num_layers == 2
        zero = jnp.zeros_like(jnp.asarray(raw_state['surface_temperature']))
        w_deep = (jnp.asarray(raw_state['deep_soil_moisture_content'])
                  if two_layer else zero)
        T_deep = (jnp.asarray(raw_state['deep_soil_temperature'])
                  if two_layer else zero)
        tau_m = self._tau_m if self._tau_m is not None else 5 * 86400.0
        tau_drain = self._tau_drain if self._tau_drain is not None else 1.0

        (precip, latent, sensible, evap, new_T_s, new_soil,
         new_T_d, new_w_d, runoff, deep_frac) = bucket_step(
            jnp.asarray(raw_state['downwelling_longwave_flux_in_air'][:, 0]),
            jnp.asarray(
                raw_state['downwelling_shortwave_flux_in_air'][:, 0]),
            jnp.asarray(raw_state['upwelling_longwave_flux_in_air'][:, 0]),
            jnp.asarray(raw_state['upwelling_shortwave_flux_in_air'][:, 0]),
            jnp.asarray(raw_state['surface_temperature']),
            jnp.asarray(raw_state['surface_material_density']),
            jnp.asarray(raw_state['soil_layer_thickness']),
            jnp.asarray(raw_state['heat_capacity_of_soil']),
            jnp.asarray(
                raw_state['lwe_thickness_of_soil_moisture_content']),
            jnp.asarray(raw_state['convective_precipitation_rate']),
            jnp.asarray(raw_state['stratiform_precipitation_rate']),
            jnp.asarray(raw_state['specific_humidity'][0]),
            jnp.asarray(raw_state['surface_specific_humidity']),
            jnp.asarray(raw_state['air_temperature'][0]),
            jnp.asarray(raw_state['air_pressure'][0]),
            jnp.asarray(raw_state['northward_wind'][0]),
            jnp.asarray(raw_state['eastward_wind'][0]),
            w_deep, T_deep, dt,
            self._smax, self._beta, self._latent, self._bulk,
            rd, cp, rho_water,
            self._deep_smax, tau_m, self._deep_ratio, tau_drain,
            two_layer, self._tau_drain is not None)

        diagnostics = {
            'precipitation_rate': precip,
            'surface_upward_latent_heat_flux': latent,
            'surface_upward_sensible_heat_flux': sensible,
            'evaporation_rate': evap,
        }
        new_state = {
            'surface_temperature': new_T_s,
            'lwe_thickness_of_soil_moisture_content': new_soil,
        }
        if two_layer:
            new_state['deep_soil_moisture_content'] = new_w_d
            new_state['deep_soil_temperature'] = new_T_d
            diagnostics['runoff_rate'] = runoff
            diagnostics['deep_soil_moisture_fraction'] = deep_frac
        return diagnostics, new_state
