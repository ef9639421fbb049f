"""Slab surface energy balance.

Behavioral parity with /root/reference/climt/_components/slab_surface.py:5-135:
dT_s/dt = F_net / (rho c d) with per-area-type (land / sea / land_ice /
sea_ice) masks choosing density, heat capacity, slab depth, and flux source;
ice-covered points have zero tendency (handled by IceSheet instead).

The string-valued ``area_type`` field is resolved to boolean masks on the
host (strings cannot live on device); everything after that is branchless
jnp math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.base_components import TendencyComponent


@jax.jit
def slab_surface_tendency(
        lw_down_sfc, sw_down_sfc, lw_up_sfc, sw_up_sfc,
        latent_flux, sensible_flux, soil_heat_flux, ocean_ice_flux,
        density, thermal_capacity, soil_capacity, sea_density,
        soil_thickness, ocean_thickness,
        land_mask, sea_mask, land_ice_mask, sea_ice_mask):
    net_flux = (sw_down_sfc + lw_down_sfc - sw_up_sfc - lw_up_sfc
                - sensible_flux - latent_flux)
    net_flux = jnp.where(land_ice_mask, -soil_heat_flux, net_flux)
    net_flux = jnp.where(sea_ice_mask, ocean_ice_flux, net_flux)

    density = jnp.where(sea_mask, sea_density, density)
    capacity = jnp.where(land_mask, soil_capacity, thermal_capacity)
    depth = jnp.where(sea_mask, ocean_thickness,
                      jnp.where(land_mask, soil_thickness, 0.0))

    heat_capacity_surface = density * depth * capacity
    tendency = net_flux / heat_capacity_surface
    tendency = jnp.where(land_ice_mask | sea_ice_mask, 0.0, tendency)
    return tendency, depth


class SlabSurface(TendencyComponent):
    """Surface temperature tendency of a slab land/ocean surface."""

    input_properties = {
        'downwelling_longwave_flux_in_air': {
            'dims': ['*', 'interface_levels'], 'units': 'W m^-2'},
        'downwelling_shortwave_flux_in_air': {
            'dims': ['*', 'interface_levels'], 'units': 'W m^-2'},
        'upwelling_longwave_flux_in_air': {
            'dims': ['*', 'interface_levels'], 'units': 'W m^-2'},
        'upwelling_shortwave_flux_in_air': {
            'dims': ['*', 'interface_levels'], 'units': 'W m^-2'},
        'surface_upward_latent_heat_flux': {'dims': ['*'], 'units': 'W m^-2'},
        'surface_temperature': {'dims': ['*'], 'units': 'degK'},
        'surface_upward_sensible_heat_flux': {
            'dims': ['*'], 'units': 'W m^-2'},
        'surface_thermal_capacity': {
            'dims': ['*'], 'units': 'J kg^-1 degK^-1'},
        'surface_material_density': {'dims': ['*'], 'units': 'kg m^-3'},
        'upward_heat_flux_at_ground_level_in_soil': {
            'dims': ['*'], 'units': 'W m^-2'},
        'heat_flux_into_sea_water_due_to_sea_ice': {
            'dims': ['*'], 'units': 'W m^-2'},
        'area_type': {'dims': ['*'], 'units': 'dimensionless'},
        'soil_layer_thickness': {'dims': ['*'], 'units': 'm'},
        'ocean_mixed_layer_thickness': {'dims': ['*'], 'units': 'm'},
        'heat_capacity_of_soil': {'dims': ['*'], 'units': 'J kg^-1 degK^-1'},
        'sea_water_density': {'dims': ['*'], 'units': 'kg m^-3'},
    }

    tendency_properties = {
        'surface_temperature': {'dims': ['*'], 'units': 'degK s^-1'},
    }

    diagnostic_properties = {
        'depth_of_slab_surface': {'dims': ['*'], 'units': 'm'},
    }

    def array_call(self, raw_state):
        area_type = np.asarray(raw_state['area_type']).astype(str)
        land_mask = jnp.asarray(
            (area_type == 'land') | (area_type == 'land_ice'))
        sea_mask = jnp.asarray(
            (area_type == 'sea') | (area_type == 'sea_ice'))
        land_ice_mask = jnp.asarray(area_type == 'land_ice')
        sea_ice_mask = jnp.asarray(area_type == 'sea_ice')

        tendency, depth = slab_surface_tendency(
            jnp.asarray(raw_state['downwelling_longwave_flux_in_air'][:, 0]),
            jnp.asarray(raw_state['downwelling_shortwave_flux_in_air'][:, 0]),
            jnp.asarray(raw_state['upwelling_longwave_flux_in_air'][:, 0]),
            jnp.asarray(raw_state['upwelling_shortwave_flux_in_air'][:, 0]),
            jnp.asarray(raw_state['surface_upward_latent_heat_flux']),
            jnp.asarray(raw_state['surface_upward_sensible_heat_flux']),
            jnp.asarray(
                raw_state['upward_heat_flux_at_ground_level_in_soil']),
            jnp.asarray(raw_state['heat_flux_into_sea_water_due_to_sea_ice']),
            jnp.asarray(raw_state['surface_material_density']),
            jnp.asarray(raw_state['surface_thermal_capacity']),
            jnp.asarray(raw_state['heat_capacity_of_soil']),
            jnp.asarray(raw_state['sea_water_density']),
            jnp.asarray(raw_state['soil_layer_thickness']),
            jnp.asarray(raw_state['ocean_mixed_layer_thickness']),
            land_mask, sea_mask, land_ice_mask, sea_ice_mask)

        return ({'surface_temperature': tendency},
                {'depth_of_slab_surface': depth})
