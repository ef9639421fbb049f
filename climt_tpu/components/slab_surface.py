"""Slab surface energy balance.

Behavioral parity with /root/reference/climt/_components/slab_surface.py
(v0.31): dT_s/dt = F_net / (rho c d) with per-area-type (land / sea /
land_ice / sea_ice) masks choosing density, heat capacity, slab depth,
and flux source; ice-covered points have zero tendency (handled by
SeaIce/LandIce); open-sea points additionally receive the
``ocean_heat_transport_convergence`` q-flux, and the total applied
q-flux is re-emitted as a diagnostic.  With ``include_ekman=True`` an
Ekman heat-transport convergence is computed from the wind-stress curl
on the 2-D grid and folded into that q-flux
(slab_surface.py:110-300 of the reference).

The string-valued ``area_type`` field is resolved to boolean masks on
the host (strings cannot live on device); everything after that is
branchless jnp math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.base_components import TendencyComponent
from ..core.constants import get_constant
from ..ops.horizontal import curl_z, divergence


@jax.jit
def slab_surface_tendency(
        lw_down_sfc, sw_down_sfc, lw_up_sfc, sw_up_sfc,
        latent_flux, sensible_flux, soil_heat_flux, ocean_ice_flux,
        q_flux_total,
        density, thermal_capacity, soil_capacity, sea_density,
        soil_thickness, ocean_thickness,
        land_mask, sea_mask, land_ice_mask, sea_ice_mask):
    net_flux = (sw_down_sfc + lw_down_sfc - sw_up_sfc - lw_up_sfc
                - sensible_flux - latent_flux)
    net_flux = jnp.where(land_ice_mask, -soil_heat_flux, net_flux)
    net_flux = jnp.where(sea_ice_mask, ocean_ice_flux, net_flux)
    # prescribed + Ekman ocean heat-transport convergence on open sea
    net_flux = net_flux + jnp.where(sea_mask & ~sea_ice_mask,
                                    q_flux_total, 0.0)

    density = jnp.where(sea_mask, sea_density, density)
    capacity = jnp.where(land_mask, soil_capacity, thermal_capacity)
    depth = jnp.where(sea_mask, ocean_thickness,
                      jnp.where(land_mask, soil_thickness, 0.0))

    heat_capacity_surface = density * depth * capacity
    tendency = jnp.where(heat_capacity_surface != 0.0,
                         net_flux / heat_capacity_surface, 0.0)
    tendency = jnp.where(land_ice_mask | sea_ice_mask, 0.0, tendency)
    return tendency, depth


@jax.jit
def ekman_q_flux(tau_x, tau_y, lat2d, lon2d, theta2d, rho2d,
                 open_ocean, omega, c_sw, f_floor):
    """Ekman heat-transport convergence and pumping on the 2-D grid.

    Wind stress is zeroed over non-sea cells BEFORE differentiating
    (no-flux-at-coast treatment); w_ek uses the local-f approximation
    (curl of raw stress / (rho f)) while the transport keeps the full
    1/f variation — matching the reference's documented conventions.
    """
    tau_x = jnp.where(open_ocean, tau_x, 0.0)
    tau_y = jnp.where(open_ocean, tau_y, 0.0)
    f = 2.0 * omega * jnp.sin(jnp.deg2rad(lat2d))
    f_sign = jnp.where(f >= 0.0, 1.0, -1.0)
    f_capped = f_sign * jnp.maximum(jnp.abs(f), f_floor)
    mx = tau_y / f_capped
    my = -tau_x / f_capped
    w_ek = curl_z(tau_x, tau_y, lat2d, lon2d) / (f_capped * rho2d)
    q_ekman = -c_sw * divergence(theta2d * mx, theta2d * my, lat2d, lon2d)
    q_ekman = jnp.where(open_ocean, q_ekman, 0.0)
    w_ek = jnp.where(open_ocean, w_ek, 0.0)
    return q_ekman, w_ek


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
        'ocean_heat_transport_convergence': {
            'dims': ['*'], 'units': 'W m^-2'},
    }

    tendency_properties = {
        'surface_temperature': {'dims': ['*'], 'units': 'degK s^-1'},
    }

    diagnostic_properties = {
        'depth_of_slab_surface': {'dims': ['*'], 'units': 'm'},
        'ocean_heat_transport_convergence': {
            'dims': ['*'], 'units': 'W m^-2'},
    }

    def __init__(self, include_ekman=False,
                 equatorial_ekman_cap_latitude=5.0, **kwargs):
        """include_ekman adds a wind-stress-curl Ekman convergence to the
        applied q-flux (and the ekman_* breakdown diagnostics); the
        Coriolis parameter is capped below equatorial_ekman_cap_latitude
        degrees to avoid the equatorial singularity."""
        self._include_ekman = include_ekman
        self._eq_cap = equatorial_ekman_cap_latitude
        if include_ekman:
            self.input_properties = dict(self.input_properties)
            self.input_properties.update({
                'surface_downward_eastward_stress': {
                    'dims': ['lat', 'lon'], 'units': 'N m^-2'},
                'surface_downward_northward_stress': {
                    'dims': ['lat', 'lon'], 'units': 'N m^-2'},
                'latitude': {'dims': ['lat', 'lon'],
                             'units': 'degrees_north'},
                'longitude': {'dims': ['lat', 'lon'],
                              'units': 'degrees_east'},
            })
            self.diagnostic_properties = dict(self.diagnostic_properties)
            self.diagnostic_properties.update({
                'ekman_heat_transport_convergence': {
                    'dims': ['*'], 'units': 'W m^-2'},
                'ekman_pumping': {'dims': ['*'], 'units': 'm s^-1'},
            })
        super().__init__(**kwargs)

    def array_call(self, raw_state):
        area_type = np.asarray(raw_state['area_type']).astype(str)
        land_mask = jnp.asarray(
            (area_type == 'land') | (area_type == 'land_ice'))
        sea_mask = jnp.asarray(
            (area_type == 'sea') | (area_type == 'sea_ice'))
        land_ice_mask = jnp.asarray(area_type == 'land_ice')
        sea_ice_mask = jnp.asarray(area_type == 'sea_ice')

        q_flux = jnp.asarray(raw_state['ocean_heat_transport_convergence'])
        diagnostics = {}
        if self._include_ekman:
            lat2d = jnp.asarray(raw_state['latitude'])
            lon2d = jnp.asarray(raw_state['longitude'])
            if lat2d.ndim == 1:
                lat2d = lat2d.reshape(-1, 1)
                lon2d = lon2d.reshape(-1, 1)
            shape2d = lat2d.shape
            open_ocean = jnp.asarray(
                area_type == 'sea').reshape(shape2d)
            tau_x = jnp.asarray(
                raw_state['surface_downward_eastward_stress']
            ).reshape(shape2d)
            tau_y = jnp.asarray(
                raw_state['surface_downward_northward_stress']
            ).reshape(shape2d)
            theta2d = jnp.asarray(
                raw_state['surface_temperature']).reshape(shape2d)
            rho2d = jnp.asarray(
                raw_state['sea_water_density']).reshape(shape2d)
            omega = get_constant('planetary_rotation_rate', 's^-1')
            c_sw = get_constant('heat_capacity_of_sea_water', 'J/kg/degK')
            f_floor = 2.0 * omega * np.sin(np.deg2rad(self._eq_cap))
            q_ekman, w_ek = ekman_q_flux(
                tau_x, tau_y, lat2d, lon2d, theta2d, rho2d, open_ocean,
                omega, c_sw, f_floor)
            q_flux = q_flux + q_ekman.reshape(q_flux.shape)
            diagnostics['ekman_heat_transport_convergence'] = \
                q_ekman.reshape(q_flux.shape)
            diagnostics['ekman_pumping'] = w_ek.reshape(q_flux.shape)

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
            q_flux,
            jnp.asarray(raw_state['surface_material_density']),
            jnp.asarray(raw_state['surface_thermal_capacity']),
            jnp.asarray(raw_state['heat_capacity_of_soil']),
            jnp.asarray(raw_state['sea_water_density']),
            jnp.asarray(raw_state['soil_layer_thickness']),
            jnp.asarray(raw_state['ocean_mixed_layer_thickness']),
            land_mask, sea_mask, land_ice_mask, sea_ice_mask)

        diagnostics['depth_of_slab_surface'] = depth
        diagnostics['ocean_heat_transport_convergence'] = q_flux
        return {'surface_temperature': tendency}, diagnostics
