"""1-D snow/ice energy-balance model (Crank-Nicolson heat conduction).

Behavioral parity with
/root/reference/climt/_components/surface_ice.py:8-395: a vertical snow+ice
column per grid point with Crank-Nicolson conduction, Dirichlet bottom
boundary (melting temperature over ocean, soil temperature over land), a
flux (Neumann) or melting-point Dirichlet top boundary, ice growth from the
ocean heat flux, surface melting, and albedo diagnosis.

TPU-native design: the reference's per-column Python loop with scipy
spsolve (:183-343) becomes a single batched Thomas solve over all columns
(ops/tridiagonal.py), with the branchy per-column conditions (area type,
melting state, the conditional "cool-from-melting" re-solve) expressed as
``jnp.where`` masks; the re-solve branch is computed as a second batched
solve and selected per column.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.base_components import Stepper, timestep_seconds
from ..core.constants import get_constant
from ..ops.tridiagonal import tridiagonal_solve

_EPSILON = 1e-5


def _solve_conduction(rho, cp, kappa, temp, dt, dz, surf_temp, net_flux,
                      bottom_temp, melting_temperature):
    """Batched Crank-Nicolson solve for the new ice temperature profile.

    All arrays are (n_layers[, ncol]); profile index 0 is the BOTTOM of the
    ice column.  ``rho``, ``cp``, ``kappa`` are layer properties of the
    n_layers-1 layers between temperature nodes.
    """
    n = temp.shape[0]
    heat_capacity = rho * cp
    hc_int = 0.5 * (heat_capacity[:-1] + heat_capacity[1:])
    k_int = 0.5 * (kappa[:-1] + kappa[1:])

    mu_inv = dt / (hc_int * 2.0 * dz * dz)       # (n-2, ...)

    r = jnp.zeros_like(temp).at[1:-1].set(k_int * mu_inv)
    dp = 1.0 + 2.0 * r
    dm = 1.0 - 2.0 * r

    a_sub = jnp.zeros_like(temp).at[1:-1].set(-mu_inv * kappa[:-1])
    a_sup = jnp.zeros_like(temp).at[1:-1].set(-mu_inv * kappa[1:])

    # rhs = (I + A) T with the explicit half of the operator
    rhs = dm * temp
    rhs = rhs.at[1:-1].add(mu_inv * kappa[:-1] * temp[:-2]
                           + mu_inv * kappa[1:] * temp[2:])

    # top boundary: flux condition below melting, Dirichlet at melting above
    below_melting = surf_temp < melting_temperature - _EPSILON
    a_sub_top = jnp.where(below_melting, 1.0, 0.0)
    diag_top = jnp.where(below_melting, -1.0, 1.0)
    rhs_top = jnp.where(below_melting,
                        -net_flux * dz / kappa[-1],
                        melting_temperature)
    a_sub = a_sub.at[-1].set(a_sub_top)
    dp = dp.at[-1].set(diag_top)
    a_sup = a_sup.at[-1].set(0.0)
    rhs = rhs.at[-1].set(rhs_top)

    # bottom boundary: Dirichlet
    dp = dp.at[0].set(1.0)
    a_sup = a_sup.at[0].set(0.0)
    a_sub = a_sub.at[0].set(0.0)
    rhs = rhs.at[0].set(bottom_temp)

    return tridiagonal_solve(a_sub, dp, a_sup, rhs)


@jax.jit
def ice_sheet_step(net_heat_flux, temp_profile, snow_height, land_ice_height,
                   sea_ice_height, soil_surface_temperature,
                   land_mask, land_ice_mask, sea_ice_mask,
                   dt, max_height, k_ice, k_snow, rho_ice, rho_snow,
                   c_ice, c_snow, lf, melting_temperature):
    """One IceSheet step over all columns at once.

    Returns new (temp_profile, surface_temperature, sea_ice_height,
    snow_height, heights, diagnostics...).
    """
    n_layers = temp_profile.shape[0]
    nz_mat = n_layers - 1  # material layers between temperature nodes

    total_height = jnp.where(
        land_ice_mask, land_ice_height + snow_height,
        jnp.where(sea_ice_mask, sea_ice_height + snow_height,
                  jnp.where(land_mask, snow_height, 0.0)))

    active = (total_height >= _EPSILON) & (
        land_mask | land_ice_mask | (sea_ice_mask & (sea_ice_height > 0)))
    # guard: inactive columns get a dummy height to avoid div-by-zero
    safe_height = jnp.where(active, total_height, 1.0)
    dz = safe_height / n_layers

    snow_fraction = snow_height / safe_height
    level_idx = jnp.arange(nz_mat)[:, None]
    snow_level = (((1.0 - snow_fraction) * n_layers).astype(jnp.int32) - 1)
    is_snow = level_idx > snow_level[None, :]

    rho = jnp.where(is_snow, rho_snow, rho_ice)
    cp = jnp.where(is_snow, c_snow, c_ice)
    kappa = jnp.where(is_snow, k_snow, k_ice)

    surf_temp = temp_profile[-1]
    # bottom boundary: melting temperature over ocean, soil T over land
    bottom_temp = jnp.where(land_mask | land_ice_mask,
                            soil_surface_temperature,
                            melting_temperature)

    new_temp = _solve_conduction(
        rho, cp, kappa, temp_profile, dt, dz, surf_temp, net_heat_flux,
        bottom_temp, melting_temperature)

    # if the surface was at melting but conduction exceeds the forcing,
    # cool the surface slightly below melting and re-solve (reference
    # surface_ice.py:246-260)
    flux_through_ice = ((new_temp[-1] - new_temp[-2])
                        * (kappa[-1] + kappa[-2]) * 0.5 / dz)
    at_melting = temp_profile[-1] > melting_temperature - _EPSILON
    need_resolve = at_melting & (flux_through_ice > net_heat_flux)

    cooled_profile = temp_profile.at[-1].add(
        jnp.where(need_resolve, -10 * _EPSILON, 0.0))
    resolved_temp = _solve_conduction(
        rho, cp, kappa, cooled_profile, dt, dz,
        cooled_profile[-1], net_heat_flux, bottom_temp,
        melting_temperature)
    new_temp = jnp.where(need_resolve[None, :], resolved_temp, new_temp)

    check_melting = (surf_temp >= melting_temperature - _EPSILON) \
        & ~need_resolve

    # sea-ice bottom energy balance: conductive flux into the ocean grows ice
    heat_flux_to_sea_water = jnp.round(
        (new_temp[1] - new_temp[0]) * (kappa[0] + kappa[1]) * 0.5 / dz, 6)
    heat_flux_to_sea_water = jnp.minimum(heat_flux_to_sea_water, 0.0)
    height_of_growing_ice = jnp.where(
        sea_ice_mask & active,
        -heat_flux_to_sea_water * dt / (rho[0] * lf),
        0.0)

    # land: upward conductive flux into the soil
    heat_flux_to_land = (new_temp[0] - new_temp[1]) * kappa[0] / dz

    flux_through_ice = ((new_temp[-1] - new_temp[-2])
                        * (kappa[-1] + kappa[-2]) * 0.5 / dz)

    # surface melt: excess of forcing over conduction melts snow, then ice
    energy_to_melt = jnp.round((net_heat_flux - flux_through_ice) * dt, 6)
    energy_to_melt = jnp.maximum(energy_to_melt, 0.0)
    height_of_melting_ice = jnp.where(
        check_melting & active, energy_to_melt / (rho[-1] * lf), 0.0)

    melts_all_snow = height_of_melting_ice > snow_height
    new_snow_height = jnp.where(
        active,
        jnp.where(melts_all_snow, 0.0,
                  snow_height - height_of_melting_ice),
        snow_height)
    new_sea_ice = jnp.where(
        active,
        sea_ice_height + height_of_growing_ice
        - jnp.where(melts_all_snow,
                    height_of_melting_ice - snow_height, 0.0),
        sea_ice_height)

    new_total_height = total_height + height_of_growing_ice \
        + height_of_melting_ice

    out_temp = jnp.where(active[None, :], new_temp, temp_profile)
    out_surface_temperature = out_temp[-1]
    heights = jnp.linspace(0.0, 1.0, n_layers)[:, None] * jnp.where(
        active, new_total_height, 0.0)[None, :]

    diag_soil_flux = jnp.where((land_mask | land_ice_mask) & active,
                               heat_flux_to_land, 0.0)
    diag_ocean_flux = jnp.where(sea_ice_mask & active,
                                heat_flux_to_sea_water, 0.0)
    diag_ice_flux = jnp.where(active, flux_through_ice, 0.0)

    albedo = jnp.where(
        active & (new_snow_height > 0), 0.8,
        jnp.where(active & sea_ice_mask & (new_sea_ice > 0), 0.5, 0.0))
    albedo = jnp.where(active & (height_of_melting_ice > 0), 0.2, albedo)

    return (out_temp, out_surface_temperature, new_sea_ice,
            new_snow_height, heights, diag_soil_flux, diag_ocean_flux,
            diag_ice_flux, albedo, active)


class IceSheet(Stepper):
    """Snow/ice energy balance with Crank-Nicolson vertical conduction."""

    input_properties = {
        'downwelling_longwave_flux_in_air': {
            'dims': ['*', 'interface_levels'], 'units': 'W m^-2'},
        'downwelling_shortwave_flux_in_air': {
            'dims': ['*', 'interface_levels'], 'units': 'W m^-2'},
        'upwelling_longwave_flux_in_air': {
            'dims': ['*', 'interface_levels'], 'units': 'W m^-2'},
        'upwelling_shortwave_flux_in_air': {
            'dims': ['*', 'interface_levels'], 'units': 'W m^-2'},
        'surface_upward_latent_heat_flux': {'dims': ['*'],
                                            'units': 'W m^-2'},
        'surface_upward_sensible_heat_flux': {'dims': ['*'],
                                              'units': 'W m^-2'},
        'land_ice_thickness': {'dims': ['*'], 'units': 'm'},
        'sea_ice_thickness': {'dims': ['*'], 'units': 'm'},
        'surface_snow_thickness': {'dims': ['*'], 'units': 'm'},
        'area_type': {'dims': ['*'], 'units': 'dimensionless'},
        'surface_temperature': {'dims': ['*'], 'units': 'degK'},
        'snow_and_ice_temperature': {
            'dims': ['ice_interface_levels', '*'], 'units': 'degK'},
        'sea_surface_temperature': {'dims': ['*'], 'units': 'degK'},
        'soil_surface_temperature': {'dims': ['*'], 'units': 'degK'},
        'height_on_ice_interface_levels': {
            'dims': ['ice_interface_levels', '*'], 'units': 'm'},
    }

    output_properties = {
        'land_ice_thickness': {'dims': ['*'], 'units': 'm'},
        'sea_ice_thickness': {'dims': ['*'], 'units': 'm'},
        'surface_snow_thickness': {'dims': ['*'], 'units': 'm'},
        'surface_temperature': {'dims': ['*'], 'units': 'degK'},
        'snow_and_ice_temperature': {
            'dims': ['ice_interface_levels', '*'], 'units': 'degK'},
        'height_on_ice_interface_levels': {
            'dims': ['ice_interface_levels', '*'], 'units': 'm'},
        'sea_surface_temperature': {'dims': ['*'], 'units': 'degK'},
    }

    diagnostic_properties = {
        'upward_heat_flux_at_ground_level_in_soil': {
            'dims': ['*'], 'units': 'W m^-2'},
        'heat_flux_into_sea_water_due_to_sea_ice': {
            'dims': ['*'], 'units': 'W m^-2'},
        'surface_downward_heat_flux_in_sea_ice': {
            'dims': ['*'], 'units': 'W m^-2'},
        'surface_albedo_for_direct_shortwave': {
            'dims': ['*'], 'units': 'dimensionless'},
        'surface_albedo_for_diffuse_shortwave': {
            'dims': ['*'], 'units': 'dimensionless'},
    }

    def __init__(self, maximum_snow_ice_height=10, **kwargs):
        self._max_height = maximum_snow_ice_height
        super().__init__(**kwargs)

    def array_call(self, raw_state, timestep):
        dt = timestep_seconds(timestep)
        area_type = np.asarray(raw_state['area_type']).astype(str)
        land_mask = jnp.asarray(area_type == 'land')
        land_ice_mask = jnp.asarray(area_type == 'land_ice')
        sea_ice_mask = jnp.asarray(area_type == 'sea_ice')

        net_heat_flux = (
            jnp.asarray(raw_state['downwelling_shortwave_flux_in_air'][:, 0])
            + jnp.asarray(raw_state['downwelling_longwave_flux_in_air'][:, 0])
            - jnp.asarray(raw_state['upwelling_shortwave_flux_in_air'][:, 0])
            - jnp.asarray(raw_state['upwelling_longwave_flux_in_air'][:, 0])
            - jnp.asarray(raw_state['surface_upward_sensible_heat_flux'])
            - jnp.asarray(raw_state['surface_upward_latent_heat_flux']))

        total_height = np.where(
            np.asarray(land_ice_mask),
            np.asarray(raw_state['land_ice_thickness'])
            + np.asarray(raw_state['surface_snow_thickness']),
            np.where(np.asarray(sea_ice_mask),
                     np.asarray(raw_state['sea_ice_thickness'])
                     + np.asarray(raw_state['surface_snow_thickness']),
                     np.where(np.asarray(land_mask),
                              np.asarray(
                                  raw_state['surface_snow_thickness']),
                              0.0)))
        if np.any(total_height > self._max_height):
            raise ValueError(
                'Total height exceeds maximum value of {} m.'.format(
                    self._max_height))

        (out_temp, out_ts, new_sea_ice, new_snow, heights, soil_flux,
         ocean_flux, ice_flux, albedo, active) = ice_sheet_step(
            net_heat_flux,
            jnp.asarray(raw_state['snow_and_ice_temperature']),
            jnp.asarray(raw_state['surface_snow_thickness']),
            jnp.asarray(raw_state['land_ice_thickness']),
            jnp.asarray(raw_state['sea_ice_thickness']),
            jnp.asarray(raw_state['soil_surface_temperature']),
            land_mask, land_ice_mask, sea_ice_mask,
            dt, self._max_height,
            get_constant(
                'thermal_conductivity_of_solid_phase_as_ice', 'W/m/degK'),
            get_constant(
                'thermal_conductivity_of_solid_phase_as_snow', 'W/m/degK'),
            get_constant('density_of_solid_phase_as_ice', 'kg/m^3'),
            get_constant('density_of_solid_phase_as_snow', 'kg/m^3'),
            get_constant('heat_capacity_of_solid_phase_as_ice', 'J/kg/degK'),
            get_constant('heat_capacity_of_solid_phase_as_snow',
                         'J/kg/degK'),
            get_constant('latent_heat_of_fusion', 'J/kg'),
            get_constant('freezing_temperature_of_liquid_phase', 'degK'))

        surface_temperature = jnp.where(
            active, out_ts, jnp.asarray(raw_state['surface_temperature']))

        outputs = {
            'land_ice_thickness': jnp.asarray(
                raw_state['land_ice_thickness']),
            'sea_ice_thickness': new_sea_ice,
            'surface_snow_thickness': new_snow,
            'surface_temperature': surface_temperature,
            'snow_and_ice_temperature': out_temp,
            'height_on_ice_interface_levels': heights,
            'sea_surface_temperature': jnp.asarray(
                raw_state['sea_surface_temperature']),
        }
        diagnostics = {
            'upward_heat_flux_at_ground_level_in_soil': soil_flux,
            'heat_flux_into_sea_water_due_to_sea_ice': ocean_flux,
            'surface_downward_heat_flux_in_sea_ice': ice_flux,
            'surface_albedo_for_direct_shortwave': albedo,
            'surface_albedo_for_diffuse_shortwave': albedo,
        }
        return diagnostics, outputs
