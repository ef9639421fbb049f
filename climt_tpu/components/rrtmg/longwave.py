"""RRTMGLongwave: 16-band / 140-g-point correlated-k longwave radiation.

API parity with /root/reference/climt/_components/rrtmg/lw/component.py:24-470
(inputs incl. all trace gases, per-band surface emissivity, cloud water/ice
paths and particle sizes, direct-input cloud/aerosol optical thickness;
outputs all-sky and clear-sky fluxes and heating rates; constructor options
incl. McICA and calculate_change_up_flux).

Radiative core: the full RRTMG-LW pipeline (lw_spectral.py: inatm ->
setcoef -> taumol -> cldprop -> rtrn) with the reference's in-tree data
extracted byte-exact, but SURROGATE gas k-tables -- the reference's LW
absorption data is stripped from the mirror and unobtainable here (see
docs/RRTMG_LW_STATUS.md and tools/find_lw_ktables.py for the audit, and
tools/calibrate_lw_ktables.py for the calibration against the reference
regression caches).

McICA (mcica=True) runs real stochastic subcolumns (mcica.py) seeded per
call from numpy's global RNG, mirroring the reference's seeding protocol
(component.py:369-381); calculate_change_up_flux=True computes dF/dT_s
with the totplnkderiv tables and stores it on
``component.last_upward_flux_derivative`` (the reference computes the
same derivative Fortran-side but discards it, _rrtmg_lw.pyx:164-171).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...core.base_components import TendencyComponent
from ...core.constants import get_constant
from ...core.util import get_interface_values, mass_to_volume_mixing_ratio
from .common import (
    rrtmg_cloud_ice_props_dict, rrtmg_cloud_liquid_props_dict,
    rrtmg_cloud_overlap_method_dict, rrtmg_cloud_props_dict,
    rrtmg_random_number_dict, validate_mcica_options)
from .lw_spectral import NGB, cldprmc_lw, rrtmg_lw_fluxes
from .mcica import mcica_subcolumns


@functools.partial(
    jax.jit, static_argnames=('inflag', 'iceflag', 'liqflag', 'icld',
                              'idrv', 'mcica_on'))
def _lw_radiation(play, plev, tlay, tlev, tsfc, h2ovmr, o3vmr, co2vmr,
                  ch4vmr, n2ovmr, o2vmr, cfc11vmr, cfc12vmr, cfc22vmr,
                  ccl4vmr, emis, cldfrac, taucld, ciwp, clwp, rei, rel,
                  tauaer, grav, avogad, cpdair, inflag, iceflag, liqflag,
                  icld, idrv, mcica_on, rng_key):
    if icld == 0:
        cldfrac = jnp.zeros_like(cldfrac)
        taucld = jnp.zeros_like(taucld)
        ciwp = jnp.zeros_like(ciwp)
        clwp = jnp.zeros_like(clwp)
    common = dict(
        play=play, plev=plev, tlay=tlay, tlev=tlev, tsfc=tsfc,
        h2ovmr=h2ovmr, o3vmr=o3vmr, co2vmr=co2vmr, ch4vmr=ch4vmr,
        n2ovmr=n2ovmr, o2vmr=o2vmr, cfc11vmr=cfc11vmr, cfc12vmr=cfc12vmr,
        cfc22vmr=cfc22vmr, ccl4vmr=ccl4vmr, emis=emis, tauaer=tauaer,
        grav=grav, avogad=avogad, cpdair=cpdair, inflag=inflag,
        iceflag=iceflag, liqflag=liqflag, idrv=idrv)
    if mcica_on and icld != 0:
        overlap = 1 if icld == 1 else (2 if icld == 2 else 3)
        cldfmc, ciwpmc, clwpmc, taucmc_in = mcica_subcolumns(
            rng_key, overlap, cldfrac, ciwp, clwp, taucld,
            jnp.asarray(NGB))
        taucmc = cldprmc_lw(inflag, iceflag, liqflag, cldfmc, ciwpmc,
                            clwpmc, taucmc_in, rei, rel, play.dtype)
        return rrtmg_lw_fluxes(
            cldfrac=cldfrac, taucld=taucld, ciwp=ciwp, clwp=clwp,
            rei=rei, rel=rel, per_g_cloud=True, cldfrac_g=cldfmc,
            taucld_g=taucmc, **common)
    return rrtmg_lw_fluxes(
        cldfrac=cldfrac, taucld=taucld, ciwp=ciwp, clwp=clwp,
        rei=rei, rel=rel, **common)


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
            cloud_overlap_method.lower()]
        self._cloud_optics = rrtmg_cloud_props_dict[
            cloud_optical_properties.lower()]
        self._ice_props = rrtmg_cloud_ice_props_dict[
            cloud_ice_properties.lower()]
        self._liquid_props = rrtmg_cloud_liquid_props_dict[
            cloud_liquid_water_properties.lower()]
        self._mcica = mcica
        self._rng = rrtmg_random_number_dict[
            random_number_generator.lower()]
        self._calc_dflxdt = calculate_change_up_flux
        self._interface_t = calculate_interface_temperature
        #: (nz+1, ncol) dF_up/dT_s from the latest call, all-sky and
        #: clear-sky, when calculate_change_up_flux=True
        self.last_upward_flux_derivative = None
        self.last_upward_flux_derivative_clear_sky = None
        if not calculate_interface_temperature:
            self.input_properties = dict(self.input_properties)
            self.input_properties['air_temperature_on_interface_levels'] = {
                'dims': ['interface_levels', '*'], 'units': 'degK'}
        super().__init__(**kwargs)

    def _gather_inputs(self, raw_state):
        """Pipeline inputs (dict) from the matched raw state; shared by
        array_call and tools/calibrate_lw_ktables.py."""
        g = get_constant('gravitational_acceleration', 'm/s^2')
        cpd = get_constant(
            'heat_capacity_of_dry_air_at_constant_pressure', 'J/kg/degK')
        avogad = get_constant('avogadro_constant', 'mole^-1')

        play = jnp.asarray(raw_state['air_pressure'])
        plev = jnp.asarray(raw_state['air_pressure_on_interface_levels'])
        tlay = jnp.asarray(raw_state['air_temperature'])
        tsfc = jnp.asarray(raw_state['surface_temperature'])
        # the reference passes specific humidity through
        # mass_to_volume_mixing_ratio with M=18.02 (component.py:321)
        h2ovmr = jnp.asarray(mass_to_volume_mixing_ratio(
            raw_state['specific_humidity'], 18.02))

        if self._interface_t:
            tlev = get_interface_values(tlay, tsfc, play, plev)
        else:
            tlev = jnp.asarray(
                raw_state['air_temperature_on_interface_levels'])

        def gas(name):
            return jnp.asarray(raw_state['mole_fraction_of_%s_in_air'
                                         % name])

        emis = jnp.asarray(raw_state['surface_longwave_emissivity'])
        cldfrac = jnp.asarray(
            raw_state['cloud_area_fraction_in_atmosphere_layer'])
        taucld = jnp.asarray(
            raw_state['longwave_optical_thickness_due_to_cloud'])
        ciwp = jnp.asarray(raw_state[
            'mass_content_of_cloud_ice_in_atmosphere_layer'])
        clwp = jnp.asarray(raw_state[
            'mass_content_of_cloud_liquid_water_in_atmosphere_layer'])
        rei = jnp.asarray(raw_state['cloud_ice_particle_size'])
        rel = jnp.asarray(raw_state['cloud_water_droplet_radius'])
        tauaer = jnp.moveaxis(jnp.asarray(
            raw_state['longwave_optical_thickness_due_to_aerosol']), 0, -1)
        return dict(
            play=play, plev=plev, tlay=tlay, tlev=tlev, tsfc=tsfc,
            h2ovmr=h2ovmr, o3vmr=gas('ozone'),
            co2vmr=gas('carbon_dioxide'), ch4vmr=gas('methane'),
            n2ovmr=gas('nitrous_oxide'), o2vmr=gas('oxygen'),
            cfc11vmr=gas('cfc11'), cfc12vmr=gas('cfc12'),
            cfc22vmr=gas('cfc22'),
            ccl4vmr=gas('carbon_tetrachloride'), emis=emis,
            cldfrac=cldfrac, taucld=taucld, ciwp=ciwp, clwp=clwp,
            rei=rei, rel=rel, tauaer=tauaer, grav=g, avogad=avogad,
            cpdair=cpd)

    def array_call(self, raw_state):
        inputs = self._gather_inputs(raw_state)

        if self._mcica:
            # fresh seed per call from numpy's global RNG, mirroring the
            # reference's protocol (component.py:369-381)
            if self._rng == 0:
                seed = int(np.random.randint(0, 1024))
            else:
                seed = int(np.random.randint(0, 2 ** 31 - 1))
            rng_key = jax.random.PRNGKey(seed)
        else:
            rng_key = jax.random.PRNGKey(0)

        out = _lw_radiation(
            inflag=self._cloud_optics, iceflag=self._ice_props,
            liqflag=self._liquid_props, icld=self._cloud_overlap,
            idrv=self._calc_dflxdt, mcica_on=self._mcica,
            rng_key=rng_key, **inputs)
        if self._calc_dflxdt:
            (up, down, hr, upc, downc, hrc, duflx_dt, duflxc_dt) = out
            self.last_upward_flux_derivative = duflx_dt
            self.last_upward_flux_derivative_clear_sky = duflxc_dt
        else:
            up, down, hr, upc, downc, hrc = out

        tendencies = {'air_temperature': hr}
        diagnostics = {
            'upwelling_longwave_flux_in_air': up,
            'downwelling_longwave_flux_in_air': down,
            'upwelling_longwave_flux_in_air_assuming_clear_sky': upc,
            'downwelling_longwave_flux_in_air_assuming_clear_sky': downc,
            'air_temperature_tendency_from_longwave': hr,
            'air_temperature_tendency_from_longwave_assuming_clear_sky':
                hrc,
        }
        return tendencies, diagnostics
