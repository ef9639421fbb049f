"""RRTMGShortwave: 112-g-point correlated-k shortwave radiation.

API parity with /root/reference/climt/_components/rrtmg/sw/component.py:27-630
(inputs incl. trace gases, cloud water/ice paths and particle sizes,
four-way surface albedos, banded direct-input cloud/aerosol optics, solar
cycle and earth-sun-distance adjustments; outputs all-sky and clear-sky
fluxes and heating rates; constructor options incl. the McICA advisories).

Radiative core: climt_tpu.components.rrtmg.sw_spectral — the full RRTMG
correlated-k gas optics (14 bands / 112 g-points, tables extracted from
the reference's in-tree AER data), Meador-Weaver two-stream with the
vrtqdr adding method, Hu&Stamnes / Ebert-Curry / Key / Fu cloud optics,
and the NRLSSI2 solar-variability options.  Golden-matched against the
reference's cached Fortran outputs (TestRRTMGShortwave-{column,3d}*.cache)
at ~3e-11 relative under jax_enable_x64 — see
tests/test_golden_components.py::TestRRTMGShortwave.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from ...core.base_components import TendencyComponent
from ...core.constants import get_constant
from ...core.util import mass_to_volume_mixing_ratio
from .common import (
    rrtmg_aerosol_input_dict, rrtmg_cloud_ice_props_dict,
    rrtmg_cloud_liquid_props_dict, rrtmg_cloud_overlap_method_dict,
    rrtmg_cloud_props_dict, rrtmg_random_number_dict,
    validate_mcica_options)
from .mcica import mcica_subcolumns
from . import sw_spectral as S


@functools.partial(
    jax.jit,
    static_argnames=('isolvar', 'icld', 'inflag', 'iceflag', 'liqflag',
                     'iaer', 'day_of_year', 'solar_config', 'mcica_on'))
def _sw_driver(play, plev, tlay, h2ovmr, o3vmr, co2vmr, ch4vmr, n2ovmr,
               o2vmr, asdir, asdif, aldir, aldif, coszen, cldfrac,
               tauc_in, ssac_in, asmc_in, fsfc_in, ciwp, clwp, rei, rel,
               taua_in, ssaa_in, asma_in, ecaer, adjes,
               grav, avogadro, cpdair,
               isolvar, icld, inflag, iceflag, liqflag, iaer,
               day_of_year, solar_config, mcica_on=False, rng_key=None):
    dtype = play.dtype
    nz, ncol = play.shape

    if icld == 0:
        zero_b = jnp.zeros((nz, ncol, S.NBANDS), dtype)
        cloud = (zero_b, jnp.ones_like(zero_b), zero_b, zero_b)
    else:
        cloud = S.cldprop_sw(
            inflag, iceflag, liqflag, cldfrac, tauc_in, ssac_in, asmc_in,
            fsfc_in, ciwp, clwp, rei, rel, dtype)

    if iaer == 0:
        zero_b = jnp.zeros((nz, ncol, S.NBANDS), dtype)
        aerosol = (zero_b, jnp.ones_like(zero_b), zero_b)
    elif iaer == 6:
        aerosol = S.ecmwf_aerosol_optics(ecaer, dtype)
    else:  # iaer == 10: direct band input
        aerosol = (taua_in, ssaa_in, asma_in)

    scon = 0.0  # folded into solar_config already
    common = dict(
        adjes=adjes, day_of_year=day_of_year, scon=scon,
        isolvar=isolvar, solar_config=solar_config,
        grav=grav, avogadro=avogadro, cpdair=cpdair)

    if mcica_on and icld != 0:
        # McICA: stochastic subcolumns per g-point (mcica_subcol_gen_sw
        # .f90), per-g cloud optics from the delta-scaled band properties
        # (rrtmg_sw_cldprmc.f90 — the cloudy-subcolumn water paths equal
        # the grid-mean, so per-g properties are the band values gathered
        # through NGB), then the spcvmc two-stream.
        tauc_b, ssac_b, asmc_b, _ = cloud
        overlap = 1 if icld == 1 else (2 if icld == 2 else 3)
        cldfmc, _, _, taucmc = mcica_subcolumns(
            rng_key, overlap, cldfrac, ciwp, clwp, tauc_b,
            jnp.asarray(S.NGB))
        iscld = cldfmc > 0
        ssacmc = jnp.where(iscld, ssac_b[..., S.NGB], 1.0).astype(dtype)
        asmcmc = jnp.where(iscld, asmc_b[..., S.NGB], 0.0).astype(dtype)
        return S.rrtmg_sw_fluxes(
            play, plev, tlay, h2ovmr, o3vmr, co2vmr, ch4vmr, n2ovmr,
            o2vmr, asdir, asdif, aldir, aldif, coszen, cldfrac,
            cloud_optics=cloud, aerosol_optics=aerosol, icld=icld,
            per_g_cloud=True,
            cloud_g=(cldfmc.astype(dtype), taucmc.astype(dtype),
                     ssacmc, asmcmc),
            **common)
    return S.rrtmg_sw_fluxes(
        play, plev, tlay, h2ovmr, o3vmr, co2vmr, ch4vmr, n2ovmr, o2vmr,
        asdir, asdif, aldir, aldif, coszen, cldfrac,
        cloud_optics=cloud, aerosol_optics=aerosol, icld=icld, **common)


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
                              'units': 'g/g'},
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
                 solar_variability_method=0,
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
            cloud_overlap_method.lower()]
        self._cloud_optics = rrtmg_cloud_props_dict[
            cloud_optical_properties.lower()]
        self._ice_props = rrtmg_cloud_ice_props_dict[
            cloud_ice_properties.lower()]
        self._liquid_props = rrtmg_cloud_liquid_props_dict[
            cloud_liquid_water_properties.lower()]
        self._mcica = mcica
        self._rng = rrtmg_random_number_dict[random_number_generator]
        self._aerosol_type = rrtmg_aerosol_input_dict[aerosol_type.lower()]
        self._solar_var_flag = solar_variability_method
        self._ignore_day_of_year = ignore_day_of_year
        if facular_sunspot_amplitude is None:
            facular_sunspot_amplitude = np.ones(2)
        self._fac_sunspot_coeff = tuple(
            float(v) for v in facular_sunspot_amplitude)
        if solar_variability_by_band is None:
            self._solar_var_by_band = None
        else:
            self._solar_var_by_band = tuple(
                float(v) for v in solar_variability_by_band)
        if use_solar_constant_from_fortran:
            self._solar_const = 0.0
        else:
            self._solar_const = float(
                get_constant('stellar_irradiance', 'W/m^2'))
        if self._cloud_optics == 1:
            logging.warning(
                "cloud_optical_properties 'single_cloud_type' is not "
                "supported by the shortwave scheme; using "
                "'liquid_and_ice_clouds' optics.")
        super().__init__(**kwargs)

    def array_call(self, raw_state):
        g = float(get_constant('gravitational_acceleration', 'm/s^2'))
        cpd = float(get_constant(
            'heat_capacity_of_dry_air_at_constant_pressure', 'J/kg/degK'))
        avogadro = float(get_constant('avogadro_constant', 'mole^-1'))

        def a(name):
            return jnp.asarray(raw_state[name])

        play = a('air_pressure')
        plev = a('air_pressure_on_interface_levels')
        tlay = a('air_temperature')
        h2ovmr = mass_to_volume_mixing_ratio(
            a('specific_humidity'), 18.02)
        coszen = jnp.cos(a('zenith_angle'))

        model_time = raw_state.get('time')
        if self._ignore_day_of_year or model_time is None:
            day_of_year = 0
        else:
            day_of_year = model_time.timetuple().tm_yday
        adjes = a('flux_adjustment_for_earth_sun_distance')
        solcycfrac = float(raw_state['solar_cycle_fraction'])

        solar_config = S.solar_variability(
            self._solar_var_flag, self._solar_const, solcycfrac,
            self._fac_sunspot_coeff, self._solar_var_by_band)
        solar_static = tuple(
            tuple(np.atleast_1d(v).tolist()) if np.ndim(v) else float(v)
            for v in solar_config)

        inflag = 2 if self._cloud_optics == 1 else self._cloud_optics
        iceflag = self._ice_props if self._ice_props > 0 else 1
        liqflag = self._liquid_props

        # banded cloud/aerosol inputs: state layouts are
        # (nz, ncol, nband) for clouds, (nband, nz, ncol) for aerosols
        tauc_in = a('shortwave_optical_thickness_due_to_cloud')
        ssac_in = a('single_scattering_albedo_due_to_cloud')
        asmc_in = a('cloud_asymmetry_parameter')
        fsfc_in = a('cloud_forward_scattering_fraction')
        taua_in = jnp.moveaxis(
            a('shortwave_optical_thickness_due_to_aerosol'), 0, -1)
        ssaa_in = jnp.moveaxis(
            a('single_scattering_albedo_due_to_aerosol'), 0, -1)
        asma_in = jnp.moveaxis(a('aerosol_asymmetry_parameter'), 0, -1)
        ecaer = a('aerosol_optical_depth_at_55_micron')

        if self._mcica:
            # fresh seed per call from numpy's global RNG, mirroring the
            # reference's protocol (sw/component.py permuteseed handling)
            if self._rng == 0:
                seed = int(np.random.randint(0, 1024))
            else:
                seed = int(np.random.randint(0, 2 ** 31 - 1))
            rng_key = jax.random.PRNGKey(seed)
        else:
            rng_key = jax.random.PRNGKey(0)

        fu, fd, fuc, fdc, hr, hrc = _sw_driver(
            play, plev, tlay, h2ovmr,
            a('mole_fraction_of_ozone_in_air'),
            a('mole_fraction_of_carbon_dioxide_in_air'),
            a('mole_fraction_of_methane_in_air'),
            a('mole_fraction_of_nitrous_oxide_in_air'),
            a('mole_fraction_of_oxygen_in_air'),
            a('surface_albedo_for_direct_shortwave'),
            a('surface_albedo_for_diffuse_shortwave'),
            a('surface_albedo_for_direct_near_infrared'),
            a('surface_albedo_for_diffuse_near_infrared'),
            coszen,
            a('cloud_area_fraction_in_atmosphere_layer'),
            tauc_in, ssac_in, asmc_in, fsfc_in,
            a('mass_content_of_cloud_ice_in_atmosphere_layer'),
            a('mass_content_of_cloud_liquid_water_in_atmosphere_layer'),
            a('cloud_ice_particle_size'),
            a('cloud_water_droplet_radius'),
            taua_in, ssaa_in, asma_in, ecaer, adjes,
            g, avogadro, cpd,
            isolvar=self._solar_var_flag, icld=self._cloud_overlap,
            inflag=inflag, iceflag=iceflag, liqflag=liqflag,
            iaer=self._aerosol_type, day_of_year=day_of_year,
            solar_config=solar_static, mcica_on=self._mcica,
            rng_key=rng_key)

        tendencies = {'air_temperature': hr}
        diagnostics = {
            'upwelling_shortwave_flux_in_air': fu,
            'downwelling_shortwave_flux_in_air': fd,
            'upwelling_shortwave_flux_in_air_assuming_clear_sky': fuc,
            'downwelling_shortwave_flux_in_air_assuming_clear_sky': fdc,
            'air_temperature_tendency_from_shortwave': hr,
            'air_temperature_tendency_from_shortwave_assuming_clear_sky':
                hrc,
        }
        return tendencies, diagnostics
