"""Smoke tests: every example script runs end-to-end on a tiny config.

The reference has no example tests (its examples rotted behind API
changes more than once, e.g. HISTORY.rst); here each script exposes a
parameterized ``main()`` so CI can execute the full composition it
demonstrates in seconds.  These tests guard the examples against API
drift — numerical behavior is covered by the golden suites.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'examples')


def run_example(name, **kwargs):
    path = os.path.join(EXAMPLES_DIR, name + '.py')
    spec = importlib.util.spec_from_file_location('example_' + name, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = module
    spec.loader.exec_module(module)
    return module.main(verbose=False, **kwargs)


def assert_finite(state, *names):
    for name in names:
        vals = np.asarray(state[name].values)
        assert np.isfinite(vals).all(), name + ' has non-finite values'


class TestColumnExamples:
    def test_radiative_equilibrium(self):
        state = run_example('radiative_equilibrium', n_steps=3)
        assert_finite(state, 'air_temperature',
                      'upwelling_longwave_flux_in_air')

    def test_grey_radiative_convective(self):
        state = run_example('grey_radiative_convective', n_steps=3)
        assert_finite(state, 'air_temperature')

    def test_radiative_convective_equilibrium(self):
        state = run_example('radiative_convective_equilibrium', n_steps=3)
        assert_finite(state, 'air_temperature', 'specific_humidity')

    def test_radiative_equilibrium_rrtmg(self):
        state = run_example('radiative_equilibrium_rrtmg', n_steps=2)
        assert_finite(state, 'air_temperature',
                      'air_temperature_tendency_from_shortwave',
                      'air_temperature_tendency_from_longwave')

    def test_radiative_equilibrium_rrtmg_realistic_profiles(self):
        state = run_example(
            'radiative_equilibrium_rrtmg_realistic_profiles', n_steps=2)
        # the observed profiles must actually be loaded (60 levels,
        # stratospheric ozone peak present)
        o3 = np.asarray(
            state['mole_fraction_of_ozone_in_air'].values).ravel()
        assert len(o3) == 60 and o3.max() > 1e-6
        assert_finite(state, 'air_temperature')

    def test_radiative_heating_rrtmg_clouds(self):
        results = run_example('radiative_heating_rrtmg_clouds',
                              area_fractions=(0., 0.5))
        (_, sw_clear, lw_clear), (_, sw_cloudy, lw_cloudy) = results
        assert np.isfinite(sw_cloudy).all() and np.isfinite(
            lw_cloudy).all()
        # the cloud must perturb the heating rates
        assert np.abs(sw_cloudy - sw_clear).max() > 0.01

    def test_simple_physics_example(self):
        state = run_example('simple_physics_example', n_steps=3)
        assert_finite(state, 'specific_humidity')

    def test_ice_sheet(self):
        state = run_example('ice_sheet', n_steps=3)
        assert_finite(state, 'snow_and_ice_temperature',
                      'surface_temperature')

    def test_column_code_with_slab(self):
        state = run_example('column_code_with_slab', n_steps=3)
        assert_finite(state, 'air_temperature', 'surface_temperature')

    def test_gmd_radiative_convective(self):
        state = run_example('gmd_radiative_convective', n_steps=3)
        assert_finite(state, 'air_temperature', 'surface_temperature')

    def test_zenith_angle(self):
        state = run_example('zenith_angle', n_steps=2, nx=8, ny=8)
        za = np.asarray(state['zenith_angle'].values)
        assert np.isfinite(za).all() and za.max() > 0.


class TestGCMExamples:
    def test_held_suarez(self):
        state = run_example('held_suarez', n_days=0.02, nx=32, ny=16,
                            nz=8, dt_minutes=15)
        assert_finite(state, 'eastward_wind', 'air_temperature')

    def test_gmd_aquaplanet(self):
        state = run_example('gmd_aquaplanet', n_days=0.02, nx=32, ny=16,
                            nz=8, dt_minutes=15)
        assert_finite(state, 'eastward_wind', 'specific_humidity')

    def test_grey_gcm(self):
        state = run_example('grey_gcm', n_steps=2, nx=32, ny=16, nz=8)
        assert_finite(state, 'eastward_wind', 'air_temperature')

    def test_grey_gcm_energy_balanced(self):
        state = run_example('grey_gcm_energy_balanced', n_steps=2,
                            nx=32, ny=16, nz=8)
        assert_finite(state, 'eastward_wind', 'surface_temperature')

    def test_full_radiation_gcm_energy_balanced(self):
        state = run_example('full_radiation_gcm_energy_balanced',
                            n_steps=2, nx=16, ny=8, nz=8)
        assert_finite(state, 'eastward_wind', 'air_temperature',
                      'surface_temperature')

    def test_full_radiation_with_insolation_gcm(self):
        state = run_example('full_radiation_with_insolation_gcm',
                            n_steps=2, nx=16, ny=8, nz=8)
        assert_finite(state, 'eastward_wind', 'zenith_angle')

    def test_baroclinic_wave(self):
        state = run_example('baroclinic_wave', n_steps=2, nx=32, ny=16,
                            nz=8)
        ps = np.asarray(state['surface_air_pressure'].values)
        assert np.isfinite(ps).all()
        # the DCMIP initial state carries the Jablonowski mid-latitude
        # jet (u_max ~ 35 m/s; surface pressure starts uniform)
        u = np.asarray(state['eastward_wind'].values)
        assert np.isfinite(u).all() and u.max() > 20.
