"""Golden-output regression tests against the reference caches.

Mirrors the backbone of the reference test strategy
(/root/reference/tests/test_components.py:84-250): each component runs on
(a) a single-column nz=30 state and (b) a 32x16x28 3-D state built by
``get_default_state``, and every output must match the cached reference
output.  Stepping variants wrap tendency components in AdamsBashforth
(a single call = one forward-Euler step).
"""

from datetime import timedelta

import numpy as np
import pytest

import climt_tpu as ct
from climt_tpu.core.base_components import (
    ImplicitTendencyComponent, Stepper, TendencyComponent)

from golden import compare_outputs, load_cached_outputs, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available, reason='reference caches not available')


def call_component(component, state, timestep=timedelta(seconds=10.)):
    np.random.seed(0)
    if isinstance(component, (Stepper, ImplicitTendencyComponent,
                              ct.AdamsBashforth,
                              ct.TimeDifferencingWrapper)):
        return component(state, timestep)
    return component(state)


class GoldenBase:
    test_name = None          # reference test class name
    rtol = 1e-6
    atol = 1e-10
    ignore = ()
    check_column = True
    check_3d = True
    check_stepping = True
    # some reference stepping caches only stored the first output dict
    # (e.g. TestRRTMGShortwave-3d_stepping has -0 but no -1 on disk):
    # compare only as many dicts as the cache holds
    truncate_to_cache = False

    def _compare(self, output, cached, context):
        if self.truncate_to_cache and not isinstance(output, dict):
            output = output[:len(cached)]
        compare_outputs(output, cached, self.rtol, self.atol,
                        context=context, ignore=self.ignore)

    def get_component_instance(self):
        raise NotImplementedError

    def get_column_state(self, component):
        return ct.get_default_state(
            [component], grid_state=ct.get_grid(nx=None, ny=None, nz=30))

    def get_3d_state(self, component):
        return ct.get_default_state(
            [component], grid_state=ct.get_grid(nx=32, ny=16, nz=28))

    def test_column(self):
        if not self.check_column:
            pytest.skip('column check disabled')
        component = self.get_component_instance()
        state = self.get_column_state(component)
        output = call_component(component, state)
        cached = load_cached_outputs(self.test_name, 'column')
        self._compare(output, cached, self.test_name + ':column')

    def test_3d(self):
        if not self.check_3d:
            pytest.skip('3d check disabled')
        component = self.get_component_instance()
        state = self.get_3d_state(component)
        output = call_component(component, state)
        cached = load_cached_outputs(self.test_name, '3d')
        self._compare(output, cached, self.test_name + ':3d')

    def test_column_stepping(self):
        component = self.get_component_instance()
        if not self.check_stepping or not isinstance(
                component, (TendencyComponent, ImplicitTendencyComponent)):
            pytest.skip('not a tendency component')
        stepper = ct.AdamsBashforth(component)
        state = self.get_column_state(stepper)
        output = call_component(stepper, state)
        cached = load_cached_outputs(self.test_name, 'column_stepping')
        self._compare(output, cached, self.test_name + ':column_stepping')

    def test_3d_stepping(self):
        component = self.get_component_instance()
        if not self.check_stepping or not isinstance(
                component, (TendencyComponent, ImplicitTendencyComponent)):
            pytest.skip('not a tendency component')
        stepper = ct.AdamsBashforth(component)
        state = self.get_3d_state(stepper)
        output = call_component(stepper, state)
        cached = load_cached_outputs(self.test_name, '3d_stepping')
        self._compare(output, cached, self.test_name + ':3d_stepping')

    def test_transposed_3d_gives_same_output(self):
        if not self.check_3d:
            pytest.skip('3d check disabled')
        component = self.get_component_instance()
        state = self.get_3d_state(component)
        for name, value in state.items():
            if isinstance(value, ct.DataArray):
                if value.ndim == 3:
                    state[name] = value.transpose(
                        value.dims[2], value.dims[0], value.dims[1])
                elif value.ndim == 2:
                    state[name] = value.transpose(
                        value.dims[1], value.dims[0])
        output = call_component(component, state)
        cached = load_cached_outputs(self.test_name, '3d')
        self._compare(output, cached, self.test_name + ':transposed')


class TestFrierson06LongwaveOpticalDepth(GoldenBase):
    test_name = 'TestFrierson06LongwaveOpticalDepth'

    def get_component_instance(self):
        return ct.Frierson06LongwaveOpticalDepth()


class TestGrayLongwaveRadiation(GoldenBase):
    test_name = 'TestGrayLongwaveRadiation'
    # The reference computes its flux sweeps in float32
    # (climt/_components/radiation.py:158,184); our f64 sweeps are more
    # accurate than the cache, so compare at f32-roundoff tolerance.
    rtol = 5e-5
    atol = 1e-7

    def get_component_instance(self):
        return ct.GrayLongwaveRadiation()


class TestHeldSuarez(GoldenBase):
    test_name = 'TestHeldSuarez'

    def get_component_instance(self):
        return ct.HeldSuarez()


class TestGridScaleCondensation(GoldenBase):
    test_name = 'TestGridScaleCondensation'

    def get_component_instance(self):
        return ct.GridScaleCondensation()


class TestSlabSurface(GoldenBase):
    test_name = 'TestSlabSurface'
    # the reference component mutates these *inputs* in place
    # (slab_surface.py:120-121) and its stepping caches record that side
    # effect; climt_tpu components are pure by design
    ignore = ('surface_material_density', 'surface_thermal_capacity')

    def get_component_instance(self):
        return ct.SlabSurface()


class TestDryConvection(GoldenBase):
    test_name = 'TestDryConvection'

    def get_component_instance(self):
        return ct.DryConvectiveAdjustment()


class TestBucketHydrology(GoldenBase):
    test_name = 'TestBucketHydrology'

    def get_component_instance(self):
        return ct.BucketHydrology()


class TestInstellation(GoldenBase):
    test_name = 'TestInstellation'

    def get_component_instance(self):
        return ct.Instellation()


class TestBergerSolarInsolation(GoldenBase):
    test_name = 'TestBergerSolarInsolation'

    def get_component_instance(self):
        # compat flag reproduces the reference's latitude-degrees-as-radians
        # bug (_berger_solar_insolation.pyx:311) so the series math can be
        # validated against the caches; default construction is physical
        return ct.BergerSolarInsolation(degrees_as_radians_compat=True)


class TestSimplePhysics(GoldenBase):
    test_name = 'TestSimplePhysics'

    def get_component_instance(self):
        return ct.SimplePhysics()


class TestSimplePhysicsImplicitPrognostic(GoldenBase):
    test_name = 'TestSimplePhysicsImplicitPrognostic'

    def get_component_instance(self):
        return ct.TimeDifferencingWrapper(ct.SimplePhysics())

    def test_column_stepping(self):
        pytest.skip('wrapper handled in plain column/3d tests')

    def test_3d_stepping(self):
        pytest.skip('wrapper handled in plain column/3d tests')


class TestIceSheet(GoldenBase):
    test_name = 'TestIceSheet'

    def get_component_instance(self):
        return ct.IceSheet()


class TestIceSheetLand(GoldenBase):
    test_name = 'TestIceSheetLand'
    check_column = False

    def get_component_instance(self):
        return ct.IceSheet()

    def get_3d_state(self, component):
        state = super().get_3d_state(component)
        state['area_type'].values[:] = 'land'
        state['surface_snow_thickness'].values[:] = 3
        return state


class TestSeaIce(GoldenBase):
    test_name = 'TestSeaIce'

    def get_component_instance(self):
        return ct.SeaIce()

    def get_3d_state(self, component):
        state = super().get_3d_state(component)
        state['area_type'].values[:] = 'sea_ice'
        state['sea_ice_thickness'].values[:] = 1.0
        return state


class TestLandIce(GoldenBase):
    test_name = 'TestLandIce'

    def get_component_instance(self):
        return ct.LandIce()

    def get_3d_state(self, component):
        state = super().get_3d_state(component)
        state['area_type'].values[:] = 'land_ice'
        state['land_ice_thickness'].values[:] = 3.0
        return state


class TestLandMask(GoldenBase):
    test_name = 'TestLandMask'

    def get_component_instance(self):
        return ct.LandMask()


class TestDataOcean(GoldenBase):
    test_name = 'TestDataOcean'

    def get_component_instance(self):
        # the reference test writes a tiny uniform-290K SST dataset; feed
        # the same values through an in-memory dict source
        import numpy as np
        lat = np.arange(-88.0, 90.0, 8.0)
        lon = np.arange(4.0, 360.0, 8.0)
        data = np.repeat(np.full((1, lat.size, lon.size), 290.0), 12, 0)
        ds = {'tos': data, 'lat': lat, 'lon': lon,
              '__units__': {'tos': 'K'}}
        return ct.DataOcean(ds, sst_variable='tos')

    def get_column_state(self, component):
        from datetime import datetime
        state = super().get_column_state(component)
        state['time'] = datetime(2000, 1, 15, 12)
        return state

    def get_3d_state(self, component):
        from datetime import datetime
        state = super().get_3d_state(component)
        state['time'] = datetime(2000, 1, 15, 12)
        return state


class TestBucketHydrologyTwoLayer(GoldenBase):
    test_name = 'TestBucketHydrologyTwoLayer'

    def get_component_instance(self):
        return ct.BucketHydrology(num_layers=2,
                                  moisture_diffusion_timescale=86400.0)


class TestSecondBEST(GoldenBase):
    test_name = 'TestSecondBEST'

    def get_component_instance(self):
        return ct.SecondBEST()

    def get_column_state(self, component):
        state = super().get_column_state(component)
        state['area_type'].values[:] = 'land'
        return state

    def get_3d_state(self, component):
        state = super().get_3d_state(component)
        state['area_type'].values[:] = 'land'
        return state


class TestSimpleBoundaryLayer(GoldenBase):
    test_name = 'TestSimpleBoundaryLayer'

    def get_component_instance(self):
        return ct.SimpleBoundaryLayer()


class TestDcmip(GoldenBase):
    test_name = 'TestDcmip'

    def get_component_instance(self):
        return ct.DcmipInitialConditions()


def test_dcmip_options():
    state = ct.get_default_state(
        [ct.DcmipInitialConditions()],
        grid_state=ct.get_grid(nx=64, ny=64, nz=10))
    dry = ct.DcmipInitialConditions(moist=False)(state)
    moist = ct.DcmipInitialConditions(moist=True)(state)
    unperturbed = ct.DcmipInitialConditions(
        moist=False, add_perturbation=False)(state)
    cyclone = ct.DcmipInitialConditions(
        moist=True, condition_type='tropical_cyclone')(state)
    assert not np.allclose(dry['specific_humidity'].values,
                           moist['specific_humidity'].values)
    assert not np.allclose(dry['eastward_wind'].values,
                           unperturbed['eastward_wind'].values)
    assert not np.allclose(
        np.asarray(cyclone['surface_air_pressure'].values) - 1.015e5, 0.)


class TestEmanuel(GoldenBase):
    test_name = 'TestEmanuel'

    def get_component_instance(self):
        return ct.EmanuelConvection()


class _LWSurrogateBase(GoldenBase):
    """Golden comparison for the LW families at the SURROGATE tolerances.

    The LW gas k-tables are stripped from the reference mirror and
    unobtainable here (tools/find_lw_ktables.py), so the 140-g-point
    pipeline runs calibrated surrogate tables; these tests assert the
    MEASURED surrogate accuracy (docs/RRTMG_LW_STATUS.md) -- max flux
    error ~2.0 W/m^2, max heating-rate error ~0.018 K/day after the
    round-4 recalibration -- so pipeline or calibration regressions are
    caught.  They are an honest accuracy statement, not a golden-parity
    claim (see the doc for why exact parity is impossible here).

    Tolerances are per-quantity (tests/golden.py _tol_for): fluxes are
    O(100 W/m^2) with absolute errors up to ~2 W/m^2 that can land at
    SMALL flux values (upper-level downwelling), so they carry the
    absolute headroom; heating rates are pinned at the measured
    0.018 K/day scale.
    """
    rtol = 0.015
    atol = {'flux': 3.0, 'default': 0.05}
    truncate_to_cache = True


class TestRRTMGLongwave(_LWSurrogateBase):
    test_name = 'TestRRTMGLongwave'

    def get_component_instance(self):
        return ct.RRTMGLongwave()


class TestRRTMGLongwaveWithClouds(_LWSurrogateBase):
    """Held-out family (never used in calibration)."""
    test_name = 'TestRRTMGLongwaveWithClouds'

    def get_component_instance(self):
        return ct.RRTMGLongwave(
            cloud_optical_properties='single_cloud_type')


class TestRRTMGLongwaveWithExternalInterfaceTemperature(_LWSurrogateBase):
    """In the calibration training set since round 4 (its decoupled-tlev
    Planck source path was unconstrained by the base family)."""
    test_name = 'TestRRTMGLongwaveWithExternalInterfaceTemperature'

    def get_component_instance(self):
        return ct.RRTMGLongwave(calculate_interface_temperature=False)


class TestRRTMGLongwaveMCICA(_LWSurrogateBase):
    """McICA on the clear default column is deterministic (no clouds),
    so the column caches compare at the surrogate tolerance; the cloudy
    3d family is stochastic (different RNG stream than the Fortran) and
    is validated statistically in tests/test_rrtmg.py instead."""
    test_name = 'TestRRTMGLongwaveMCICA'
    check_3d = False

    def get_component_instance(self):
        return ct.RRTMGLongwave(mcica=True)

    def test_transposed_3d_gives_same_output(self):
        pass

    def test_3d_stepping(self):
        pytest.skip('cloudy McICA 3d is stochastic; statistical check '
                    'in tests/test_rrtmg.py')


class TestRRTMGShortwave(GoldenBase):
    """Golden parity for the 112-g-point correlated-k shortwave core.

    The reference caches were produced by the float64 Fortran
    (rrtmg_sw_rad.nomcica.f90); under ``jax_enable_x64`` the JAX core
    matches them at ~3e-11 relative (see tools/diff_sw_cache.py), so the
    tolerances below have 3+ orders of magnitude of headroom.
    """
    test_name = 'TestRRTMGShortwave'
    rtol = 1e-7
    atol = 1e-6
    # the reference's TestRRTMGShortwave-3d_stepping cache only has the -0
    # (diagnostics) file on disk
    truncate_to_cache = True

    def get_component_instance(self):
        return ct.RRTMGShortwave()


class TestRRTMGShortwaveMCICA(GoldenBase):
    """McICA on the clear default column is deterministic (the default
    state has no clouds, so the stochastic subcolumn generator yields
    the clear sky and the spcvmc path reduces to spcvrt), so the column
    caches compare at the golden SW tolerance; the cloudy 3d family is
    stochastic (different RNG stream than the Fortran KISS generator)
    and is validated statistically in tests/test_rrtmg.py."""
    test_name = 'TestRRTMGShortwaveMCICA'
    rtol = 1e-7
    atol = 1e-6
    check_3d = False
    truncate_to_cache = True

    def get_component_instance(self):
        return ct.RRTMGShortwave(mcica=True)

    def test_transposed_3d_gives_same_output(self):
        pass

    def test_3d_stepping(self):
        pytest.skip('cloudy McICA 3d is stochastic; statistical check '
                    'in tests/test_rrtmg.py')
