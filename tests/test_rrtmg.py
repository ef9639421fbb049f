"""Tests for the RRTMG-interface radiation components.

Shortwave runs the true 112-g-point correlated-k core and is golden-matched
against the reference caches in test_golden_components.py
(TestRRTMGShortwave).  Longwave runs the full 140-g-point pipeline
(inatm/setcoef/taumol/cldprop/rtrn) on surrogate-calibrated k-tables —
the reference mirror ships no LW k-tables (rrtmg_lw_k_g.f90 is absent
from /root/reference/climt/_lib/rrtmg_lw/) and this environment has no
network or Fortran compiler to regenerate them, so exact LW parity is
unattainable here (docs/RRTMG_LW_STATUS.md); LW is additionally covered
by physical invariants, API/option behavior, and the reference's logging
advisories.
"""

import logging

import numpy as np
import pytest

import climt_tpu as ct


def tropical_state(components, nz=30):
    state = ct.get_default_state(
        components, grid_state=ct.get_grid(nx=None, ny=None, nz=nz))
    p = np.asarray(state['air_pressure'].values).ravel()
    Ts = 300.
    state['air_temperature'].values[:] = np.maximum(
        Ts * (p / p[0]) ** (2. / 7. * 0.8), 200.).reshape(
        state['air_temperature'].shape)
    state['specific_humidity'].values[:] = (
        0.017 * (p / p[0]) ** 3).reshape(state['specific_humidity'].shape)
    state['surface_temperature'].values[:] = Ts
    return state


class TestRRTMGLongwave:

    def test_fluxes_physical(self):
        lw = ct.RRTMGLongwave()
        state = tropical_state([lw])
        tendencies, diagnostics = lw(state)
        up = np.asarray(
            diagnostics['upwelling_longwave_flux_in_air'].values).ravel()
        down = np.asarray(
            diagnostics['downwelling_longwave_flux_in_air'].values).ravel()
        hr = np.asarray(tendencies['air_temperature'].values).ravel()
        sigma_ts4 = 5.670367e-8 * 300. ** 4
        assert 200. < up[-1] < sigma_ts4          # OLR below surface emission
        assert up[0] == pytest.approx(sigma_ts4, rel=1e-3)
        assert 250. < down[0] < sigma_ts4          # greenhouse back-radiation
        assert down[-1] == 0.0                     # no downwelling at TOA
        p = np.asarray(
            state['air_pressure'].to_units('mbar').values).ravel()
        hr_tropo = hr[p > 100.]
        assert -10. < hr_tropo.min() < 0.          # tropospheric cooling
        assert not np.isnan(up).any()

    def test_co2_greenhouse(self):
        lw = ct.RRTMGLongwave()
        state = tropical_state([lw])
        _, d1 = lw(state)
        state['mole_fraction_of_carbon_dioxide_in_air'].values[:] *= 2
        _, d2 = lw(state)
        olr1 = np.asarray(
            d1['upwelling_longwave_flux_in_air'].values).ravel()[-1]
        olr2 = np.asarray(
            d2['upwelling_longwave_flux_in_air'].values).ravel()[-1]
        assert 0.5 < olr1 - olr2 < 15.             # doubling reduces OLR

    def test_cloud_greenhouse(self):
        lw = ct.RRTMGLongwave()
        state = tropical_state([lw])
        _, clear = lw(state)
        state['cloud_area_fraction_in_atmosphere_layer'].values[18:22] = 1.
        state['mass_content_of_cloud_ice_in_atmosphere_layer'
              ].values[18:22] = 20.
        _, cloudy = lw(state)
        olr_clear = np.asarray(
            clear['upwelling_longwave_flux_in_air'].values).ravel()[-1]
        olr_cloudy = np.asarray(
            cloudy['upwelling_longwave_flux_in_air'].values).ravel()[-1]
        assert olr_cloudy < olr_clear - 20.        # high cloud traps LW
        # clear-sky diagnostic unaffected by the cloud
        olr_cs = np.asarray(cloudy[
            'upwelling_longwave_flux_in_air_assuming_clear_sky'
        ].values).ravel()[-1]
        assert olr_cs == pytest.approx(olr_clear, rel=1e-6)

    def test_rrtmg_logging(self, caplog):
        caplog.set_level(logging.INFO)
        ct.RRTMGLongwave(mcica=True, cloud_overlap_method='clear_only')
        assert 'no clouds' in caplog.text
        caplog.clear()
        ct.RRTMGLongwave(mcica=True,
                         cloud_optical_properties='single_cloud_type')
        assert ("must be 'direct_input' or "
                "'liquid_and_ice_clouds'") in caplog.text


class TestRRTMGShortwave:

    def test_fluxes_physical(self):
        # ignore_day_of_year so no earth-sun distance adjustment is applied
        # (with it, TOA down = 1367 * earth_sun(Jan 1) * mu0, matching the
        # reference component's behavior, rrtmg/sw/component.py:465-468)
        sw = ct.RRTMGShortwave(ignore_day_of_year=True)
        state = tropical_state([sw])
        state['zenith_angle'].values[:] = np.arccos(0.5)
        tendencies, diagnostics = sw(state)
        up = np.asarray(
            diagnostics['upwelling_shortwave_flux_in_air'].values).ravel()
        down = np.asarray(
            diagnostics['downwelling_shortwave_flux_in_air'].values
        ).ravel()
        hr = np.asarray(tendencies['air_temperature'].values).ravel()
        assert down[-1] == pytest.approx(1367. * 0.5, rel=1e-3)
        atm_abs = (down[-1] - up[-1]) - (down[0] - up[0])
        assert 100. < atm_abs < 300.               # typical clear-sky
        assert 350. < down[0] < down[-1]           # surface insolation
        assert 0. <= hr.min() and hr.max() < 20.   # SW heats, O3 at top
        assert not np.isnan(up).any()

    def test_night_is_dark(self):
        sw = ct.RRTMGShortwave()
        state = tropical_state([sw])
        state['zenith_angle'].values[:] = np.pi * 0.75  # sun below horizon
        tendencies, diagnostics = sw(state)
        down = np.asarray(
            diagnostics['downwelling_shortwave_flux_in_air'].values)
        # The reference Fortran clamps cos(zenith) to 1e-10 rather than
        # gating night columns (rrtmg_sw_rad.nomcica.f90:533,641-642), so a
        # ~1e-7 W/m^2 residual is cache-exact behavior; require "dark", not
        # bitwise zero.
        assert np.allclose(down, 0.0, atol=1e-5)

    def test_cloud_albedo(self):
        sw = ct.RRTMGShortwave()
        state = tropical_state([sw])
        state['zenith_angle'].values[:] = np.arccos(0.7)
        _, clear = sw(state)
        state['cloud_area_fraction_in_atmosphere_layer'].values[8:12] = 1.
        state['mass_content_of_cloud_liquid_water_in_atmosphere_layer'
              ].values[8:12] = 50.
        _, cloudy = sw(state)
        up_clear = np.asarray(
            clear['upwelling_shortwave_flux_in_air'].values).ravel()[-1]
        up_cloudy = np.asarray(
            cloudy['upwelling_shortwave_flux_in_air'].values).ravel()[-1]
        assert up_cloudy > up_clear + 50.          # cloud reflects SW

    def test_rrtmg_logging(self, caplog):
        caplog.set_level(logging.INFO)
        ct.RRTMGShortwave(mcica=True, cloud_overlap_method='clear_only')
        assert 'no clouds' in caplog.text
        caplog.clear()
        ct.RRTMGShortwave(mcica=True,
                          cloud_optical_properties='single_cloud_type')
        assert ("must be 'direct_input' or "
                "'liquid_and_ice_clouds'") in caplog.text
        caplog.clear()
        ct.RRTMGShortwave(mcica=True,
                          cloud_optical_properties='liquid_and_ice_clouds',
                          cloud_ice_properties='ebert_curry_one')
        assert "not be set to 'ebert_curry_one'" in caplog.text
        caplog.clear()
        ct.RRTMGShortwave(
            mcica=True,
            cloud_optical_properties='liquid_and_ice_clouds',
            cloud_liquid_water_properties='radius_independent_absorption')
        assert "must be set to 'radius_dependent_absorption'" in caplog.text


def test_energy_conservation_two_stream():
    """Conservative scattering through the production SW solver: a
    non-absorbing atmosphere (omega=1) must pass all incident energy
    through to the surface budget (reftra_sw + vrtqdr_sw adding)."""
    import jax.numpy as jnp
    from climt_tpu.components.rrtmg.sw_spectral import (
        reftra_sw, vrtqdr_sw, _exp_transmittance)
    nz, ncol, ngpt = 10, 3, 4
    shape = (nz, ncol, ngpt)
    tau = jnp.full(shape, 0.5)
    omega = jnp.full(shape, 1.0 - 1e-9)
    g_asym = jnp.full(shape, 0.6)
    mu0 = jnp.full((1, ncol, 1), 0.6)
    alb = jnp.full((ncol, ngpt), 0.3)
    ref, refd, tra, trad = reftra_sw(tau, omega, g_asym, mu0,
                                     jnp.ones(shape, bool),
                                     use_tables=False)
    dbt = _exp_transmittance(tau / mu0, use_tables=False)
    tdbt = jnp.concatenate(
        [jnp.ones((1, ncol, ngpt)), jnp.cumprod(dbt, axis=0)], axis=0)
    fd, fu = vrtqdr_sw(ref, refd, tra, trad, dbt, tdbt, alb, alb)
    # layers conserve: net flux into the column at TOA equals the net
    # absorbed at the surface (no atmospheric absorption at omega=1)
    net_toa = np.asarray(fd[0] - fu[0])
    net_sfc = np.asarray(fd[-1] - fu[-1])
    assert (np.abs(net_toa - net_sfc) / net_toa < 5e-3).all()
    # surface energy balance: up = albedo * down
    np.testing.assert_allclose(np.asarray(fu[-1]),
                               np.asarray(0.3 * fd[-1]), rtol=1e-5)


class TestMcicaStatistics:
    """The cloudy McICA 3d family is stochastic (our jax.random stream
    differs from the Fortran KISS/Mersenne one), so it is validated
    statistically: column-mean fluxes must agree with the reference
    cache to within surrogate accuracy + sampling noise
    (docs/RRTMG_LW_STATUS.md)."""

    def test_lw_mcica_cloudy_flux_statistics(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from golden import load_cached_outputs, reference_available
        if not reference_available:
            pytest.skip('reference caches unavailable')
        cached = load_cached_outputs('TestRRTMGLongwaveMCICA', '3d')
        cache_up = None
        for d in cached:
            for name, (vals, _, _) in d.items():
                if name == 'upwelling_longwave_flux_in_air':
                    cache_up = np.asarray(vals)
        assert cache_up is not None

        np.random.seed(0)
        lw = ct.RRTMGLongwave(mcica=True)
        state = ct.get_default_state(
            [lw], grid_state=ct.get_grid(nx=10, ny=5))
        state['cloud_area_fraction_in_atmosphere_layer'][16:19] = 0.5
        state['mass_content_of_cloud_ice_in_atmosphere_layer'][16:19] = 0.3
        _, diag = lw(state)
        up = np.asarray(diag['upwelling_longwave_flux_in_air'].values)

        # TOA mean within surrogate accuracy + 3 sigma of sampling noise
        assert abs(up[-1].mean() - cache_up[-1].mean()) < 8.0
        # the cloud field must actually perturb the fluxes stochastically
        assert 0.5 < up[-1].std() < 4.0 * max(cache_up[-1].std(), 1.0)
        # clouds reduce OLR relative to clear sky
        upc = np.asarray(diag[
            'upwelling_longwave_flux_in_air_assuming_clear_sky'].values)
        assert (upc[-1] - up[-1]).mean() > 10.0

    def test_sw_mcica_cloudy_flux_statistics(self):
        """The SW core is golden-exact, so the only McICA discrepancy vs
        the reference cache is subcolumn sampling noise (different RNG
        stream).  Reference state: test_components.py:393-404 (nx=3,
        ny=2, nz=15, ice cloud at layers 10:12, cldfrac 0.5)."""
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from golden import load_cached_outputs, reference_available
        if not reference_available:
            pytest.skip('reference caches unavailable')
        cached = load_cached_outputs('TestRRTMGShortwaveMCICA', '3d')
        cache_up = cache_upc = None
        for d in cached:
            for name, (vals, _, _) in d.items():
                if name == 'upwelling_shortwave_flux_in_air':
                    cache_up = np.asarray(vals)
                if name == ('upwelling_shortwave_flux_in_air_'
                            'assuming_clear_sky'):
                    cache_upc = np.asarray(vals)
        assert cache_up is not None

        np.random.seed(0)
        sw = ct.RRTMGShortwave(mcica=True)
        state = ct.get_default_state(
            [sw], grid_state=ct.get_grid(nx=3, ny=2, nz=15))
        state['cloud_area_fraction_in_atmosphere_layer'][10:12] = 0.5
        state['mass_content_of_cloud_ice_in_atmosphere_layer'][10:12] = 0.3
        # average our side over 16 independent draws so the residual
        # noise is dominated by the cache's single 6-column sample
        toa_means, toa_cols, upc = [], [], None
        for _ in range(16):
            _, diag = sw(state)
            up = np.asarray(
                diag['upwelling_shortwave_flux_in_air'].values)
            toa_means.append(up[-1].mean())
            toa_cols.append(up[-1])
            upc = np.asarray(diag[
                'upwelling_shortwave_flux_in_air_assuming_clear_sky'
            ].values)
        my_mean = np.mean(toa_means)
        my_col_std = np.std(np.asarray(toa_cols))

        # clear sky is deterministic and golden: exact match
        np.testing.assert_allclose(upc, cache_upc, rtol=1e-5, atol=1e-4)
        # all-sky TOA mean within 3 sigma of the cache's 6-column
        # sampling noise (cache column std ~75 W/m^2 -> mean std ~31)
        sigma = max(np.asarray(cache_up[-1]).std(), my_col_std) / np.sqrt(6)
        assert abs(my_mean - cache_up[-1].mean()) < 3.0 * sigma + 5.0
        # per-column spread consistent with the cache's
        assert 0.3 < my_col_std / max(cache_up[-1].std(), 1.0) < 3.0
        # the cloud actually brightens the planet vs clear sky
        assert my_mean - upc[-1].mean() > 5.0
