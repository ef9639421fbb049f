"""Fused moist GCM: spectral dynamics + full physics in one jitted step.

The flagship configuration of BASELINE.md (config 5): the spectral
primitive-equation core with REAL RRTMG radiation — the golden-matched
112-g-point correlated-k shortwave (components/rrtmg/sw_spectral.py) and
the 140-g-point longwave pipeline (components/rrtmg/lw_spectral.py,
surrogate-calibrated k-tables, see docs/RRTMG_LW_STATUS.md) — Emanuel
convection, bulk surface fluxes + implicit boundary-layer mixing,
grid-scale condensation, and a slab ocean, everything traced into a
single ``lax.scan`` step.

Radiation runs on a lagged cadence (``rad_every`` dynamics steps, the
UpdateFrequencyWrapper pattern of the reference's
examples/gmd_aquaplanet.py:58-63 where radiation updates hourly), with
an equinox diurnal cycle (instantaneous zenith angle per longitude) and
the packaged climatological ozone profile interpolated in pressure.

All physics call the same pure kernels as the standalone climt-style
components (climt_tpu.components.*), re-oriented to the dycore's
top-down (nz, nlat, nlon) layout; there is exactly one compiled program
per run.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..components.emanuel_convection import emanuel_convect
from ..components.rrtmg.lw_spectral import rrtmg_lw_fluxes
from ..components.rrtmg.sw_spectral import (
    rrtmg_sw_fluxes, solar_variability)
from ..components.simple_physics import simple_physics_step
from ..core.grid import hybrid_sigma_pressure_coefficients
from ..core.util import bolton_q_sat, get_interface_values
from .spectral_dynamics import SpectralDycore

_G = 9.80665
_CPD = 1004.64
_SIGMA_SB = 5.670367e-8
_LV = 2.5e6
_RD = 287.0
_RV = 461.5
_AVOGADRO = 6.022140857e23

_DATA_DIR = os.path.join(os.path.dirname(__file__), '..', 'data')
# climatological ozone (mole/mole) on 30 reference pressures
_O3_P = 1e5 * np.linspace(0.998, 0.001, 30)[::-1]        # ascending Pa
_O3_V = np.load(os.path.join(_DATA_DIR, 'ozone_profile.npy'))[::-1]


def _make_radiation(dycore, nz, solar_constant=1367.0, albedo=0.27,
                    co2_ppm=330.0, col_chunk=8192):
    """radiation(T, q, p_mid, p_half, Ts, t_seconds) -> dict.

    Shapes (nz, ncol) bottom-up, pressures in Pa; returns heating rate
    in K/s plus surface/TOA flux diagnostics.  Full correlated-k LW+SW;
    columns processed in ``col_chunk`` blocks via lax.map to bound the
    live (nz, ncol, n_gpt) working set.
    """
    mu = np.asarray(dycore.sht.mu)
    nlat = mu.shape[0]
    nlon = dycore.nlon
    ncol = nlat * nlon
    lat = np.arcsin(mu)
    lon = 2.0 * np.pi * np.arange(nlon) / nlon
    coslat = np.cos(lat)[:, None] * np.ones((1, nlon))
    sinlat = np.sin(lat)[:, None] * np.ones((1, nlon))
    lon2 = np.broadcast_to(lon[None, :], (nlat, nlon))

    solar_config = solar_variability(-1, 0.0)
    sw_scale = solar_constant / 1368.22      # rrsw scon (parrrsw.f90:115)

    o3_logp = jnp.asarray(np.log(_O3_P))
    o3_vals = jnp.asarray(_O3_V)

    chunks = max(1, ncol // col_chunk) if ncol % col_chunk == 0 else 1

    def radiation(T, q, p_mid, p_half, Ts, t_seconds):
        dtype = T.dtype
        play = p_mid / 100.0
        plev = p_half / 100.0
        h2ovmr = q * (28.964 / 18.02)
        o3vmr = jnp.interp(jnp.log(p_mid), o3_logp, o3_vals).astype(dtype)
        co2 = jnp.full_like(T, co2_ppm * 1e-6)
        zero = jnp.zeros_like(T)
        o2 = jnp.full_like(T, 0.21)
        tlev = get_interface_values(
            T, Ts, p_mid, p_half)

        # equinox diurnal cycle: hour angle advances with model time
        hour_angle = (2.0 * jnp.pi * (t_seconds / 86400.0)
                      + jnp.asarray(lon2.reshape(-1), dtype))
        mu0 = (jnp.asarray(coslat.reshape(-1), dtype)
               * jnp.cos(hour_angle))
        day = mu0 > 0.0
        mu0 = jnp.maximum(mu0, 1e-6)

        emis = jnp.ones((16,) + Ts.shape, dtype)

        def one_chunk(args):
            (play_c, plev_c, T_c, tlev_c, Ts_c, h2o_c, o3_c, co2_c,
             o2_c, mu0_c, day_c, emis_c) = args
            nc = play_c.shape[1]
            zero_c = jnp.zeros_like(play_c)
            lw = rrtmg_lw_fluxes(
                play_c, plev_c, T_c, tlev_c, Ts_c, h2o_c, o3_c, co2_c,
                zero_c, zero_c, o2_c, zero_c, zero_c, zero_c, zero_c,
                emis_c, zero_c, jnp.zeros((nz, nc, 16), dtype),
                zero_c, zero_c, jnp.full_like(play_c, 25.0),
                jnp.full_like(play_c, 10.0),
                jnp.zeros((nz, nc, 16), dtype),
                _G, _AVOGADRO, _CPD, use_tables=False)
            lw_up, lw_dn, lw_hr = lw[0], lw[1], lw[2]

            alb = jnp.full((nc,), albedo, dtype)
            nocloud = (jnp.zeros((nz, nc, 14), dtype),) * 4
            noaer = (jnp.zeros((nz, nc, 14), dtype),) * 3
            sw_up, sw_dn, _, _, sw_hr, _ = rrtmg_sw_fluxes(
                play_c, plev_c, T_c, h2o_c, o3_c, co2_c, zero_c,
                zero_c, o2_c, alb, alb, alb, alb, mu0_c,
                zero_c, nocloud, noaer,
                sw_scale, -1, 0.0, -1, solar_config,
                _G, _AVOGADRO, _CPD, icld=0, use_tables=False)
            daym = day_c[None, :]
            sw_up = jnp.where(daym, sw_up, 0.0)
            sw_dn = jnp.where(daym, sw_dn, 0.0)
            sw_hr = jnp.where(daym, sw_hr, 0.0)
            hr = (lw_hr + sw_hr) / 86400.0          # K/day -> K/s
            return (hr,
                    sw_dn[0] - sw_up[0] + lw_dn[0] - lw_up[0],
                    lw_up[-1], sw_dn[-1] - sw_up[-1])

        if chunks > 1:
            def resh(x, axis):
                # split the trailing column axis into (chunks, block)
                return jnp.moveaxis(
                    x.reshape(x.shape[:axis] + (chunks, -1)
                              + x.shape[axis + 1:]), axis, 0)
            args = (resh(play, 1), resh(plev, 1), resh(T, 1),
                    resh(tlev, 1), resh(Ts, 0), resh(h2ovmr, 1),
                    resh(o3vmr, 1), resh(co2, 1), resh(o2, 1),
                    resh(mu0, 0), resh(day, 0), resh(emis, 1))
            hr, sfc, olr, asr = jax.lax.map(one_chunk, args)
            hr = jnp.moveaxis(hr, 0, 1).reshape(nz, ncol)
            sfc = sfc.reshape(ncol)
            olr = olr.reshape(ncol)
            asr = asr.reshape(ncol)
        else:
            hr, sfc, olr, asr = one_chunk(
                (play, plev, T, tlev, Ts, h2ovmr, o3vmr, co2, o2,
                 mu0, day, emis))
        return {'hr_rad': hr, 'sfc_rad': sfc, 'olr': olr, 'asr': asr}

    return radiation


def _make_physics(dycore, nz, dt,
                  solar_constant=1367.0,
                  albedo=0.27,
                  ocean_depth=5.0,
                  co2_ppm=330.0,
                  emanuel_params=None,
                  rad_every=6,
                  rad_col_chunk=8192):
    """Return physics(grids, aux, step_idx) -> (tendencies, aux, diag).

    Radiation (full correlated-k LW+SW) refreshes every ``rad_every``
    steps; between refreshes the stored heating rates and surface fluxes
    are reused (the reference's UpdateFrequencyWrapper pattern).
    """
    mu = np.asarray(dycore.sht.mu)
    nlat = mu.shape[0]
    nlon = dycore.nlon

    radiation = _make_radiation(dycore, nz, solar_constant, albedo,
                                co2_ppm, col_chunk=rad_col_chunk)

    def to_cols(x):
        """(nz, nlat, nlon) top-down -> (nz, ncol) bottom-up."""
        return x.reshape(x.shape[0], -1)[::-1]

    def to_grid3(x):
        return x[::-1].reshape(nz, nlat, nlon)

    em_params = emanuel_params

    def physics(grids, aux, step_idx):
        u = to_cols(grids['u'])
        v = to_cols(grids['v'])
        T = to_cols(grids['T'])
        q = jnp.clip(to_cols(grids['q']), 0.0, None)
        ps = grids['ps'].reshape(-1)
        p_half = to_cols(grids['p_half'])          # (nz+1, ncol) bottom-up
        p_mid = 0.5 * (p_half[1:] + p_half[:-1])
        Ts = aux['Ts'].reshape(-1)
        cbmf = aux['cbmf'].reshape(-1)

        # ---- radiation on a lagged cadence -----------------------------
        t_model = step_idx.astype(T.dtype) * dt

        def fresh_rad(_):
            return radiation(T, q, p_mid, p_half, Ts, t_model)

        def stale_rad(_):
            return {'hr_rad': to_cols(aux['hr_rad']),
                    'sfc_rad': aux['sfc_rad'].reshape(-1),
                    'olr': aux['olr'].reshape(-1),
                    'asr': aux['asr'].reshape(-1)}

        rad = jax.lax.cond(step_idx % rad_every == 0,
                           fresh_rad, stale_rad, operand=None)
        hr_rad = rad['hr_rad']
        net_sfc_rad = rad['sfc_rad']

        # ---- surface fluxes + boundary layer (time-split kernel) ------
        qsurf = jnp.zeros_like(ps)
        T2, q2, u2, v2, precip_ls, shf, lhf = simple_physics_step(
            T, q, u, v, p_mid, p_half, ps, Ts, qsurf, dt,
            _G, _CPD, _RD, _RV, _LV, 1000.0,
            85000.0, 20000.0, 0.0011, 0.0007, 0.000065, 0.002,
            True, True, True, False)
        lhf = jnp.maximum(lhf, 0.0)
        du_sp = (u2 - u) / dt
        dv_sp = (v2 - v) / dt
        dT_sp = (T2 - T) / dt
        dq_sp = (q2 - q) / dt

        # ---- Emanuel convection ---------------------------------------
        qs = bolton_q_sat(T, p_mid, _RD, _RV)
        conv = emanuel_convect(
            T.T, q.T, qs.T, u.T, v.T, (p_mid / 100.0).T,
            (p_half / 100.0).T, cbmf, dt, nz - 3, em_params)

        du = du_sp + conv['fu'].T
        dv = dv_sp + conv['fv'].T
        dT = dT_sp + hr_rad + conv['ft'].T
        dq = dq_sp + conv['fq'].T

        # ---- slab ocean -----------------------------------------------
        net_sfc = net_sfc_rad - shf - lhf
        heat_capacity = 1.029e3 * 4.1813e3 * ocean_depth
        Ts_new = Ts + dt * net_sfc / heat_capacity

        aux_new = {
            'Ts': Ts_new.reshape(nlat, nlon),
            'cbmf': conv['cbmf'].reshape(nlat, nlon),
            'hr_rad': to_grid3(hr_rad),
            'sfc_rad': net_sfc_rad.reshape(nlat, nlon),
            'olr': rad['olr'].reshape(nlat, nlon),
            'asr': rad['asr'].reshape(nlat, nlon),
        }
        diag = {
            'olr': rad['olr'].reshape(nlat, nlon),
            'asr': rad['asr'].reshape(nlat, nlon),
            'conv_precip': conv['precip'].reshape(nlat, nlon),
            'ls_precip': precip_ls.reshape(nlat, nlon),
            'shf': shf.reshape(nlat, nlon),
            'lhf': lhf.reshape(nlat, nlon),
        }
        phys = {
            'du': to_grid3(du),
            'dv': to_grid3(dv),
            'dT': to_grid3(dT),
            'dq': to_grid3(dq),
        }
        return phys, aux_new, diag

    return physics


def build_moist_gcm(nlon=128, nlat=64, nz=28, timestep=600.0,
                    number_of_damped_levels=5, ocean_depth=5.0,
                    dtype=jnp.float32, fft_impl='fft', rad_every=6,
                    rad_col_chunk=8192, conserve_water=True, mesh=None,
                    moisture_advection='spectral'):
    """Return (dycore, init_fn, step_fn, run_fn) for the full moist GCM.

    run_fn(carry, n_steps) -> carry; carry = (prev, now, grids, aux, k0)
    where k0 is the global step index (drives the radiation cadence and
    the diurnal cycle).

    mesh: optional ``jax.sharding.Mesh`` with a 'lat' axis — the
    production multi-chip layout: grid fields sharded over latitude
    bands, spectral state m-sharded through ``parallel.DistributedSHT``
    (all_to_all transposes inside the fused step), column physics local
    to each device's latitude band.

    conserve_water: spectral (advective-form) moisture transport plus
    negative-value clipping silently creates/destroys water; when True, a
    global multiplicative mass fixer rescales the non-negative part of
    the advected humidity so the area-weighted total water after each
    leapfrog step equals the pre-step total plus the physics source
    (evaporation - precipitation) — the same role as the mass fixer in
    the GFS's grid-space tracer advection.  Closure is asserted in
    tests/test_dycore_multistep.py.

    moisture_advection: 'spectral', 'fv', or 'sl'.  'fv' moves moisture
    by the conservative grid-space flux-form operator
    (ops/fv_advection.py): LOCALLY conservative and positive-definite,
    so the global fixer is unnecessary and disabled.  'sl' uses
    semi-Lagrangian transport (ops/sl_advection.py): unconditionally
    stable (no polar substepping), positive-definite through monotone
    interpolation, non-conservative — the global fixer stays on.
    """
    ak, bk = hybrid_sigma_pressure_coefficients(nz + 1, 1e5, 20.0)
    dycore = SpectralDycore(
        nlon, nlat, nz, ak, bk, timestep=timestep,
        number_of_damped_levels=number_of_damped_levels, dtype=dtype,
        fft_impl=fft_impl, mesh=mesh,
        moisture_advection=moisture_advection)
    if moisture_advection == 'fv':
        conserve_water = False        # FV is conservative by construction
    # 'sl' (semi-Lagrangian) is NON-conservative: keep the fixer on,
    # operating on the grid-space q (see _fix_water)

    em_params = dict(
        minorig=0, elcrit=0.0011, tlcrit=-55.0, entp=1.5, sigd=0.05,
        sigs=0.12, omtrain=50.0, omtsnow=5.5, coeffr=1.0, coeffs=0.8,
        cu=0.7, beta=10.0, dtmax=0.9, alpha=0.1, damp=0.1, delt0=300.0,
        g=_G, cpd=_CPD, cpv=1846.0, rd=_RD, rv=_RV, lv0=_LV,
        rowl=1000.0, cl=2500.0)

    physics = _make_physics(dycore, nz, timestep,
                            ocean_depth=ocean_depth,
                            emanuel_params=em_params,
                            rad_every=rad_every,
                            rad_col_chunk=rad_col_chunk)

    @jax.jit
    def _init(u, v, T, q, lnps, Ts, cbmf):
        spec = dycore.spectral_state_from_grid(u, v, T, q, lnps)
        prev, now = dycore.initial_step(spec)
        grids = dycore.grids_of(prev)
        nlat_, nlon_ = Ts.shape
        aux = {'Ts': Ts, 'cbmf': cbmf,
               'hr_rad': jnp.zeros((nz, nlat_, nlon_), dtype),
               'sfc_rad': jnp.zeros((nlat_, nlon_), dtype),
               'olr': jnp.zeros((nlat_, nlon_), dtype),
               'asr': jnp.zeros((nlat_, nlon_), dtype)}
        return prev, now, grids, aux

    def init_fn(seed=0):
        rng = np.random.RandomState(seed)
        shape = (nz, nlat, nlon)
        mu = np.asarray(dycore.sht.mu)
        # zonally-symmetric warm start: surface T declining poleward
        Ts2d = 300.0 - 40.0 * mu[:, None] ** 2 * np.ones((1, nlon))
        sigma = np.linspace(0.02, 0.98, nz)[:, None, None]  # top-down
        T = (Ts2d[None] - 60.0) + 60.0 * sigma ** 0.7
        T = np.maximum(T, 195.0) + 0.1 * rng.randn(*shape)
        q = 0.8 * 0.622 * 611.2 / 1e5 * np.exp(
            17.67 * (T - 273.15) / (T - 29.65)) * sigma ** 1.5
        q = np.clip(q, 1e-7, 0.025)
        zeros = np.zeros(shape)
        lnps = np.full((nlat, nlon), np.log(1e5))
        carry = _init(
            jnp.asarray(zeros, dtype=dtype), jnp.asarray(zeros, dtype=dtype),
            jnp.asarray(T, dtype=dtype), jnp.asarray(q, dtype=dtype),
            jnp.asarray(lnps, dtype=dtype),
            jnp.asarray(Ts2d, dtype=dtype),
            jnp.zeros((nlat, nlon), dtype=dtype))
        return carry + (jnp.zeros((), jnp.int32),)

    # Gaussian-quadrature area weights (sum over lat/lon of w/nlon = 2)
    _wlat = jnp.asarray(np.asarray(dycore.sht.weights), dtype)[None, :,
                                                               None]

    def _total_water(q_g, p_half):
        """Area-weighted mass-proxy integral sum(w * q * dp)."""
        dp = p_half[1:] - p_half[:-1]
        return jnp.sum(_wlat * q_g * dp)

    def _fix_water(new, prev, phys):
        """Global multiplicative moisture mass fixer (see docstring).

        Handles both moisture representations: spectral q (the
        advective-form default) and grid q (the 'sl' semi-Lagrangian
        path, whose horizontal interpolation is also non-conservative;
        the locally conservative 'fv' path never calls this)."""
        sht = dycore.sht
        grid_q = dycore.fv is not None
        q_prev = prev['q'] if grid_q else sht.synthesize(prev['q'])
        ps_prev = jnp.exp(sht.synthesize(prev['lnps']))
        ph_prev, _, _, _ = dycore._vertical_structures(ps_prev)
        src = jnp.sum(_wlat * phys['dq']
                      * (ph_prev[1:] - ph_prev[:-1]))
        target = _total_water(q_prev, ph_prev) + 2.0 * timestep * src

        q_new = new['q'] if grid_q else sht.synthesize(new['q'])
        ps_new = jnp.exp(sht.synthesize(new['lnps']))
        ph_new, _, _, _ = dycore._vertical_structures(ps_new)
        q_pos = jnp.clip(q_new, 0.0, None)
        tw_new = _total_water(q_pos, ph_new)
        scale = jnp.where(tw_new > 0.0,
                          jnp.clip(target, 0.0, None) / tw_new, 1.0)
        q_fixed = q_pos * scale
        return dict(new, q=q_fixed if grid_q else sht.analyze(q_fixed))

    def step_fn(carry, _):
        prev, now, prev_grids, aux, k = carry
        phys, aux_new, diag = physics(prev_grids, aux, k)
        filtered, new, now_grids = dycore.step(prev, now, phys=phys)
        if conserve_water:
            new = _fix_water(new, prev, phys)
        return (filtered, new, now_grids, aux_new, k + 1), diag

    @partial(jax.jit, static_argnums=(1,))
    def run_fn(carry, n_steps):
        carry, diags = jax.lax.scan(step_fn, carry, None, length=n_steps)
        last_diag = {k: v[-1] for k, v in diags.items()}
        return carry, last_diag

    return dycore, init_fn, step_fn, run_fn
