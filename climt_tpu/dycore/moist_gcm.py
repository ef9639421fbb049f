"""Fused moist GCM: spectral dynamics + full physics in one jitted step.

The flagship configuration of BASELINE.md (config 5): the spectral
primitive-equation core with RRTMG-interface radiation, Emanuel convection,
bulk surface fluxes + implicit boundary-layer mixing, grid-scale
condensation, and a slab ocean — everything traced into a single
``lax.scan`` step (physics evaluated on the lagged grids, applied inside
the semi-implicit leapfrog).

All physics here call the same pure kernels as the standalone climt-style
components (climt_tpu.components.*), re-oriented to the dycore's top-down
(nz, nlat, nlon) layout; there is exactly one compiled program per run.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..components.emanuel_convection import emanuel_convect
from ..components.rrtmg.gas_optics import (
    NUM_LW_BANDS, delta_two_stream, lw_band_optical_depth,
    longwave_fluxes, sw_gas_optics, _SW_VIS_FRACTION)
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


def _make_physics(dycore, nz, dt,
                  solar_constant=1367.0,
                  albedo=0.27,
                  ocean_depth=5.0,
                  co2_ppm=330.0,
                  emanuel_params=None):
    """Return physics(grids, aux) -> (phys_tendencies, aux_new, diag)."""
    mu = np.asarray(dycore.sht.mu)
    nlat = mu.shape[0]
    nlon = dycore.nlon
    ncol = nlat * nlon

    # diurnal/annual-mean insolation: equinox daily mean per latitude
    coslat = np.sqrt(1.0 - mu ** 2)
    mu0_daily = np.maximum(coslat * 2.0 / np.pi, 0.02)
    mu0_grid = jnp.asarray(
        np.broadcast_to(mu0_daily[:, None], (nlat, nlon)).reshape(-1))
    # daylight-fraction weighting keeps the daily-mean insolation correct
    incident_scale = 0.5

    def to_cols(x):
        """(nz, nlat, nlon) top-down -> (nz, ncol) bottom-up."""
        return x.reshape(x.shape[0], -1)[::-1]

    def to_grid3(x):
        return x[::-1].reshape(nz, nlat, nlon)

    em_params = emanuel_params

    def physics(grids, aux):
        u = to_cols(grids['u'])
        v = to_cols(grids['v'])
        T = to_cols(grids['T'])
        q = jnp.clip(to_cols(grids['q']), 0.0, None)
        ps = grids['ps'].reshape(-1)
        p_half = to_cols(grids['p_half'])          # (nz+1, ncol) bottom-up
        p_mid = 0.5 * (p_half[1:] + p_half[:-1])
        Ts = aux['Ts'].reshape(-1)
        cbmf = aux['cbmf'].reshape(-1)

        dp = p_half[:-1] - p_half[1:]
        co2 = jnp.full_like(T, co2_ppm * 1e-6)
        o3 = o3_profile_fn(p_mid)

        # ---- longwave -------------------------------------------------
        T_int = get_interface_values(T, Ts, p_mid, p_half)
        tau_lw = lw_band_optical_depth(dp, q, co2, o3, p_mid, T)
        emis = jnp.ones((NUM_LW_BANDS, ncol), dtype=T.dtype)
        lw_up, lw_down = longwave_fluxes(tau_lw, T, T_int, Ts, emis,
                                         _SIGMA_SB)
        net_lw = lw_up - lw_down
        hr_lw = (_G / _CPD) * (net_lw[1:] - net_lw[:-1]) / (
            p_half[1:] - p_half[:-1])

        # ---- shortwave ------------------------------------------------
        tau_sw, omega_sw, g_sw = sw_gas_optics(dp, q, o3, p_mid, mu0_grid)
        alb = jnp.full((ncol,), albedo, dtype=T.dtype)
        inc_vis = jnp.full((ncol,), solar_constant * _SW_VIS_FRACTION
                           * incident_scale, dtype=T.dtype)
        inc_nir = jnp.full((ncol,),
                           solar_constant * (1 - _SW_VIS_FRACTION)
                           * incident_scale, dtype=T.dtype)
        dn_v, up_v = delta_two_stream(tau_sw[0], omega_sw[0], g_sw[0],
                                      mu0_grid, alb, alb, inc_vis)
        dn_n, up_n = delta_two_stream(tau_sw[1], omega_sw[1], g_sw[1],
                                      mu0_grid, alb, alb, inc_nir)
        sw_down = dn_v + dn_n
        sw_up = up_v + up_n
        net_sw = sw_down - sw_up
        hr_sw = (_G / _CPD) * (net_sw[1:] - net_sw[:-1]) / (
            p_half[:-1] - p_half[1:])

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
        dT = dT_sp + hr_lw + hr_sw + conv['ft'].T
        dq = dq_sp + conv['fq'].T

        # ---- slab ocean -----------------------------------------------
        net_sfc = (sw_down[0] - sw_up[0] + lw_down[0] - lw_up[0]
                   - shf - lhf)
        heat_capacity = 1.029e3 * 4.1813e3 * ocean_depth
        Ts_new = Ts + dt * net_sfc / heat_capacity

        aux_new = {
            'Ts': Ts_new.reshape(nlat, nlon),
            'cbmf': conv['cbmf'].reshape(nlat, nlon),
        }
        diag = {
            'olr': lw_up[-1].reshape(nlat, nlon),
            'asr': (sw_down[-1] - sw_up[-1]).reshape(nlat, nlon),
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

    # climatological ozone (mole fraction) as a smooth analytic profile
    def o3_profile_fn(p_mid):
        # evaluate the spline on host once per build via static pressures
        # is not traceable; use a smooth analytic fit of the profile
        p = p_mid
        # peak ~8 ppm near 10 hPa falling off toward surface and top
        x = jnp.log(jnp.maximum(p, 1.0) / 1e3)       # log(p/10hPa)
        return 3e-8 + 7.5e-6 * jnp.exp(-0.5 * (x / 1.3) ** 2)

    return physics


def build_moist_gcm(nlon=128, nlat=64, nz=28, timestep=600.0,
                    number_of_damped_levels=5, ocean_depth=5.0,
                    dtype=jnp.float32, fft_impl='fft'):
    """Return (dycore, init_fn, step_fn, run_fn) for the full moist GCM.

    run_fn(carry, n_steps) -> carry; carry = (prev, now, grids, aux).
    """
    ak, bk = hybrid_sigma_pressure_coefficients(nz + 1, 1e5, 20.0)
    dycore = SpectralDycore(
        nlon, nlat, nz, ak, bk, timestep=timestep,
        number_of_damped_levels=number_of_damped_levels, dtype=dtype,
        fft_impl=fft_impl)

    em_params = dict(
        minorig=0, elcrit=0.0011, tlcrit=-55.0, entp=1.5, sigd=0.05,
        sigs=0.12, omtrain=50.0, omtsnow=5.5, coeffr=1.0, coeffs=0.8,
        cu=0.7, beta=10.0, dtmax=0.9, alpha=0.1, damp=0.1, delt0=300.0,
        g=_G, cpd=_CPD, cpv=1846.0, rd=_RD, rv=_RV, lv0=_LV,
        rowl=1000.0, cl=2500.0)

    physics = _make_physics(dycore, nz, timestep,
                            ocean_depth=ocean_depth,
                            emanuel_params=em_params)

    @jax.jit
    def _init(u, v, T, q, lnps, Ts, cbmf):
        spec = dycore.spectral_state_from_grid(u, v, T, q, lnps)
        prev, now = dycore.initial_step(spec)
        grids = dycore.grids_of(prev)
        aux = {'Ts': Ts, 'cbmf': cbmf}
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
        return _init(
            jnp.asarray(zeros, dtype=dtype), jnp.asarray(zeros, dtype=dtype),
            jnp.asarray(T, dtype=dtype), jnp.asarray(q, dtype=dtype),
            jnp.asarray(lnps, dtype=dtype),
            jnp.asarray(Ts2d, dtype=dtype),
            jnp.zeros((nlat, nlon), dtype=dtype))

    def step_fn(carry, _):
        prev, now, prev_grids, aux = carry
        phys, aux_new, diag = physics(prev_grids, aux)
        filtered, new, now_grids = dycore.step(prev, now, phys=phys)
        return (filtered, new, now_grids, aux_new), diag

    @partial(jax.jit, static_argnums=(1,))
    def run_fn(carry, n_steps):
        carry, diags = jax.lax.scan(step_fn, carry, None, length=n_steps)
        last_diag = {k: v[-1] for k, v in diags.items()}
        return carry, last_diag

    return dycore, init_fn, step_fn, run_fn
