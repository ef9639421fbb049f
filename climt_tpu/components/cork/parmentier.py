"""Parmentier & Guillot (2014) picket-fence optics and the Freedman
et al. (2014) Rosseland-mean opacity fit.

Reference: /root/reference/climt/_components/cork/optics/parmentier.py
(v0.31), vectorized over columns/levels (the reference loops per
column/level in Python).
"""

from __future__ import annotations

import functools
import os

import numpy as np

_DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'data', 'cork', 'parmentier')


@functools.lru_cache(maxsize=4)
def load_freedman2014_coefficients():
    with np.load(os.path.join(_DATA, 'freedman2014.npz')) as npz:
        return {k: npz[k] for k in npz.files}


def load_parmentier_coefficients(name_or_path):
    if os.path.isfile(name_or_path):
        with np.load(name_or_path) as npz:
            return {k: npz[k] for k in npz.files}
    with np.load(os.path.join(_DATA, name_or_path + '.npz')) as npz:
        return {k: npz[k] for k in npz.files}


def compute_rosseland_mean_opacity(T, p, coeffs):
    """Freedman et al. (2014) fit, m^2/kg; T, p arrays of any shape."""
    T = np.asarray(T, float)
    log_T = np.log10(np.maximum(T, 10.0))
    log_P = np.log10(np.maximum(np.asarray(p, float) * 10.0, 1.0))
    lo = (float(coeffs['a_lo']) * log_T + float(coeffs['b_lo']) * log_P
          + float(coeffs['c_lo']))
    hi = (float(coeffs['a_hi']) * log_T + float(coeffs['b_hi']) * log_P
          + float(coeffs['c_hi']))
    log_k = np.where(T < float(coeffs['T_boundary']), lo, hi)
    return 10.0 ** log_k * 0.1


def compute_thermal_opacities(kappa_R, gamma_P, beta, R):
    """Two thermal band opacities (P&G 2014 Eqs 87-96)."""
    kappa_2 = kappa_R * (beta / R + 1.0 - beta)
    kappa_1 = R * kappa_2
    return kappa_1, kappa_2


def lookup_ratio_coefficients(coeffs, T_eff):
    """Parmentier ratio coefficients at T_eff (vectorized over columns).

    Returns (gamma_v1, gamma_v2, gamma_v3, beta, gamma_P, R), each
    shaped like T_eff.
    """
    T_eff = np.asarray(T_eff, float)
    X = np.log10(np.maximum(T_eff, 10.0))
    boundaries = np.asarray(coeffs['T_eff_boundaries'], float)
    # region: the reference scans intervals and leaves region 0 when no
    # interval matches (T_eff below the first or at/above the last)
    nreg = len(boundaries) - 1
    region = np.zeros(T_eff.shape, np.int64)
    matched = np.zeros(T_eff.shape, bool)
    for i in range(nreg):
        sel = (~matched & (T_eff >= boundaries[i])
               & (T_eff < boundaries[i + 1]))
        region = np.where(sel, i, region)
        matched |= sel

    def lin(ab):
        ab = np.asarray(ab, float)
        return ab[region, 0] + ab[region, 1] * X

    gamma_v1 = 10.0 ** lin(coeffs['log10_gamma_v1_ab'])
    gamma_v2 = 10.0 ** lin(coeffs['log10_gamma_v2_ab'])
    gamma_v3 = 10.0 ** lin(coeffs['log10_gamma_v3_ab'])
    beta = np.clip(lin(coeffs['beta_ab']), 0.01, 0.99)
    quad = np.asarray(coeffs['log10_gamma_P_quad'], float)
    gamma_P = np.maximum(
        10.0 ** (quad[0] + quad[1] * X + quad[2] * X ** 2), 1.0)

    gp1 = gamma_P - 1.0
    disc = gp1 ** 2 + 4.0 * beta * (1.0 - beta) * gp1
    denom = 2.0 * beta * (1.0 - beta)
    R = np.where(disc < 0.0, 1.0,
                 np.maximum(1.0 + gp1 / denom
                            + np.sqrt(np.maximum(disc, 0.0)) / denom, 1.0))
    return gamma_v1, gamma_v2, gamma_v3, beta, gamma_P, R


def bond_albedo_from_fluxes(up_toa, down_toa):
    with np.errstate(divide='ignore', invalid='ignore'):
        a = np.where(np.asarray(down_toa) > 0,
                     np.asarray(up_toa) / np.asarray(down_toa), 0.0)
    return np.clip(a, 0.0, 1.0)


_STELLAR = os.path.join(os.path.dirname(_DATA), 'stellar_spectra')


def load_stellar_spectrum(name_or_path):
    path = (name_or_path if os.path.isfile(name_or_path)
            else os.path.join(_STELLAR, name_or_path + '.npz'))
    data = np.load(path)
    return {'wavenumber': np.array(data['wavenumber']),
            'irradiance': np.array(data['irradiance'])}


def integrate_spectrum_over_bands(spectrum, band_wavenumber_limits):
    """Trapezoid-integrate a stellar spectrum over wavenumber bands."""
    wn = spectrum['wavenumber']
    irr = spectrum['irradiance']
    nband = band_wavenumber_limits.shape[0]
    flux = np.zeros(nband)
    for b in range(nband):
        wn_lo, wn_hi = band_wavenumber_limits[b]
        mask = (wn > wn_lo) & (wn < wn_hi)
        irr_lo = np.interp(wn_lo, wn, irr)
        irr_hi = np.interp(wn_hi, wn, irr)
        wn_band = np.concatenate(([wn_lo], wn[mask], [wn_hi]))
        irr_band = np.concatenate(([irr_lo], irr[mask], [irr_hi]))
        flux[b] = np.trapezoid(irr_band, wn_band)
    return flux
