"""Correlated-k table loading and vectorized optical-depth evaluation.

Reference: /root/reference/climt/_components/cork/optics/correlated_k.py
(v0.31).  The reference evaluates the multilinear (T, log p
[, log X_H2O[, log X_CO2]]) k interpolation in per-column numba loops;
here every (level, column) point is bracketed once and the 2^d corner
gathers run as whole-grid jnp takes, so one jitted call covers the grid.

Shipped tables (climt_tpu/data/cork/correlated_k/) are the reference's
data files, loaded into plain dicts (materialised once — the lazy
NpzFile re-inflates on every access, the v0.31 performance fix).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .common import bracket

_DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'data', 'cork', 'correlated_k')

_NETCDF_VARS = (
    'k_coefficients', 'gpoint_weights', 'temperature_grid',
    'pressure_grid_log', 'h2o_vmr_grid', 'co2_vmr_grid',
    'band_wavenumber_limits', 'planck_fraction',
    'solar_source_per_gpoint', 'rayleigh_coefficient', 'continuum_kappa',
)

# CO2 runtime-axis interpolation: geometric (log-k) by design — the
# band-mean k is convex/saturating in amount, so linear-in-value over
# log-spaced nodes over-estimates it (reference _CO2_INTERP_LOGK)
CO2_INTERP_LOGK = True


def _decode(x):
    if isinstance(x, bytes):
        return x.decode('utf-8')
    if isinstance(x, np.ndarray) and x.dtype.kind == 'S':
        return x.tobytes().decode('utf-8').rstrip('\x00')
    return str(x)


def _load_netcdf_table(path):
    from scipy.io import netcdf_file
    out = {}
    with netcdf_file(path, 'r', mmap=False) as nc:
        for name in _NETCDF_VARS:
            if name in nc.variables:
                arr = np.asarray(nc.variables[name][:]).copy()
                if arr.dtype.byteorder not in ('=', '|'):
                    arr = arr.astype(arr.dtype.newbyteorder('='))
                out[name] = arr
        if 'gas_names' in nc.variables:
            raw = nc.variables['gas_names'][:]
            out['gas_names'] = np.asarray(
                [_decode(x) for x in np.atleast_1d(raw)])
        else:
            gn = getattr(nc, 'gas_names', None)
            if gn is not None:
                out['gas_names'] = np.asarray(
                    [s.strip() for s in _decode(gn).split(',')
                     if s.strip()])
        for attr in ('overlap_method', 'resolution',
                     'background_is_premixed'):
            val = getattr(nc, attr, None)
            if val is not None:
                out[attr] = np.asarray(_decode(val))
    return out


def _load_npz_table(path):
    with np.load(path, allow_pickle=True) as npz:
        return {name: npz[name] for name in npz.files}


@functools.lru_cache(maxsize=16)
def _load_named(name):
    for ext, loader in (('.npz', _load_npz_table),
                        ('.nc', _load_netcdf_table)):
        p = os.path.join(_DATA, name + ext)
        if os.path.isfile(p):
            return loader(p)
    raise FileNotFoundError(
        'No k-table named {!r} (.npz or .nc)'.format(name))


def load_k_table(name_or_path):
    """Load a correlated-k table into a plain dict (name resolves the
    shipped tables, preferring .npz; a path loads directly)."""
    if isinstance(name_or_path, dict):
        return name_or_path
    if os.path.isfile(name_or_path):
        if name_or_path.endswith('.nc'):
            return _load_netcdf_table(name_or_path)
        return _load_npz_table(name_or_path)
    return dict(_load_named(name_or_path))


def _gather_corners(k2, flat_idx):
    """k2: (G, nflat); flat_idx: (npts,) -> (G, npts)."""
    return jnp.take(k2, flat_idx, axis=1)


def interpolate_k_grid(k, T_grid, p_grid_log, log_x_grid, log_c_grid,
                       T, log_p, log_x, log_c, co2_logk):
    """Vectorized multilinear k interpolation at flattened points.

    k: (ngas, nband, ngpt, nT, nP[, nX[, nC]]); point arrays (npts,).
    Returns (ngas, nband, ngpt, npts).
    """
    has_x = k.ndim >= 6
    has_c = k.ndim == 7
    shape = k.shape
    G = shape[0] * shape[1] * shape[2]
    grids = shape[3:]

    iT, fT = bracket(T_grid, T)
    iP, fP = bracket(p_grid_log, log_p)
    idxs = [iT, iP]
    fracs = [fT, fP]
    if has_x:
        iX, fX = bracket(log_x_grid, log_x)
        idxs.append(iX)
        fracs.append(fX)
    if has_c:
        iC, fC = bracket(log_c_grid, log_c)

    k2 = k.reshape(G, -1)
    strides = []
    s = 1
    for dim in reversed(grids):
        strides.append(s)
        s *= dim
    strides = strides[::-1]

    # multilinear over the bracketed axes excluding CO2 (handled in
    # log-k space separately, matching the reference)
    naxes = len(idxs)

    def interp_at(c_off):
        acc = None
        for corner in range(2 ** naxes):
            offs = [(corner >> a) & 1 for a in range(naxes)]
            w = jnp.ones_like(fracs[0])
            for a in range(naxes):
                w = w * (fracs[a] if offs[a] else (1.0 - fracs[a]))
            if has_c:
                flat = jnp.zeros_like(idxs[0])
                for (i, off, st) in zip(idxs, offs, strides[:-1]):
                    flat = flat + (i + off) * st
                flat = flat + (iC + c_off) * strides[-1]
            else:
                flat = jnp.zeros_like(idxs[0])
                for (i, off, st) in zip(idxs, offs, strides):
                    flat = flat + (i + off) * st
            acc_term = _gather_corners(k2, flat) * w[None, :]
            acc = acc_term if acc is None else acc + acc_term
        return acc

    if not has_c:
        out = interp_at(0)
    else:
        c0 = interp_at(0)
        c1 = interp_at(1)
        if co2_logk:
            floor = 1e-40
            l0 = jnp.log(jnp.maximum(c0, floor))
            l1 = jnp.log(jnp.maximum(c1, floor))
            out = jnp.exp(l0 * (1.0 - fC)[None, :] + l1 * fC[None, :])
        else:
            out = c0 * (1.0 - fC)[None, :] + c1 * fC[None, :]
    return out.reshape(shape[0], shape[1], shape[2], -1)


def interpolate_continuum_grid(log_cont, T_grid, p_grid_log, log_x_grid,
                               T, log_p, log_x):
    """Band-grey H2O continuum, log-linear in value over (T, logp, logX)
    — exact for any power law in X (reference interpolate_continuum).
    log_cont: (nband, nT, nP, nX); returns (nband, npts)."""
    iT, fT = bracket(T_grid, T)
    iP, fP = bracket(p_grid_log, log_p)
    iX, fX = bracket(log_x_grid, log_x)
    nband = log_cont.shape[0]
    c2 = log_cont.reshape(nband, -1)
    nT, nP, nX = log_cont.shape[1:]

    def at(dT, dP, dX):
        flat = ((iT + dT) * nP + (iP + dP)) * nX + (iX + dX)
        return jnp.take(c2, flat, axis=1)

    x0 = (at(0, 0, 0) * ((1 - fT) * (1 - fP))[None]
          + at(1, 0, 0) * (fT * (1 - fP))[None]
          + at(0, 1, 0) * ((1 - fT) * fP)[None]
          + at(1, 1, 0) * (fT * fP)[None])
    x1 = (at(0, 0, 1) * ((1 - fT) * (1 - fP))[None]
          + at(1, 0, 1) * (fT * (1 - fP))[None]
          + at(0, 1, 1) * ((1 - fT) * fP)[None]
          + at(1, 1, 1) * (fT * fP)[None])
    return jnp.exp(x0 * (1 - fX)[None] + x1 * fX[None])


def compute_esft_weights(gpoint_weights, ngas):
    """ESFT combined g-point weights: outer product across gases."""
    nband, ngpt = gpoint_weights.shape
    combined = np.zeros((nband, ngpt ** ngas))
    for b in range(nband):
        w = gpoint_weights[b]
        for idx in range(ngpt ** ngas):
            weight, rem = 1.0, idx
            for _ in range(ngas):
                weight *= w[rem % ngpt]
                rem //= ngpt
            combined[b, idx] = weight
    return combined


def compute_ck_optical_depth(table, T, p, gas_amounts, h2o_vmr=None,
                             co2_vmr=None):
    """Optical depths from a correlated-k table (additive or ESFT).

    T/p/gas components are (nlev, ncol) jnp arrays; returns tau
    (nband, ngpt[, ^ngas], nlev, ncol) [+ weights for ESFT].
    """
    overlap = str(table.get('overlap_method', np.array('additive')))
    k = jnp.asarray(table['k_coefficients'], jnp.float64
                    if jax.config.jax_enable_x64 else jnp.float32)
    T_grid = jnp.asarray(table['temperature_grid'], k.dtype)
    p_grid_log = jnp.asarray(table['pressure_grid_log'], k.dtype)
    has_x = k.ndim >= 6
    has_c = k.ndim == 7
    nlev, ncol = T.shape
    npts = nlev * ncol

    log_p = jnp.log(jnp.maximum(p, 1.0)).reshape(npts)
    Tf = T.reshape(npts)
    log_x = log_c = None
    log_x_grid = log_c_grid = None
    if has_x:
        x_grid = np.asarray(table['h2o_vmr_grid'], float)
        log_x_grid = jnp.asarray(np.log(np.maximum(x_grid, 1e-30)),
                                 k.dtype)
        if h2o_vmr is None:
            raise ValueError('k-table has an h2o_vmr_grid axis but '
                             'h2o_vmr was not provided')
        xc = jnp.clip(h2o_vmr, float(x_grid[0]), float(x_grid[-1]))
        log_x = jnp.log(jnp.maximum(xc, 1e-30)).reshape(npts)
    if has_c:
        c_grid = np.asarray(table['co2_vmr_grid'], float)
        log_c_grid = jnp.asarray(np.log(np.maximum(c_grid, 1e-30)),
                                 k.dtype)
        if co2_vmr is None:
            raise ValueError('k-table has a co2_vmr_grid axis but '
                             'co2_vmr was not provided')
        cc = jnp.clip(co2_vmr, float(c_grid[0]), float(c_grid[-1]))
        log_c = jnp.log(jnp.maximum(cc, 1e-30)).reshape(npts)

    k_interp = interpolate_k_grid(
        k, T_grid, p_grid_log, log_x_grid, log_c_grid,
        Tf, log_p, log_x, log_c, CO2_INTERP_LOGK)
    # (ngas, nband, ngpt, npts) -> (..., nlev, ncol)
    ngas, nband, ngpt = k_interp.shape[:3]
    k_interp = k_interp.reshape(ngas, nband, ngpt, nlev, ncol)

    cont = None
    if ('continuum_kappa' in table
            and np.asarray(table['continuum_kappa']).ndim == 4
            and h2o_vmr is not None):
        log_cont = jnp.asarray(
            np.log(np.maximum(np.asarray(table['continuum_kappa'],
                                         float), 1e-40)), k.dtype)
        cont = interpolate_continuum_grid(
            log_cont, T_grid, p_grid_log, log_x_grid,
            Tf, log_p, log_x).reshape(nband, nlev, ncol)

    if overlap == 'esft' and ngas > 1:
        combined_weights = compute_esft_weights(
            np.asarray(table['gpoint_weights']), ngas)
        ngpt_c = ngpt ** ngas
        # tau[b, idx] = sum_g k[g, b, g_idx(g, idx)] * amount[g]
        tau = jnp.zeros((nband, ngpt_c, nlev, ncol), k_interp.dtype)
        for idx in range(ngpt_c):
            rem = idx
            acc = 0.0
            for ig in range(ngas):
                g_idx = rem % ngpt
                rem //= ngpt
                acc = acc + k_interp[ig, :, g_idx] * gas_amounts[ig]
            tau = tau.at[:, idx].set(acc)
        return tau, combined_weights

    tau = jnp.einsum('gbplc,glc->bplc', k_interp, gas_amounts)
    if cont is not None:
        tau = tau + (cont * gas_amounts[0])[:, None, :, :]
    return tau
