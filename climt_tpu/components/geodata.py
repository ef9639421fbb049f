"""Geographical boundary-condition components: LandMask and DataOcean.

These are initialization/boundary components, not hot-path physics: they
run on host numpy (interpolation of small static datasets onto the model
grid) exactly once per call cadence — typically behind an
UpdateFrequencyWrapper — and feed device arrays downstream.  Reference
behavior: /root/reference/climt/_components/land_mask/component.py and
data_ocean/component.py (v0.31).

Bundled data (climt_tpu/data/): the reference's 2-degree Earth land mask
and topography and the 1-degree monthly SST climatology (sanctioned data
files, same provenance as the k-distribution tables).
"""

from __future__ import annotations

import datetime
import os

import numpy as np

from ..core.base_components import DiagnosticComponent

_DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'data')
_DEFAULT_MASK = os.path.join(_DATA, 'land_mask', 'earth_landmask_2deg.nc')
_DEFAULT_TOPO = os.path.join(_DATA, 'topography',
                             'earth_topography_2deg.nc')
_DEFAULT_SST = os.path.join(_DATA, 'data_ocean',
                            'earth_sst_climatology_1deg.nc')

_CODE_TO_NAME = {0: 'sea', 1: 'land', 2: 'land_ice'}

_MONTH_DAYS = np.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
                       float)
_MID_DOY = np.cumsum(_MONTH_DAYS) - _MONTH_DAYS + _MONTH_DAYS / 2.0


def _load_nc(path_or_ds):
    """dict of variables from a netCDF path (scipy) or mapping."""
    if isinstance(path_or_ds, dict):
        return path_or_ds
    if hasattr(path_or_ds, 'variables'):        # xarray-like Dataset
        return {k: np.asarray(path_or_ds[k].values)
                for k in path_or_ds.variables}
    from scipy.io import netcdf_file
    f = netcdf_file(path_or_ds, 'r', mmap=False)
    out = {}
    attrs = {}
    for k, v in f.variables.items():
        out[k] = np.array(v.data)
        u = getattr(v, 'units', b'')
        attrs[k] = u.decode() if isinstance(u, bytes) else u
    f.close()
    out['__units__'] = attrs
    return out


def _bilinear(src_lat, src_lon, field, lat, lon):
    """Bilinear interpolation with linear edge extrapolation (matches
    scipy RegularGridInterpolator(bounds_error=False, fill_value=None))."""
    from scipy.interpolate import RegularGridInterpolator
    interp = RegularGridInterpolator((src_lat, src_lon), field,
                                     bounds_error=False, fill_value=None)
    return interp(np.c_[lat, lon])


class LandMask(DiagnosticComponent):
    """Set ``area_type`` (and optionally topographic forcing) from data.

    Nearest-neighbour maps a categorical land/sea/land-ice geography onto
    the model grid; with ``load_topography=True`` also bilinearly maps
    orography and ice-sheet thickness, emitting ``surface_geopotential``
    and ``land_ice_thickness`` re-zeroed on sea cells so geography and
    topography stay consistent.  ``sea_ice`` is dynamic and owned by
    SeaIce, never set here.
    """

    input_properties = {
        'latitude': {'dims': ['*'], 'units': 'degrees_north'},
        'longitude': {'dims': ['*'], 'units': 'degrees_east'},
    }
    diagnostic_properties = {
        'area_type': {'dims': ['*'], 'units': 'dimensionless'},
    }

    def __init__(self, mask_dataset=None, include_land_ice=True,
                 topography_dataset=None, load_topography=True, **kwargs):
        ds = _load_nc(mask_dataset if mask_dataset is not None
                      else _DEFAULT_MASK)
        self._src_lat = np.asarray(ds['lat'], float)
        self._src_lon = np.asarray(ds['lon'], float)
        self._src_code = np.asarray(ds['area_type_code'])
        self._include_land_ice = include_land_ice
        self._weights = None

        self.diagnostic_properties = {
            'area_type': {'dims': ['*'], 'units': 'dimensionless'},
        }
        self._load_topography = load_topography
        if load_topography:
            tds = _load_nc(topography_dataset if topography_dataset
                           is not None else _DEFAULT_TOPO)
            self._topo_lat = np.asarray(tds['lat'], float)
            self._topo_lon = np.asarray(tds['lon'], float)
            self._geopotential = np.asarray(
                tds['surface_geopotential'], float)
            self._ice_thickness = np.asarray(
                tds['land_ice_thickness'], float)
            self.diagnostic_properties.update({
                'surface_geopotential': {
                    'dims': ['*'], 'units': 'm^2 s^-2'},
                'land_ice_thickness': {'dims': ['*'], 'units': 'm'},
            })
        super().__init__(**kwargs)

    def array_call(self, state):
        lat = np.asarray(state['latitude'])
        shape = lat.shape
        lat_flat = lat.reshape(-1).astype(float)
        lon_flat = np.asarray(state['longitude']).reshape(-1).astype(float)
        lon_wrapped = np.mod(lon_flat, 360.0)
        if self._weights is None:
            lat_idx = np.abs(
                self._src_lat[None, :] - lat_flat[:, None]).argmin(axis=1)
            lon_idx = np.abs(
                self._src_lon[None, :] - lon_wrapped[:, None]).argmin(axis=1)
            self._weights = (lat_idx, lon_idx)
        lat_idx, lon_idx = self._weights
        codes = self._src_code[lat_idx, lon_idx]
        area = np.empty(codes.shape, dtype='U100')
        for c, name in _CODE_TO_NAME.items():
            if c == 2 and not self._include_land_ice:
                name = 'land'
            area[codes == c] = name

        diagnostics = {'area_type': area.reshape(shape)}
        if self._load_topography:
            geop = np.clip(_bilinear(self._topo_lat, self._topo_lon,
                                     self._geopotential, lat_flat,
                                     lon_wrapped), 0.0, None)
            ice = np.clip(_bilinear(self._topo_lat, self._topo_lon,
                                    self._ice_thickness, lat_flat,
                                    lon_wrapped), 0.0, None)
            sea = area == 'sea'
            geop[sea] = 0.0
            ice[sea] = 0.0
            diagnostics['surface_geopotential'] = geop.reshape(shape)
            diagnostics['land_ice_thickness'] = ice.reshape(shape)
        return diagnostics


def mid_month_values(monthly_means):
    """Mid-month boundary values whose piecewise-linear reconstruction
    reproduces the given monthly means (Taylor, Williamson & Zwiers 2000):
    the cyclic tridiagonal relation mean_m = mm[m-1]/8 + 3 mm[m]/4 +
    mm[m+1]/8, solved directly (strictly diagonally dominant)."""
    means = np.asarray(monthly_means, float)
    n = means.shape[0]
    A = np.zeros((n, n))
    for m in range(n):
        A[m, (m - 1) % n] += 0.125
        A[m, m] += 0.75
        A[m, (m + 1) % n] += 0.125
    x = np.linalg.solve(A, means.reshape(n, -1))
    return x.reshape(means.shape)


def interp_time(mid_month, model_time):
    """Piecewise-linear evaluation of mid-month values at a model time
    (cyclic 365-day year; true calendar day-of-year)."""
    doy = ((model_time - type(model_time)(model_time.year, 1, 1)).days
           + (model_time.hour * 3600 + model_time.minute * 60
              + model_time.second) / 86400.0)
    mids = _MID_DOY
    if doy <= mids[0] or doy >= mids[-1]:
        m0, m1 = 11, 0
        span = mids[0] + (365.0 - mids[11])
        if doy <= mids[0]:
            frac = (doy + (365.0 - mids[11])) / span
        else:
            frac = (doy - mids[11]) / span
    else:
        m1 = int(np.searchsorted(mids, doy))
        m0 = m1 - 1
        frac = (doy - mids[m0]) / (mids[m1] - mids[m0])
    return (1 - frac) * mid_month[m0] + frac * mid_month[m1]


class DataOcean(DiagnosticComponent):
    """Prescribe observed SSTs on ``area_type == 'sea'`` cells.

    Loads a (time, lat, lon) SST dataset, nearest-valid-fills masked
    source points, converts monthly means to mid-month values (so the
    piecewise-linear time interpolation reproduces the monthly means),
    and per call interpolates in time then space onto the model grid.
    ``surface_temperature`` is overwritten only on sea cells.
    """

    input_properties = {
        'latitude': {'dims': ['*'], 'units': 'degrees_north'},
        'longitude': {'dims': ['*'], 'units': 'degrees_east'},
        'area_type': {'dims': ['*'], 'units': 'dimensionless'},
        'surface_temperature': {'dims': ['*'], 'units': 'degK'},
    }
    diagnostic_properties = {
        'sea_surface_temperature': {'dims': ['*'], 'units': 'degK'},
        'surface_temperature': {'dims': ['*'], 'units': 'degK'},
    }

    def __init__(self, sst_dataset=None, sst_variable='tos',
                 time_interpolation='mid_month', relaxation_timescale=None,
                 compute_fluxes=False, **kwargs):
        self._compute_fluxes = compute_fluxes
        if compute_fluxes:
            self.input_properties = dict(self.input_properties)
            self.input_properties.update({
                'eastward_wind': {'dims': ['*'], 'units': 'm/s'},
                'northward_wind': {'dims': ['*'], 'units': 'm/s'},
                'air_temperature': {'dims': ['*'], 'units': 'degK'},
                'specific_humidity': {'dims': ['*'], 'units': 'kg/kg'},
                'surface_specific_humidity': {
                    'dims': ['*'], 'units': 'kg/kg'},
                'air_density': {'dims': ['*'], 'units': 'kg/m^3'},
            })
            self.diagnostic_properties = dict(self.diagnostic_properties)
            self.diagnostic_properties.update({
                'surface_upward_sensible_heat_flux': {
                    'dims': ['*'], 'units': 'W m^-2'},
                'surface_upward_latent_heat_flux': {
                    'dims': ['*'], 'units': 'W m^-2'},
            })
        ds = _load_nc(sst_dataset if sst_dataset is not None
                      else _DEFAULT_SST)
        raw = np.asarray(ds[sst_variable], float)
        units = ''
        if isinstance(ds, dict) and '__units__' in ds:
            units = ds['__units__'].get(sst_variable, '').strip().lower()
        if units in ('degc', 'c', 'celsius', 'degrees_c', 'degrees c',
                     'degrees celsius', 'deg_c'):
            raw = raw + 273.15
        self._src_lat = np.asarray(ds['lat'], float)
        self._src_lon = np.asarray(ds['lon'], float)
        self._filled = self._fill_source(raw)
        self._time_interp = time_interpolation
        self._mid = (mid_month_values(self._filled)
                     if time_interpolation == 'mid_month' else self._filled)
        self._relaxation_timescale = relaxation_timescale
        super().__init__(**kwargs)

    def _fill_source(self, raw):
        from scipy.spatial import cKDTree
        out = raw.copy()
        LON, LAT = np.meshgrid(self._src_lon, self._src_lat)
        for t in range(out.shape[0]):
            layer = out[t]
            mask = ~np.isfinite(layer)
            if not mask.any():
                continue
            good = ~mask
            tree = cKDTree(np.c_[LAT[good], LON[good]])
            _, idx = tree.query(np.c_[LAT[mask], LON[mask]])
            layer[mask] = layer[good][idx]
        return out

    def array_call(self, state):
        lat = np.asarray(state['latitude'])
        shape = lat.shape
        lat_flat = lat.reshape(-1).astype(float)
        lon_flat = np.mod(np.asarray(
            state['longitude']).reshape(-1).astype(float), 360.0)
        t = state['time']
        if self._time_interp == 'mid_month':
            field = interp_time(self._mid, t)
        else:
            field = self._mid[t.month - 1]
        sst_flat = _bilinear(self._src_lat, self._src_lon, field,
                             lat_flat, lon_flat)
        area = np.asarray(state['area_type']).astype(str).reshape(-1)
        sea = area == 'sea'
        surf = np.asarray(
            state['surface_temperature']).reshape(-1).astype(float).copy()
        surf[sea] = sst_flat[sea]
        assert np.all(np.isfinite(sst_flat[sea]))
        diagnostics = {
            'sea_surface_temperature': sst_flat.reshape(shape),
            'surface_temperature': surf.reshape(shape),
        }
        if self._compute_fluxes:
            from ..core.surface_fluxes import bulk_fluxes
            fluxes = bulk_fluxes(
                wind_speed=np.sqrt(
                    np.asarray(state['eastward_wind']) ** 2
                    + np.asarray(state['northward_wind']) ** 2),
                surface_temperature=surf.reshape(shape),
                air_temperature=np.asarray(state['air_temperature']),
                surface_specific_humidity=np.asarray(
                    state['surface_specific_humidity']),
                air_specific_humidity=np.asarray(
                    state['specific_humidity']),
                air_density=np.asarray(state['air_density']))
            diagnostics['surface_upward_sensible_heat_flux'] = \
                fluxes['sensible_heat_flux']
            diagnostics['surface_upward_latent_heat_flux'] = \
                fluxes['latent_heat_flux']
        return diagnostics
