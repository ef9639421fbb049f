"""Spherical horizontal differential operators on a lat/lon grid.

JAX counterparts of the reference's numpy operators
(/root/reference/climt/_core/horizontal_operators.py): centered
differences in the interior, one-sided at the edges (np.gradient
semantics), metric terms of the sphere, and a zero result when either
dimension is too small to difference.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.constants import get_constant


def _earth_radius():
    try:
        return get_constant('planetary_radius', 'm')
    except Exception:
        return 6.371e6


def _grads(field, lat, lon):
    a = _earth_radius()
    latr = jnp.deg2rad(lat)
    lonr = jnp.deg2rad(lon)
    if field.shape[0] < 3 or field.shape[1] < 3:
        z = jnp.zeros(field.shape, jnp.result_type(field, jnp.float32))
        return z, z
    dfdlat = jnp.gradient(field, axis=0) / jnp.gradient(latr, axis=0)
    dfdlon = jnp.gradient(field, axis=1) / jnp.gradient(lonr, axis=1)
    df_dy = dfdlat / a
    df_dx = dfdlon / (a * jnp.cos(latr))
    return df_dx, df_dy


def divergence(fx, fy, lat, lon):
    """d(fx)/dx + d(fy)/dy on the sphere; (nlat, nlon) arrays."""
    dfx_dx, _ = _grads(fx, lat, lon)
    _, dfy_dy = _grads(fy, lat, lon)
    return dfx_dx + dfy_dy


def curl_z(fx, fy, lat, lon):
    """Vertical curl d(fy)/dx - d(fx)/dy on the sphere."""
    dfy_dx, _ = _grads(fy, lat, lon)
    _, dfx_dy = _grads(fx, lat, lon)
    return dfy_dx - dfx_dy
