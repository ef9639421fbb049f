"""Semi-Lagrangian transport (ops/sl_advection.py): stability without
zonal substepping, monotone interpolation, trajectory accuracy, and the
moist-GCM 'sl' mode with the grid-space global mass fixer.

The reference's GFS-family dycore advected moisture by FV or
semi-Lagrangian schemes (SURVEY.md §2.4); ops/fv_advection.py is the
conservative member, this is the unconditionally stable one.
"""

import jax.numpy as jnp
import numpy as np

from climt_tpu.ops.sht import SphericalHarmonicTransform
from climt_tpu.ops.sl_advection import SLAdvection

RADIUS = 6.371e6


def _grid(nlat=32, nlon=64):
    sht = SphericalHarmonicTransform(nlon, nlat, dtype=jnp.float64)
    return np.asarray(sht.mu), np.asarray(sht.weights), nlon


def _make(mu, w, nlon, **kw):
    return SLAdvection(mu, w, nlon, RADIUS, 1200.0, dtype=jnp.float64,
                       **kw)


def _blob(mu, nlon, nz=3):
    nlat = mu.shape[0]
    lat = np.arcsin(mu)
    lon = 2 * np.pi * np.arange(nlon) / nlon
    L, F = np.meshgrid(lon, lat)
    q = np.exp(-((F - 0.2) ** 2 / 0.05 + (L - np.pi) ** 2 / 0.2))
    return jnp.asarray(np.broadcast_to(q, (nz, nlat, nlon)).copy())


def test_constant_field_preserved_exactly():
    mu, w, nlon = _grid()
    q = jnp.full((3, mu.shape[0], nlon), 4.2e-4, jnp.float64)
    dp = jnp.full_like(q, 3000.0)
    u = 35.0 * jnp.asarray(
        np.sqrt(1 - mu ** 2))[None, :, None] * jnp.ones_like(q)
    v = 4.0 * jnp.ones_like(q)
    mdot = 0.01 * jnp.ones((2, mu.shape[0], nlon), jnp.float64)
    sl = _make(mu, w, nlon)
    out = sl.advect(q, dp, u, v, mdot, 1200.0)
    np.testing.assert_allclose(np.asarray(out), 4.2e-4, rtol=1e-12)


def test_integer_zonal_shift_is_exact():
    """Solid-body zonal flow u = U cos(phi) displaces every latitude by
    the same angle; when that angle is an integer number of cells the
    bilinear weights are 0/1 and the translation must be exact."""
    mu, w, nlon = _grid()
    q = _blob(mu, nlon)
    dp = jnp.full_like(q, 3000.0)
    dlam = 2 * np.pi / nlon
    dt = 1800.0
    n_cells = 2
    U = n_cells * dlam * RADIUS / dt            # angular rate * a
    coslat = np.sqrt(1 - mu ** 2)
    u = jnp.asarray(U * coslat)[None, :, None] * jnp.ones_like(q)
    v = jnp.zeros_like(q)
    mdot = jnp.zeros((q.shape[0] - 1,) + q.shape[1:], jnp.float64)
    sl = _make(mu, w, nlon)
    out = sl.advect(q, dp, u, v, mdot, dt)
    expected = jnp.roll(q, n_cells, axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=1e-12)


def test_large_courant_number_stable():
    """Zonal Courant ~6 at the polar rows — fatal for explicit FV
    without substepping; SL must stay bounded and accurate."""
    mu, w, nlon = _grid()
    q = _blob(mu, nlon)
    dp = jnp.full_like(q, 3000.0)
    coslat = np.sqrt(1 - mu ** 2)
    u = jnp.asarray(90.0 * coslat)[None, :, None] * jnp.ones_like(q)
    v = jnp.zeros_like(q)
    mdot = jnp.zeros((q.shape[0] - 1,) + q.shape[1:], jnp.float64)
    sl = _make(mu, w, nlon)
    out = q
    for _ in range(10):
        out = sl.advect(out, dp, u, v, mdot, 3600.0)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    # monotone interpolation: no over/undershoots
    assert out.min() >= -1e-12
    assert out.max() <= float(jnp.max(q)) + 1e-12


def test_monotone_no_new_extrema():
    mu, w, nlon = _grid()
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.rand(2, mu.shape[0], nlon))
    dp = jnp.full_like(q, 3000.0)
    u = jnp.asarray(25.0 * np.sqrt(1 - mu ** 2))[None, :, None] \
        * jnp.ones_like(q)
    v = 6.0 * jnp.ones_like(q)
    mdot = jnp.zeros((1, mu.shape[0], nlon), jnp.float64)
    sl = _make(mu, w, nlon)
    out = np.asarray(sl.advect(q, dp, u, v, mdot, 1800.0))
    assert out.min() >= float(jnp.min(q)) - 1e-12
    assert out.max() <= float(jnp.max(q)) + 1e-12


def test_trajectory_iteration_tracks_rotation():
    """A full solid-body revolution (many steps) returns the blob to its
    start with bounded phase error and only diffusive amplitude loss."""
    mu, w, nlon = _grid(nlat=24, nlon=48)
    q = _blob(mu, nlon, nz=1)
    dp = jnp.full_like(q, 3000.0)
    n_steps = 48
    dt = 1800.0
    omega = 2 * np.pi / (n_steps * dt)          # one revolution total
    coslat = np.sqrt(1 - mu ** 2)
    u = jnp.asarray(omega * RADIUS * coslat)[None, :, None] \
        * jnp.ones_like(q)
    v = jnp.zeros_like(q)
    mdot = jnp.zeros((0,) + q.shape[1:], jnp.float64)
    sl = _make(mu, w, nlon)
    out = q
    for _ in range(n_steps):
        out = sl.advect(out, dp, u, v, mdot, dt)
    out = np.asarray(out)
    q0 = np.asarray(q)
    # peak returns to the starting cell's neighborhood
    p0 = np.unravel_index(np.argmax(q0[0]), q0[0].shape)
    p1 = np.unravel_index(np.argmax(out[0]), out[0].shape)
    dlon = min(abs(p1[1] - p0[1]), nlon - abs(p1[1] - p0[1]))
    assert dlon <= 1 and abs(p1[0] - p0[0]) <= 1
    # bilinear diffusion erodes the peak but keeps most of it
    assert out.max() > 0.35 * q0.max()


def test_moist_gcm_sl_mode_runs_and_closes_water():
    """build_moist_gcm(moisture_advection='sl'): steps are finite and
    the grid-space global fixer closes the water budget."""
    from climt_tpu.dycore.moist_gcm import build_moist_gcm
    model, init, step, run = build_moist_gcm(
        nlon=32, nlat=16, nz=8, timestep=600.0, dtype=jnp.float64,
        rad_every=4, rad_col_chunk=512, moisture_advection='sl')
    carry = init()
    out = run(carry, 6)
    carry = out[0] if isinstance(out, tuple) and len(out) == 2 else out
    prev = carry[0]
    q = np.asarray(prev['q'])                    # grid array in sl mode
    assert q.shape == (8, 16, 32)
    assert np.isfinite(q).all()
    assert q.min() >= 0.0
    T = np.asarray(model.sht.synthesize(prev['T']))
    assert np.isfinite(T).all()
    assert 150.0 < T.mean() < 350.0
