"""Flux-form FV transport: conservation, consistency, positivity, and
the ppermute halo-exchange path.

The key property over the spectral advective path is LOCAL conservation:
total tracer mass is preserved to roundoff by construction (face fluxes
telescope), with no global rescaling — VERDICT r3 item 4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climt_tpu.ops.fv_advection import FVAdvection
from climt_tpu.ops.sht import SphericalHarmonicTransform

RADIUS = 6.371e6


def _grid(nlat=32, nlon=64):
    sht = SphericalHarmonicTransform(nlon, nlat, dtype=jnp.float64)
    return np.asarray(sht.mu), np.asarray(sht.weights), nlon


def _fields(mu, nlon, nz=4, seed=0):
    rng = np.random.RandomState(seed)
    nlat = mu.shape[0]
    lat = np.arcsin(mu)
    lon = 2 * np.pi * np.arange(nlon) / nlon
    L, F = np.meshgrid(lon, lat)
    q = 1e-3 * (1.0 + 0.8 * np.exp(
        -((F - 0.3) ** 2 / 0.08 + (L - np.pi) ** 2 / 0.3)))
    q = np.broadcast_to(q, (nz, nlat, nlon)).copy()
    q *= (1 + 0.1 * rng.rand(nz, 1, 1))
    dp = np.broadcast_to(
        np.linspace(2000.0, 5000.0, nz)[:, None, None],
        (nz, nlat, nlon)).copy()
    u = 20.0 * np.cos(F)[None] * np.ones((nz, 1, 1))
    v = 5.0 * np.sin(2 * F)[None] * np.cos(L)[None] * np.ones((nz, 1, 1))
    mdot = 0.01 * rng.randn(nz - 1, nlat, nlon)
    return (jnp.asarray(q), jnp.asarray(dp), jnp.asarray(u),
            jnp.asarray(v), jnp.asarray(mdot))


def _make(mu, w, nlon, dt=1200.0, **kw):
    return FVAdvection(mu, w, nlon, RADIUS, dt, dtype=jnp.float64, **kw)


def test_constant_field_preserved_exactly():
    """Lin-Rood consistency: q = const stays const under arbitrary
    divergent winds (the pseudo-density absorbs the divergence)."""
    mu, w, nlon = _grid()
    q, dp, u, v, mdot = _fields(mu, nlon)
    fv = _make(mu, w, nlon)
    q_const = jnp.full_like(q, 3.7e-4)
    out = fv.advect(q_const, dp, u, v, mdot, 1200.0)
    np.testing.assert_allclose(np.asarray(out), 3.7e-4, rtol=1e-12)


def test_total_mass_conserved_locally():
    """No global fixer: sum(q dp w) identical before/after to roundoff."""
    mu, w, nlon = _grid()
    q, dp, u, v, mdot = _fields(mu, nlon)
    fv = _make(mu, w, nlon)
    m0 = float(fv.total_mass(q, dp))
    # mass lives in (q dp); after transport the pseudo-density changed by
    # the discrete wind divergence, so track (q dp) via a second
    # constant-q advection of dp itself
    q1 = fv.advect(q, dp, u, v, mdot, 1200.0)
    dp1 = fv.advect(jnp.ones_like(q), dp, u, v, mdot, 1200.0)
    # recover the transported pseudo-density: advect returns Q/dp*; for
    # q=1 it returns exactly 1, so instead recompute dp* by running the
    # mass update directly
    qdp1, dps = fv._zonal(q, dp, u, 1200.0)
    qdp1, dps = fv._meridional(qdp1, dps, v, 1200.0)
    qdp1, dps = fv._vertical(qdp1, dps, mdot, 1200.0)
    m1 = float(fv.total_mass(qdp1, dps))
    assert abs(m1 - m0) / m0 < 1e-12
    assert np.isfinite(np.asarray(q1)).all()
    assert float(jnp.max(jnp.abs(dp1 - 1.0))) < 1e-12


def test_zonal_solid_body_translation():
    """Solid-body zonal wind moves a blob east by u dt / (a cos)
    longitudes and conserves mass, even at CFL > 1 polar rows."""
    mu, w, nlon = _grid(nlat=24, nlon=48)
    nz, nlat = 2, mu.shape[0]
    lat = np.arcsin(mu)
    lon = 2 * np.pi * np.arange(nlon) / nlon
    L, F = np.meshgrid(lon, lat)
    q0 = np.exp(-((L - np.pi) / 0.5) ** 2)
    q = jnp.asarray(np.broadcast_to(q0, (nz, nlat, nlon)).copy())
    dp = jnp.full((nz, nlat, nlon), 3000.0)
    # angular solid-body rotation: u = Omega a cos(phi) — every latitude
    # shifts by the same angle
    omega_rot = 2 * np.pi / (40 * 86400.0)
    u = jnp.asarray(np.broadcast_to(
        omega_rot * RADIUS * np.cos(F), (nz, nlat, nlon)).copy())
    v = jnp.zeros_like(q)
    mdot = jnp.zeros((nz - 1, nlat, nlon))
    dt = 3600.0
    fv = _make(mu, w, nlon, dt=dt)
    steps = 30
    m0 = float(fv.total_mass(q, dp))

    def run(q):
        for _ in range(steps):
            q = fv.advect(q, dp, u, v, mdot, dt)
        return q
    q1 = jax.jit(run)(q)
    m1 = float(fv.total_mass(q1, dp))
    assert abs(m1 - m0) / m0 < 1e-11
    # expected shift in grid cells
    shift = omega_rot * steps * dt / (2 * np.pi / nlon)
    com0 = np.angle(np.sum(np.asarray(q[0]) * np.exp(1j * L), (0, 1)))
    com1 = np.angle(np.sum(np.asarray(q1[0]) * np.exp(1j * L), (0, 1)))
    moved = (com1 - com0) % (2 * np.pi) / (2 * np.pi / nlon)
    assert abs(moved - shift) < 0.15 * shift + 0.5
    # monotone scheme: no new extrema
    assert float(jnp.min(q1)) >= -1e-12
    assert float(jnp.max(q1)) <= float(jnp.max(q)) + 1e-9


def test_meridional_transport_moves_mass_poleward():
    mu, w, nlon = _grid()
    nz, nlat = 2, mu.shape[0]
    lat = np.arcsin(mu)
    q0 = np.exp(-(lat / 0.3) ** 2)[None, :, None]
    q = jnp.asarray(np.broadcast_to(q0, (nz, nlat, nlon)).copy())
    dp = jnp.full((nz, nlat, nlon), 3000.0)
    u = jnp.zeros_like(q)
    v = jnp.full_like(q, 5.0)                  # northward everywhere
    mdot = jnp.zeros((nz - 1, nlat, nlon))
    fv = _make(mu, w, nlon)
    q1 = fv.advect(q, dp, u, v, mdot, 1200.0)
    lat_w = np.arcsin(mu) * w
    # center of mass (area-weighted latitude) must move north
    def com(qq):
        qq = np.asarray(qq[0, :, 0])
        return float((qq * lat_w).sum() / (qq * w).sum())
    assert com(q1) > com(q)
    assert float(jnp.min(q1)) >= -1e-12


def test_vertical_upwind_conserves_and_bounds():
    mu, w, nlon = _grid(nlat=8, nlon=16)
    nz, nlat = 6, mu.shape[0]
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.rand(nz, nlat, nlon))
    dp = jnp.asarray(1000.0 + 500.0 * rng.rand(nz, nlat, nlon))
    mdot = jnp.asarray(0.05 * rng.randn(nz - 1, nlat, nlon))
    fv = _make(mu, w, nlon)
    Q1, dp1 = fv._vertical(q * dp / dp, dp, mdot, 1200.0)
    # column mass of tracer conserved exactly
    col0 = np.asarray(jnp.sum(q * dp, axis=0))
    col1 = np.asarray(jnp.sum(Q1 * dp1, axis=0))
    np.testing.assert_allclose(col1, col0, rtol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_ppermute_halo_matches_single_device():
    """The lat-sharded meridional pass with explicit ppermute halos must
    reproduce the single-device shifts bit-for-bit."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from climt_tpu.parallel.halo import make_lat_halo

    mu, w, nlon = _grid()
    q, dp, u, v, mdot = _fields(mu, nlon)
    fv = _make(mu, w, nlon)
    ref = fv.advect(q, dp, u, v, mdot, 1200.0)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8, 1), ('lat', 'lon'))
    fv_sh = _make(mu, w, nlon, halo_exchange=make_lat_halo(mesh))
    sh = NamedSharding(mesh, P(None, 'lat', None))
    args = [jax.device_put(x, sh) for x in (q, dp, u, v)]
    mdot_sh = jax.device_put(mdot, sh)
    with mesh:
        out = jax.jit(lambda *a: fv_sh.advect(*a, 1200.0))(
            *args, mdot_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-13, atol=1e-16)
