"""Spherical-harmonic-transform correctness tests: quadrature round trips,
derivative identities, and the vorticity-divergence <-> wind inverse pair."""

import jax.numpy as jnp
import numpy as np
import pytest

from climt_tpu.ops.sht import SphericalHarmonicTransform


@pytest.fixture(scope='module')
def sht():
    return SphericalHarmonicTransform(nlon=128, nlat=64, truncation=42)


def random_spec(sht, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    T = sht.truncation
    spec = (rng.randn(T + 1, T + 1) + 1j * rng.randn(T + 1, T + 1)) * scale
    spec[0] = spec[0].real  # m=0 coefficients are real
    spec *= np.asarray(sht.mask)
    # zero the highest degrees involved in derivative identities' edge
    return jnp.asarray(spec)


def test_roundtrip_spec_to_grid_to_spec(sht):
    spec = random_spec(sht)
    grid = sht.synthesize(spec)
    spec2 = sht.analyze(grid)
    np.testing.assert_allclose(np.asarray(spec2), np.asarray(spec),
                               atol=1e-12)


def test_roundtrip_constant_field(sht):
    grid = jnp.full((sht.nlat, sht.nlon), 3.25)
    spec = sht.analyze(grid)
    assert abs(spec[0, 0] - 3.25) < 1e-12
    grid2 = sht.synthesize(spec)
    np.testing.assert_allclose(np.asarray(grid2), 3.25, atol=1e-12)


def test_laplacian_of_harmonic(sht):
    # Y_2^1 is an eigenfunction of the Laplacian with eigenvalue -6/a^2
    T = sht.truncation
    spec = jnp.zeros((T + 1, T + 1), dtype=sht.cdtype).at[1, 2].set(1.0)
    grid = sht.synthesize(spec)
    lap_grid = sht.synthesize(sht.laplacian(spec))
    np.testing.assert_allclose(
        np.asarray(lap_grid), np.asarray(grid) * (-6.0 / sht.radius ** 2),
        atol=1e-18)


def test_uv_vort_div_roundtrip(sht):
    # random vorticity/divergence (zero global mean, truncated a bit below
    # T to keep the quadrature exact) -> winds -> re-analyzed vort/div
    vort = random_spec(sht, seed=1, scale=1e-5)
    div = random_spec(sht, seed=2, scale=1e-6)
    # remove global means and the top degree (derivative identities push
    # power to degree n+1, which the quadrature then aliases)
    T = sht.truncation
    keep = np.zeros((T + 1, T + 1))
    for m in range(T + 1):
        for n in range(m, T):
            keep[m, n] = 1.0
    keep[0, 0] = 0.0
    vort = vort * jnp.asarray(keep)
    div = div * jnp.asarray(keep)

    u, v = sht.uv_from_vort_div(vort, div)
    coslat = np.sqrt(1.0 - np.asarray(sht.mu) ** 2)[:, None]
    U = u * coslat
    V = v * coslat
    vort2, div2 = sht.vort_div_analysis(U, V)
    np.testing.assert_allclose(np.asarray(vort2 * jnp.asarray(keep)),
                               np.asarray(vort), atol=1e-16)
    np.testing.assert_allclose(np.asarray(div2 * jnp.asarray(keep)),
                               np.asarray(div), atol=1e-16)


def test_dlambda_derivative(sht):
    # g = Re[e^{i 3 lambda}] * P -> dg/dlambda analytic
    T = sht.truncation
    spec = jnp.zeros((T + 1, T + 1), dtype=sht.cdtype).at[3, 5].set(
        1.0 + 0.5j)
    grid_ddl = sht.synthesize_dlambda(spec)
    # numerical zonal derivative via FFT of the synthesized field
    grid = sht.synthesize(spec)
    k = np.fft.rfftfreq(sht.nlon) * sht.nlon
    num = np.fft.irfft(np.fft.rfft(np.asarray(grid), axis=-1)
                       * (1j * k), n=sht.nlon, axis=-1)
    np.testing.assert_allclose(np.asarray(grid_ddl), num, atol=1e-12)


def test_dmu_derivative_vs_finite_difference(sht):
    # (1-mu^2) dP/dmu from the H̄ tensor vs a central finite difference of
    # the P̄ recurrence evaluated at perturbed mu
    from climt_tpu.ops.sht import _legendre_tensors
    T = sht.truncation
    mu = np.asarray(sht.mu)
    h = 1e-6
    P_plus, _ = _legendre_tensors(T, mu + h)
    P_minus, _ = _legendre_tensors(T, mu - h)
    _, H = _legendre_tensors(T, mu)
    fd = (P_plus - P_minus) / (2 * h) * (1.0 - mu ** 2)
    for (m, n) in [(0, 3), (2, 6), (7, 7), (15, 30), (42, 42)]:
        np.testing.assert_allclose(H[m, n], fd[m, n], atol=5e-5,
                                   err_msg='H mismatch at m={} n={}'.format(
                                       m, n))
