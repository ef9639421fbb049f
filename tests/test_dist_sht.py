"""Distributed spectral transform: the m-sharded all_to_all path must
reproduce the single-device transform exactly.

The DistributedSHT (climt_tpu/parallel/dist_sht.py) shards grid fields
over latitude bands (FFT local), transposes the Fourier coefficients
with an all_to_all, and performs m-local Legendre matmuls with the
spectral state SHARDED over m — the scalable layout the replicated-
spectral GSPMD path cannot provide.  These tests assert bit-level
equivalence (same tensors, same contractions, f64) on the forced
8-device CPU mesh and that round-tripping preserves spectral fields.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climt_tpu.ops.sht import SphericalHarmonicTransform
from climt_tpu.parallel import DistributedSHT, make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason='needs 8 devices')


def _setup(nlon=48, nlat=24, nz=5, axis_devices=8):
    mesh = make_mesh(axis_devices, mesh_shape=(axis_devices, 1))
    # matmul DFT: layout-robust under sharding on the CPU backend
    sht = SphericalHarmonicTransform(nlon, nlat, dtype=jnp.float64,
                                     fft_impl='matmul')
    dist = DistributedSHT(sht, mesh)
    rng = np.random.RandomState(3)
    grid = jnp.asarray(rng.randn(nz, nlat, nlon))
    return mesh, sht, dist, grid


def test_analysis_matches_single_device():
    mesh, sht, dist, grid = _setup()
    ref = np.asarray(sht.analyze(grid))
    grid_sharded = jax.device_put(grid, dist.grid_sharding())
    with mesh:
        spec = np.asarray(dist.unpad_spec(dist.analyze(grid_sharded)))
    np.testing.assert_allclose(spec, ref, rtol=1e-12, atol=1e-14)


def test_synthesis_matches_single_device():
    mesh, sht, dist, grid = _setup()
    spec = sht.analyze(grid)
    ref = np.asarray(sht.synthesize(spec))
    spec_sharded = jax.device_put(dist.pad_spec(spec),
                                  dist.spec_sharding())
    with mesh:
        out = np.asarray(dist.synthesize(spec_sharded))
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-14)


def test_roundtrip_preserves_spectral_field():
    """analyze(synthesize(spec)) == spec for band-limited fields."""
    mesh, sht, dist, grid = _setup()
    spec0 = sht.analyze(grid)                       # band-limited by mask
    spec_sharded = jax.device_put(dist.pad_spec(spec0),
                                  dist.spec_sharding())
    with mesh:
        grid_s = dist.synthesize(spec_sharded)
        spec1 = np.asarray(dist.unpad_spec(dist.analyze(grid_s)))
    np.testing.assert_allclose(spec1, np.asarray(spec0),
                               rtol=1e-10, atol=1e-12)


def test_m_padding_handles_non_divisible_truncation():
    """truncation+1 not divisible by the device count exercises the
    m-padding path."""
    mesh = make_mesh(8, mesh_shape=(8, 1))
    sht = SphericalHarmonicTransform(30, 16, truncation=9,
                                     dtype=jnp.float64,
                                     fft_impl='matmul')
    dist = DistributedSHT(sht, mesh)
    assert dist.M_padded % 8 == 0 and dist.M_padded >= 10
    rng = np.random.RandomState(0)
    grid = jnp.asarray(rng.randn(3, 16, 30))
    ref = np.asarray(sht.analyze(grid))
    with mesh:
        spec = np.asarray(dist.unpad_spec(
            dist.analyze(jax.device_put(grid, dist.grid_sharding()))))
    np.testing.assert_allclose(spec, ref, rtol=1e-12, atol=1e-14)


def test_gradient_matches_single_device():
    mesh, sht, dist, grid = _setup()
    spec = sht.analyze(grid)
    rx, ry = sht.gradient(spec)
    spec_sharded = jax.device_put(dist.pad_spec(spec),
                                  dist.spec_sharding())
    with mesh:
        gx, gy = dist.gradient(spec_sharded)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(ry),
                               rtol=1e-10, atol=1e-12)


def test_uv_and_vort_div_match_single_device():
    """Full vector-calculus loop: uv_from_vort_div and vort_div_analysis
    through the all_to_all path equal the single-device operators."""
    mesh, sht, dist, grid = _setup()
    rng = np.random.RandomState(7)
    vort = sht.filter_spec(sht.analyze(jnp.asarray(rng.randn(*grid.shape))))
    div = sht.filter_spec(sht.analyze(jnp.asarray(rng.randn(*grid.shape))))
    u_ref, v_ref = sht.uv_from_vort_div(vort, div)
    c_ref, d_ref = sht.vort_div_analysis(u_ref, v_ref)

    vs = jax.device_put(dist.pad_spec(vort), dist.spec_sharding())
    ds = jax.device_put(dist.pad_spec(div), dist.spec_sharding())
    with mesh:
        u, v = dist.uv_from_vort_div(vs, ds)
        c, d = dist.vort_div_analysis(u, v)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(dist.unpad_spec(c)),
                               np.asarray(c_ref), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(dist.unpad_spec(d)),
                               np.asarray(d_ref), rtol=1e-9, atol=1e-11)


def test_rank2_fields_roundtrip():
    """2-D (single-level) fields — the dycore's lnps path — promote
    through the rank-3 shard_map layout transparently."""
    mesh, sht, dist, grid = _setup()
    f2 = grid[0]
    ref = sht.analyze(f2)
    with mesh:
        spec = dist.analyze(jax.device_put(
            f2, jax.NamedSharding(mesh, jax.P('lat', None))))
        assert spec.shape == (dist.M_padded, sht.truncation + 1)
        back = dist.synthesize(spec)
    np.testing.assert_allclose(np.asarray(dist.unpad_spec(spec[None])[0]),
                               np.asarray(ref), rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(sht.synthesize(ref)),
        rtol=1e-12, atol=1e-14)
