"""Pallas radiation kernels vs their XLA reference paths.

The production TPU fast path routes the LW flux sweep through the fused
Pallas kernel (components/rrtmg/pallas_rtrn.py) and exposes a fused
table-mix kernel (components/rrtmg/fused_mix.py).  On CPU the kernels
run in the Pallas interpreter (CLIMT_TPU_PALLAS=interpret), which
executes the same kernel logic the Mosaic compiler lowers on TPU, so
these tests pin the kernels' numerics against the pure-XLA formulations
used by the f64 golden-parity path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from climt_tpu.components.rrtmg import lw_spectral as L
from climt_tpu.components.rrtmg.fused_mix import fused_mix_rows
from climt_tpu.components.rrtmg.interp import mix_rows
from climt_tpu.components.rrtmg.pallas_rtrn import rtrn_lw_fused


def test_fused_mix_rows_matches_xla():
    rng = np.random.RandomState(0)
    R, ng, T, nz, nc = 117, 12, 9, 7, 33
    tbl = jnp.asarray(rng.rand(R, ng), jnp.float32)
    idx = jnp.asarray(rng.randint(0, R, (T, nz, nc)), jnp.int32)
    w = jnp.asarray(rng.randn(T, nz, nc), jnp.float32)
    ref = mix_rows(tbl, list(zip(idx, w)))
    out = fused_mix_rows(tbl, idx, w, interpret=True)
    assert out.shape == ref.shape
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 1e-6 * np.abs(np.asarray(ref)).max()


def _rtrn_inputs(nz=9, ncol=40):
    rng = np.random.RandomState(1)
    f32 = jnp.float32
    taug = jnp.asarray(rng.rand(nz, ncol, L.NGPT) * 2.0, f32)
    fracs = jnp.asarray(rng.rand(nz, ncol, L.NGPT), f32)
    planklay = jnp.asarray(rng.rand(nz, ncol, 16) * 0.2, f32)
    planklev = jnp.asarray(rng.rand(nz + 1, ncol, 16) * 0.2, f32)
    plankbnd = jnp.asarray(rng.rand(ncol, 16) * 0.2, f32)
    semiss = jnp.asarray(0.9 + 0.1 * rng.rand(16, ncol), f32)
    pwvcm = jnp.asarray(rng.rand(ncol) * 4, f32)
    cldfrac = jnp.asarray(
        (rng.rand(nz, ncol) > 0.5) * rng.rand(nz, ncol), f32)
    taucld_band = jnp.asarray(rng.rand(nz, ncol, 16) * 3.0, f32)
    pz = jnp.asarray(np.linspace(1000., 1., nz + 1)[:, None]
                     * np.ones((1, ncol)), f32)
    return (taug, fracs, planklay, planklev, plankbnd, semiss, pwvcm,
            cldfrac, taucld_band, pz)


def test_rtrn_fused_matches_xla():
    (taug, fracs, planklay, planklev, plankbnd, semiss, pwvcm,
     cldfrac, taucld_band, pz) = _rtrn_inputs()
    heatfac = 9.80665 * 8.64e4 / (1004.64 * 1e2)
    ref = L.rtrn_lw(taug, fracs, planklay, planklev, plankbnd, semiss,
                    pwvcm, cldfrac, taucld_band, pz, heatfac,
                    use_tables=False)
    totu_r, totd_r, _, totuc_r, totdc_r, _ = ref

    t = L.load_support()
    f32 = jnp.float32
    a0 = jnp.asarray(t['secdiff_a0'], f32)
    a1 = jnp.asarray(t['secdiff_a1'], f32)
    a2 = jnp.asarray(t['secdiff_a2'], f32)
    fixed = np.zeros(16, bool)
    fixed[[0, 3]] = True
    fixed[9:] = True
    sec = jnp.clip(a0[:, None] + a1[:, None]
                   * jnp.exp(a2[:, None] * pwvcm[None]), 1.5, 1.8)
    secdiff = jnp.where(jnp.asarray(fixed)[:, None], 1.66, sec)
    dwave_g = (jnp.asarray(t['delwave'], f32)[jnp.asarray(L.NGB)]
               * float(t['wtdiff'][0]) * (np.pi * 2.0e4))

    totu, totd, totuc, totdc = rtrn_lw_fused(
        taug, fracs, planklay, planklev, plankbnd, semiss, secdiff,
        cldfrac, taucld_band, dwave_g, interpret=True)
    for a, b in ((totu, totu_r), (totd, totd_r), (totuc, totuc_r),
                 (totdc, totdc_r)):
        scale = np.abs(np.asarray(b)).max()
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 2e-6 * scale


def test_rtrn_dispatch_routes_through_kernel(monkeypatch):
    """rtrn_lw's production f32 path must dispatch to the fused kernel
    (CLIMT_TPU_PALLAS=interpret on CPU) and agree with the XLA path."""
    (taug, fracs, planklay, planklev, plankbnd, semiss, pwvcm,
     cldfrac, taucld_band, pz) = _rtrn_inputs(nz=7, ncol=24)
    heatfac = 9.80665 * 8.64e4 / (1004.64 * 1e2)
    args = (taug, fracs, planklay, planklev, plankbnd, semiss, pwvcm,
            cldfrac, taucld_band, pz, heatfac)

    monkeypatch.setenv('CLIMT_TPU_PALLAS', 'off')
    ref = L.rtrn_lw(*args, use_tables=False)

    monkeypatch.setenv('CLIMT_TPU_PALLAS', 'interpret')
    out = L.rtrn_lw(*args, use_tables=False)

    assert len(out) == len(ref)
    for a, b in zip(out, ref):
        scale = max(np.abs(np.asarray(b)).max(), 1e-6)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 5e-6 * scale
