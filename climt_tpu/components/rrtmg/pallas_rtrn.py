"""Fused Pallas kernel for the LW radiative-transfer sweep (rtrn).

``rtrn_lw`` (lw_spectral.py, mirroring rrtmg_lw_rtrn.f90:239-589) builds
~20 (140, nz, ncol) f32 intermediates (optical depths, transmittances,
Planck sources, cloudy/clear streams) before two lax.scans over layers:
at benchmark shapes that is ~5-8 GB of HBM traffic for 275 MB of taug —
the measured 2.5x-roofline gap (docs/RADIATION_ROOFLINE.md "LW rtrn").

This kernel fuses the whole sweep: per (column-tile, band) grid cell it
keeps the band's g-point slab in VMEM, recomputes layer quantities
inside the down/up loops (VPU recompute is free next to HBM), and
accumulates the quadrature-weighted flux sums directly, so per-g
radiances never exist in HBM.  Remaining traffic: one read of
taug/fracs (padded to 16 g per band) + tiny band arrays + four
(nz+1, ncol) flux outputs.

Scope: the production fast path — float32, analytic transmittance
(use_tables=False), band-level clouds, no dF/dTs.  Other variants
(float64 golden parity, Pade tables, McICA per-g clouds, idrv) keep the
XLA path in lw_spectral.rtrn_lw, which dispatches here when eligible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NBANDS = 16
NGPAD = 16          # g-points per band after padding (max real ng is 16)
COL_TILE = 256


def _layer_quants(tg, fr, blay, bup, bdn, odcl, cfl):
    """All per-layer (g, C) quantities of rtrn.f90:280-340, analytic
    transmittance path (lw_spectral._tbl_lookup use_tables=False)."""
    cloudy = cfl >= 1.0e-6
    odcl = jnp.where(cloudy, odcl, 0.0)
    od = jnp.maximum(tg, 0.0)
    od_safe = jnp.maximum(od, 1.0e-12)
    expo = jnp.exp(-od_safe)
    small = od <= 0.06
    atrans = jnp.where(small, od - 0.5 * od * od, 1.0 - expo)
    tfacgas = jnp.where(
        small, od / 6.0,
        1.0 - 2.0 * (1.0 / od_safe - expo / jnp.maximum(1.0 - expo,
                                                        1.0e-30)))
    odtot = od + odcl
    odtot_safe = jnp.maximum(odtot, 1.0e-12)
    expot = jnp.exp(-odtot_safe)
    small_t = odtot < 0.06
    atot = jnp.where(small_t, odtot - 0.5 * odtot * odtot, 1.0 - expot)
    tfactot = jnp.where(
        small_t, odtot / 6.0,
        1.0 - 2.0 * (1.0 / odtot_safe - expot / jnp.maximum(1.0 - expot,
                                                            1.0e-30)))
    bbdgas = fr * (blay + tfacgas * bdn)
    bbugas = fr * (blay + tfacgas * bup)
    bbdtot = fr * (blay + tfactot * bdn)
    bbutot = fr * (blay + tfactot * bup)
    abscld = 1.0 - jnp.exp(-odcl)
    efcl = jnp.where(cloudy, abscld * cfl, 0.0)
    return (atrans, atot, bbdgas, bbugas, bbdtot, bbutot, efcl, cfl,
            cloudy)


def _rtrn_kernel(nz, tg_ref, fr_ref, plk_ref, plv_ref, pbnd_ref, sem_ref,
                 secd_ref, odc_ref, cf_ref,
                 outu_ref, outd_ref, outuc_ref, outdc_ref):
    """One (column-tile, band) cell: full dn+up sweep, flux accumulate."""
    import jax.experimental.pallas as pl

    b = pl.program_id(1)
    sec = secd_ref[pl.ds(b, 1), :]                     # (1, C)
    C = sec.shape[1]

    @pl.when(b == 0)
    def _():
        outu_ref[:] = jnp.zeros_like(outu_ref)
        outd_ref[:] = jnp.zeros_like(outd_ref)
        outuc_ref[:] = jnp.zeros_like(outuc_ref)
        outdc_ref[:] = jnp.zeros_like(outdc_ref)

    def layer(z):
        tg = tg_ref[0, :, pl.ds(z, 1), :][:, 0, :] * sec
        fr = fr_ref[0, :, pl.ds(z, 1), :][:, 0, :]
        blay = plk_ref[0, pl.ds(z, 1), :]              # (1, C)
        bup = plv_ref[0, pl.ds(z + 1, 1), :] - blay
        bdn = plv_ref[0, pl.ds(z, 1), :] - blay
        odcl = odc_ref[0, pl.ds(z, 1), :] * sec
        cfl = cf_ref[0, pl.ds(z, 1), :]                # (1, C)
        return _layer_quants(tg, fr, blay, bup, bdn, odcl, cfl)

    def gsum(r):                                       # (NGPAD, C) -> (1, C)
        # quadrature weights are pre-folded into fracs by the caller, so
        # every radiance is already weighted: exact f32 sublane reduce
        return jnp.sum(r, axis=0, keepdims=True)

    # ---- downward sweep: top layer (nz-1) to surface ----
    def dn_body(t, carry):
        radld, radclrd = carry
        z = nz - 1 - t
        (atrans, atot, bbdgas, _, bbdtot, _, efcl, cfl,
         cloudy) = layer(z)
        gassrc = bbdgas * atrans
        rad_cloudy = (radld - radld * (atrans + efcl * (1.0 - atrans))
                      + gassrc + cfl * (bbdtot * atot - gassrc))
        rad_clear = radld + (bbdgas - radld) * atrans
        radld = jnp.where(cloudy, rad_cloudy, rad_clear)
        radclrd = radclrd + (bbdgas - radclrd) * atrans
        outd_ref[pl.ds(z, 1), :] += gsum(radld)
        outdc_ref[pl.ds(z, 1), :] += gsum(radclrd)
        return radld, radclrd

    zero = jnp.zeros((NGPAD, C), jnp.float32)
    radld, radclrd = jax.lax.fori_loop(0, nz, dn_body, (zero, zero))

    # ---- surface source + reflection (rtrn.f90:460-476) ----
    fr_sfc = fr_ref[0, :, 0, :]                        # (NGPAD, C)
    rad0 = fr_sfc * pbnd_ref[pl.ds(b, 1), :]
    reflect = 1.0 - sem_ref[pl.ds(b, 1), :]
    radlu = rad0 + reflect * radld
    radclru = rad0 + reflect * radclrd
    outu_ref[pl.ds(0, 1), :] += gsum(radlu)
    outuc_ref[pl.ds(0, 1), :] += gsum(radclru)

    # ---- upward sweep: surface layer 0 to top ----
    def up_body(z, carry):
        radlu, radclru = carry
        (atrans, atot, _, bbugas, _, bbutot, efcl, cfl,
         cloudy) = layer(z)
        gassrc = bbugas * atrans
        rad_cloudy = (radlu - radlu * (atrans + efcl * (1.0 - atrans))
                      + gassrc + cfl * (bbutot * atot - gassrc))
        rad_clear = radlu + (bbugas - radlu) * atrans
        radlu = jnp.where(cloudy, rad_cloudy, rad_clear)
        radclru = radclru + (bbugas - radclru) * atrans
        outu_ref[pl.ds(z + 1, 1), :] += gsum(radlu)
        outuc_ref[pl.ds(z + 1, 1), :] += gsum(radclru)
        return radlu, radclru

    jax.lax.fori_loop(0, nz, up_body, (radlu, radclru))


@functools.partial(jax.jit, static_argnames=('interpret',))
def rtrn_lw_fused(taug, fracs, planklay, planklev, plankbnd, semiss,
                  secdiff, cldfrac, taucld_band, dwave_g, interpret=False):
    """Fused flux integration.  Returns (totuflux, totdflux, totuclfl,
    totdclfl), each (nz+1, ncol), already quadrature-weighted (the
    fluxfac scaling is folded into dwave_g by the caller).

    taug/fracs (nz, ncol, 140); planklay (nz, ncol, 16); planklev
    (nz+1, ncol, 16); plankbnd (ncol, 16); semiss/secdiff (16, ncol);
    cldfrac (nz, ncol); taucld_band (nz, ncol, 16); dwave_g (140,).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .lw_spectral import NG, NGPT

    nz, ncol = taug.shape[:2]
    ncolp = -(-ncol // COL_TILE) * COL_TILE
    cpad = ncolp - ncol

    # scatter the 140 real g-points into the (band, NGPAD) padded layout
    gmap = np.zeros((NBANDS, NGPAD), np.int32)
    gmask = np.zeros((NBANDS, NGPAD), bool)
    off = 0
    for bi, ng in enumerate(NG):
        gmap[bi, :ng] = off + np.arange(ng)
        gmask[bi, :ng] = True
        off += ng
    assert off == NGPT
    gmap_j = jnp.asarray(gmap.reshape(-1))
    gmask_j = jnp.asarray(gmask.reshape(-1), taug.dtype)

    def to_gpad(x):                       # (nz, ncol, 140) -> (16,16,nz,ncolp)
        xp = jnp.moveaxis(x, -1, 0)[gmap_j] * gmask_j[:, None, None]
        xp = xp.reshape(NBANDS, NGPAD, nz, ncol)
        if cpad:
            xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, cpad)))
        return xp

    tg = to_gpad(taug)
    # fold the per-g quadrature weight into the Planck fractions: every
    # additive source term (and hence every radiance) is proportional to
    # fracs, so the flux g-sums reduce to plain sums — keeping the
    # reduction exact f32 on the VPU (an MXU dot would round bf16 here)
    fr = to_gpad(fracs * dwave_g[None, None, :].astype(fracs.dtype))

    def cols(x):                          # (..., ncol) -> (..., ncolp)
        if cpad:
            pads = [(0, 0)] * (x.ndim - 1) + [(0, cpad)]
            return jnp.pad(x, pads)
        return x

    plk = cols(jnp.moveaxis(planklay, -1, 0))          # (16, nz, ncolp)
    plv = cols(jnp.moveaxis(planklev, -1, 0))          # (16, nz+1, ncolp)
    pbnd = cols(plankbnd.T)                            # (16, ncolp)
    sem = cols(semiss)                                 # (16, ncolp)
    secd = cols(secdiff)                               # (16, ncolp)
    odc = cols(jnp.moveaxis(taucld_band, -1, 0))       # (16, nz, ncolp)
    cf = cols(cldfrac)[None]                           # (1, nz, ncolp)

    n_ct = ncolp // COL_TILE
    grid = (n_ct, NBANDS)
    C = COL_TILE

    kernel = functools.partial(_rtrn_kernel, nz)
    out_shape = [jax.ShapeDtypeStruct((nz + 1, ncolp), jnp.float32)] * 4
    out_spec = pl.BlockSpec((nz + 1, C), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec((1, NGPAD, nz, C), lambda i, j: (j, 0, 0, i),
                         memory_space=pltpu.VMEM),        # tg
            pl.BlockSpec((1, NGPAD, nz, C), lambda i, j: (j, 0, 0, i),
                         memory_space=pltpu.VMEM),        # fr
            pl.BlockSpec((1, nz, C), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),        # plk
            pl.BlockSpec((1, nz + 1, C), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),        # plv
            pl.BlockSpec((NBANDS, C), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),        # pbnd
            pl.BlockSpec((NBANDS, C), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),        # sem
            pl.BlockSpec((NBANDS, C), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),        # secd
            pl.BlockSpec((1, nz, C), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),        # odc
            pl.BlockSpec((1, nz, C), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),        # cf (band-invar)
        ],
        out_specs=[out_spec] * 4,
        cost_estimate=pl.CostEstimate(
            flops=int(60 * NGPT * nz * ncolp),
            bytes_accessed=int(tg.size * 8 + 5 * nz * ncolp * 4),
            transcendentals=int(4 * NGPT * nz * ncolp)),
        interpret=interpret,
    )(tg, fr, plk, plv, pbnd, sem, secd, odc, cf)
    totu, totd, totuc, totdc = [o[:, :ncol] for o in outs]
    return totu, totd, totuc, totdc
