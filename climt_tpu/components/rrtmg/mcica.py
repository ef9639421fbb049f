"""McICA stochastic subcolumn generator for RRTMG LW/SW.

JAX reimplementation of the reference's Monte-Carlo Independent Column
Approximation cloud generator
(/root/reference/climt/_lib/rrtmg_lw/mcica_subcol_gen_lw.f90
generate_stochastic_clouds:151-523; the SW generator
mcica_subcol_gen_sw.f90 is the same algorithm over 112 g-points):

- one uniform deviate CDF per (g-point, column, layer), drawn per the
  overlap assumption: 1 = random (independent), 2 = maximum-random
  (reuse the neighbor's deviate while it is cloudy, else rescale),
  3 = maximum (single deviate per column);
- a subcolumn is cloudy where CDF >= 1 - cldfrac
  (mcica_subcol_gen_lw.f90:468-470);
- cloudy subcolumns carry the grid-mean in-cloud water paths and the
  band value of any direct-input optical depth, clear subcolumns zero
  (mcica_subcol_gen_lw.f90:477-498).

The reference seeds a per-call KISS/Mersenne-Twister stream with
np.random.randint (component.py:373-381 after the harness's
np.random.seed(0)).  We mirror that *protocol* -- a fresh seed drawn from
numpy's global RNG per call -- but generate the deviates with
jax.random (threefry), so individual subcolumn draws are not
bit-identical to the Fortran stream.  Statistical equivalence is tested
in tests/test_rrtmg.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

CLDMIN = 1.0e-6   # mcica_subcol_gen_lw.f90 cldmin (2.e-12 in newer AER;
                  # the in-tree version uses 1.e-6 via rrtmg usage)


def mcica_subcolumns(key, overlap, cldfrac, ciwp, clwp, tauc_band, ngb):
    """Generate per-g-point stochastic cloud subcolumns.

    Args:
      key: jax PRNG key.
      overlap: 1 random, 2 maximum-random, 3 maximum (static int).
      cldfrac/ciwp/clwp: (nz, ncol) grid-mean cloud fields, bottom-up.
      tauc_band: (nz, ncol, nbnd) direct-input cloud optical depth.
      ngb: (ngpt,) band index (0-based) per g-point.

    Returns (cldfmc, ciwpmc, clwpmc, taucmc), each (nz, ncol, ngpt).
    """
    nz, ncol = cldfrac.shape
    ngpt = len(ngb)
    dtype = cldfrac.dtype
    cldf = jnp.where(cldfrac < CLDMIN, 0.0, cldfrac)

    if overlap == 1:
        cdf = jax.random.uniform(key, (nz, ncol, ngpt), dtype)
    elif overlap == 2:
        # maximum-random: scan upward from the first layer, reusing the
        # deviate while the layer below is cloudy, rescaling otherwise
        # (mcica_subcol_gen_lw.f90:373-406)
        raw = jax.random.uniform(key, (nz, ncol, ngpt), dtype)

        def step(carry, xs):
            cdf_prev, cldf_prev = carry
            raw_l, cldf_l = xs
            cloudy_below = cdf_prev > (1.0 - cldf_prev)[:, None]
            cdf_l = jnp.where(cloudy_below, cdf_prev,
                              raw_l * (1.0 - cldf_prev)[:, None])
            return (cdf_l, cldf_l), cdf_l

        (_, _), cdf_rest = lax.scan(
            step, (raw[0], cldf[0]), (raw[1:], cldf[1:]))
        cdf = jnp.concatenate([raw[:1], cdf_rest], axis=0)
    elif overlap == 3:
        one = jax.random.uniform(key, (1, ncol, ngpt), dtype)
        cdf = jnp.broadcast_to(one, (nz, ncol, ngpt))
    else:
        raise ValueError('unsupported overlap %r' % (overlap,))

    iscloudy = cdf >= (1.0 - cldf)[..., None]
    cldfmc = jnp.where(iscloudy, 1.0, 0.0)
    ciwpmc = jnp.where(iscloudy, ciwp[..., None], 0.0)
    clwpmc = jnp.where(iscloudy, clwp[..., None], 0.0)
    taucmc = jnp.where(iscloudy, tauc_band[..., ngb], 0.0)
    return cldfmc, ciwpmc, clwpmc, taucmc
