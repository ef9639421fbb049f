"""Cross-check the Mosaic-lowered rtrn kernel against the XLA path.

Phase 1 (TPU, default env): run rtrn_lw with the Pallas dispatch at
small shapes, save outputs to /tmp/rtrn_tpu.npz.
Phase 2 (CPU env): recompute with CLIMT_TPU_PALLAS=0 (pure XLA) and
compare.  Run:  python tools/diag_rtrn_check.py save
          then: python tools/diag_rtrn_check.py check  (CPU env)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = '/tmp/rtrn_tpu.npz'


def build_inputs():
    import numpy as np
    rng = np.random.RandomState(7)
    nz, ncol, ngpt = 20, 384, 140
    return dict(
        taug=rng.rand(nz, ncol, ngpt).astype('f4') * 2.0,
        fracs=rng.rand(nz, ncol, ngpt).astype('f4'),
        planklay=rng.rand(nz, ncol, 16).astype('f4') * 0.2,
        planklev=rng.rand(nz + 1, ncol, 16).astype('f4') * 0.2,
        plankbnd=rng.rand(ncol, 16).astype('f4') * 0.2,
        semiss=(0.9 + 0.1 * rng.rand(16, ncol)).astype('f4'),
        pwvcm=rng.rand(ncol).astype('f4') * 4,
        cldfrac=((rng.rand(nz, ncol) > 0.5)
                 * rng.rand(nz, ncol)).astype('f4'),
        taucld=(rng.rand(nz, ncol, 16) * 3.0).astype('f4'),
        pz=(np.linspace(1000., 1., nz + 1)[:, None]
            * np.ones((1, ncol))).astype('f4'),
    )


def run(mode):
    os.environ['CLIMT_TPU_PALLAS'] = mode
    import jax
    import jax.numpy as jnp
    import numpy as np
    from climt_tpu.components.rrtmg import lw_spectral as L
    x = {k: jnp.asarray(v) for k, v in build_inputs().items()}
    heatfac = 9.80665 * 8.64e4 / (1004.64 * 1e2)
    out = jax.jit(lambda: L.rtrn_lw(
        x['taug'], x['fracs'], x['planklay'], x['planklev'],
        x['plankbnd'], x['semiss'], x['pwvcm'], x['cldfrac'],
        x['taucld'], x['pz'], heatfac, use_tables=False))()
    return [np.asarray(o) for o in out]


def main():
    import numpy as np
    cmd = sys.argv[1]
    if cmd == 'save':
        outs = run('1')
        np.savez(OUT, **{'o%d' % i: o for i, o in enumerate(outs)})
        print('saved', [o.shape for o in outs],
              'flux_up00=%.6f' % outs[0][0, 0])
    else:
        ref = run('0')
        got = np.load(OUT)
        worst = 0.0
        for i, r in enumerate(ref):
            g = got['o%d' % i]
            scale = np.abs(r).max()
            err = np.abs(g - r).max() / scale
            worst = max(worst, err)
            print('out[%d]: rel err %.2e (scale %.3g)' % (i, err, scale))
        print('WORST %.2e -> %s' % (worst,
                                    'OK' if worst < 5e-5 else 'FAIL'))


if __name__ == '__main__':
    main()
