"""Compare the Pallas radiation kernels against the XLA paths on TPU.

1. LW rtrn: pallas_rtrn.rtrn_lw_fused vs the XLA analytic path
   (CLIMT_TPU_PALLAS=0 reruns in-process via direct calls).
2. taumol row-mix: fused_mix.fused_mix_rows vs interp.mix_rows at a
   representative band shape (585+1175 rows concatenated, 16 terms).

Run: python tools/diag_pallas_vs_xla.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.time()


def log(msg):
    print('[{:6.1f}s] {}'.format(time.time() - t0, msg), flush=True)


def bench(fn, *args, repeats=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t) / repeats


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import enable_compile_cache
    enable_compile_cache()
    log('devices: {}'.format(jax.devices()))

    nz, ncol = 60, 8192
    key = jax.random.PRNGKey(0)

    # ---- taumol row-mix micro-bench -----------------------------------
    from climt_tpu.components.rrtmg.interp import mix_rows
    from climt_tpu.components.rrtmg.fused_mix import fused_mix_rows

    for rows, ng, nterms in ((585, 16, 8), (1760, 16, 16), (585, 12, 12)):
        tbl = jax.random.normal(key, (rows, ng), jnp.float32)
        idx = jax.random.randint(key, (nterms, nz, ncol), 0, rows)
        w = jax.random.uniform(key, (nterms, nz, ncol), jnp.float32)

        @jax.jit
        def xla(idx, w):
            return mix_rows(tbl, list(zip(idx, w)))

        @jax.jit
        def pallas(idx, w):
            return fused_mix_rows(tbl, idx, w)

        a, b = xla(idx, w), pallas(idx, w)
        err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30))
        t_x = bench(xla, idx, w)
        t_p = bench(pallas, idx, w)
        log('mix rows={:5d} ng={:2d} T={:2d}: XLA {:7.2f} ms  '
            'Pallas {:7.2f} ms  rel_err {:.1e}'.format(
                rows, ng, nterms, t_x * 1e3, t_p * 1e3, err))

    # ---- LW rtrn: XLA vs Pallas ---------------------------------------
    from climt_tpu.components.rrtmg import lw_spectral as L

    dtype = jnp.float32
    p_sfc = 1013.0
    plev1 = np.linspace(p_sfc, 0.3, nz + 1)
    play1 = 0.5 * (plev1[:-1] + plev1[1:])
    tlay1 = np.maximum(300.0 - 60.0 * (1 - play1 / p_sfc) / 0.8, 205.0)
    tlev1 = np.concatenate([[302.0], 0.5 * (tlay1[:-1] + tlay1[1:]),
                            [tlay1[-1]]])

    def cols(x):
        return jnp.asarray(np.repeat(np.asarray(x)[:, None], ncol, 1), dtype)

    play, plev = cols(play1), cols(plev1)
    tlay, tlev = cols(tlay1), cols(tlev1)
    tsfc = jnp.full((ncol,), 300.0, dtype)
    h2o = cols(0.016 * (play1 / p_sfc) ** 3)
    o3 = cols(5e-6 * np.exp(-0.5 * ((np.log(play1) - np.log(20.0)) / 1.2) ** 2))
    co2 = jnp.full_like(play, 355e-6)
    o2 = jnp.full_like(play, 0.21)
    zero = jnp.zeros_like(play)
    emis = jnp.ones((16, ncol), dtype)
    grav, avogad, cpd = 9.80665, 6.022140857e23, 1004.64

    vmr = dict(h2o=h2o, co2=co2, o3=o3, n2o=zero, co=zero, ch4=zero, o2=o2)
    coldry, wkl, wbroad, pwvcm = L.inatm_lw(play, plev, tlay, vmr, grav,
                                            avogad)
    cs = L.setcoef_lw(play, tlay, tlev, tsfc, emis, coldry, wkl, wbroad)
    cs['pavel'] = play
    wx = {n: jnp.zeros_like(play) for n in ('ccl4', 'cfc11', 'cfc12',
                                            'cfc22')}
    taug, fracs = jax.jit(lambda c: L.taumol_lw(c, wx, dtype))(cs)
    heatfac = grav * 8.64e4 / (cpd * 1.0e2)
    cldfr = jnp.zeros((nz, ncol), dtype)
    taucld = jnp.zeros((nz, ncol, 16), dtype)

    import climt_tpu.components.rrtmg.lw_spectral as LS

    def run_rtrn():
        return L.rtrn_lw(taug, fracs, cs['planklay'], cs['planklev'],
                         cs['plankbnd'], emis, pwvcm, cldfr, taucld, plev,
                         heatfac, use_tables=False)

    for mode in ('off', 'on'):
        os.environ['CLIMT_TPU_PALLAS'] = '1' if mode == 'on' else '0'
        f = jax.jit(run_rtrn)
        out = f()
        t = bench(f)
        log('LW rtrn [pallas={}]: {:7.2f} ms  (flux_up[0,0]={:.4f})'.format(
            mode, t * 1e3, float(out[0][0, 0])))


if __name__ == '__main__':
    main()
