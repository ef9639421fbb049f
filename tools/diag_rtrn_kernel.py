"""Time the fused Pallas LW rtrn kernel at bench shapes on the TPU.

Round-4 kernel measured 57 ms; the round-5 rewrite (flat g layout, one
precompute phase, factored cloud exp) targets ~15 ms.
Run: python tools/diag_rtrn_kernel.py [clear|cloudy]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.time()


def log(msg):
    print('[{:6.1f}s] {}'.format(time.time() - t0, msg), flush=True)


def bench(fn, *args, repeats=10):
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

    from climt_tpu.components.rrtmg import lw_spectral as L

    cloudy = len(sys.argv) > 1 and sys.argv[1] == 'cloudy'
    f32 = jnp.float32
    nz, ncol = 60, 8192
    rng = np.random.RandomState(0)
    taug = jnp.asarray(rng.rand(nz, ncol, L.NGPT) * 2.0, f32)
    fracs = jnp.asarray(rng.rand(nz, ncol, L.NGPT), f32)
    planklay = jnp.asarray(rng.rand(nz, ncol, 16) * 0.2, f32)
    planklev = jnp.asarray(rng.rand(nz + 1, ncol, 16) * 0.2, f32)
    plankbnd = jnp.asarray(rng.rand(ncol, 16) * 0.2, f32)
    semiss = jnp.asarray(0.9 + 0.1 * rng.rand(16, ncol), f32)
    pwvcm = jnp.asarray(rng.rand(ncol) * 4, f32)
    if cloudy:
        cldfrac = jnp.asarray(
            (rng.rand(nz, ncol) > 0.5) * rng.rand(nz, ncol), f32)
        taucld = jnp.asarray(rng.rand(nz, ncol, 16) * 3.0, f32)
    else:
        cldfrac = jnp.zeros((nz, ncol), f32)
        taucld = jnp.zeros((nz, ncol, 16), f32)
    pz = jnp.asarray(np.linspace(1000., 1., nz + 1)[:, None]
                     * np.ones((1, ncol)), f32)
    heatfac = 9.80665 * 8.64e4 / (1004.64 * 1e2)

    os.environ['CLIMT_TPU_PALLAS'] = '1'

    @jax.jit
    def run():
        return L.rtrn_lw(taug, fracs, planklay, planklev, plankbnd,
                         semiss, pwvcm, cldfrac, taucld, pz, heatfac,
                         use_tables=False)

    out = run()
    log('compiled; flux_up[0,0]={:.4f} htr[0,0]={:.4f}'.format(
        float(out[0][0, 0]), float(out[2][0, 0])))
    t = bench(run)
    log('LW rtrn fused [{}]: {:7.2f} ms ({:.0f} col/s for rtrn alone)'
        .format('cloudy' if cloudy else 'clear', t * 1e3, ncol / t))


if __name__ == '__main__':
    main()
