"""Phase attribution for the T85 moist step (round 5).

Times, at bench shapes on the real chip:
- the full fused step (rad_every=6),
- a no-radiation variant (rad_every huge): isolates radiation,
- the dry Held-Suarez dycore scaled to T85: isolates the dynamics,
- emanuel_convect standalone at T85 column count,
- simple_physics + condensation standalone.

Run: python tools/profile_moist_phases.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.time()


def log(msg):
    print('[{:7.1f}s] {}'.format(time.time() - t0, msg), flush=True)


def bench_fn(fn, *args, repeats=3):
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

    nlon, nlat, nz = 256, 128, 28
    gp = nlon * nlat * nz

    from climt_tpu.dycore.moist_gcm import build_moist_gcm

    for label, rad_every in (('rad_every=6', 6), ('no radiation', 10 ** 6)):
        moist = build_moist_gcm(nlon=nlon, nlat=nlat, nz=nz,
                                timestep=600.0, dtype=jnp.float32,
                                rad_every=rad_every, rad_col_chunk=8192)
        carry = moist[1]()
        n = 12
        t = bench_fn(moist[3], carry, n, repeats=2)
        log('moist [{}]: {:6.1f} ms/step  ({:.3g} gps/s)'.format(
            label, t / n * 1e3, gp * n / t))

    # Emanuel standalone at T85 shapes
    from climt_tpu.components.emanuel_convection import emanuel_convect
    rng = np.random.RandomState(0)
    ncol = nlon * nlat
    f32 = jnp.float32
    p_sfc = 1000.0
    ph1 = np.linspace(p_sfc, 20.0, nz + 1)
    p1 = 0.5 * (ph1[:-1] + ph1[1:])
    T = jnp.asarray(np.maximum(300.0 - 60.0 * (1 - p1 / p_sfc) / 0.8,
                               200.0)[:, None]
                    + rng.randn(nz, ncol), f32)
    q = jnp.asarray(0.016 * (p1 / p_sfc)[:, None] ** 3
                    * (1 + 0.1 * rng.rand(nz, ncol)), f32)
    import climt_tpu.core.util as util
    qs = jnp.asarray(np.asarray(q) * 1.3, f32)
    u = jnp.asarray(10.0 * rng.randn(nz, ncol), f32)
    v = jnp.asarray(10.0 * rng.randn(nz, ncol), f32)
    p = jnp.asarray(np.repeat(p1[:, None], ncol, 1), f32)
    ph = jnp.asarray(np.repeat(ph1[:, None], ncol, 1), f32)
    cbmf = jnp.zeros((ncol,), f32)
    params = dict(
        minorig=0, elcrit=0.0011, tlcrit=-55.0, entp=1.5, sigd=0.05,
        sigs=0.12, omtrain=50.0, omtsnow=5.5, coeffr=1.0, coeffs=0.8,
        cu=0.7, beta=10.0, dtmax=0.9, alpha=0.1, damp=0.1, delt0=300.0,
        g=9.80665, cpd=1004.64, cpv=1846.0, rd=287.0, rv=461.5,
        lv0=2.501e6, rowl=1000.0, cl=2500.0)

    # emanuel_convect takes (ncol, nz) column-major arrays, p in hPa
    # (dycore/moist_gcm.py:235-237)
    fn = jax.jit(lambda T, q, qs, u, v, cbmf: emanuel_convect(
        T.T, q.T, qs.T, u.T, v.T, p.T, ph.T, cbmf, 600.0, nz - 3,
        params))
    t = bench_fn(fn, T, q, qs, u, v, cbmf)
    log('emanuel standalone: {:6.1f} ms/step-equiv'.format(t * 1e3))

    # dry spectral dycore at the same resolution (dynamics-only cost)
    from climt_tpu.dycore.compiled import build_held_suarez_model
    hs = build_held_suarez_model(nlon=nlon, nlat=nlat, nz=nz,
                                 timestep=600.0, dtype=jnp.float32)
    carry = hs[1]()
    n = 50
    t = bench_fn(hs[3], carry, n, repeats=2)
    log('HS dycore at {}x{}: {:6.1f} ms/step'.format(
        nlon, nlat, t / n * 1e3))


if __name__ == '__main__':
    main()
