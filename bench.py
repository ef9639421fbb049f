"""Benchmark: moist GCM throughput on the spectral dynamical core.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline metric (BASELINE.md north star): grid-point-steps per second per
chip for the FULL moist GCM (spectral dynamics + RRTMG-interface radiation
+ Emanuel convection + surface/PBL physics + slab ocean) at T85-equivalent
resolution (nlon=256, nlat=128, nz=28, dt=600 s), one fused jit.

The reference publishes no benchmark numbers (BASELINE.md); ``vs_baseline``
is measured against a nominal 1e6 gridpoint-steps/s single-node figure for
full-physics spectral GCMs of this size on CPU (a documented reference
point, not a measured climt number).  A secondary Held-Suarez T42 number is
included in the same JSON object.
"""

import json
import sys
import time

NOMINAL_BASELINE = 1.0e6  # gridpoint-steps/s, nominal single-node reference


def measure(build, n_warmup, n_steps, gridpoints):
    import jax
    carry = build[1]()
    run_fn = build[3]
    # warm up with the SAME static n_steps so the timed call reuses the
    # compiled scan (a different length would recompile inside the timing)
    out = run_fn(carry, n_steps)
    carry = out[0] if isinstance(out, tuple) and len(out) == 2 else out
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    t0 = time.perf_counter()
    out = run_fn(carry, n_steps)
    carry = out[0] if isinstance(out, tuple) and len(out) == 2 else out
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    elapsed = time.perf_counter() - t0
    return carry, gridpoints * n_steps / elapsed


def main():
    import jax.numpy as jnp
    import numpy as np
    from climt_tpu.dycore.compiled import build_held_suarez_model
    from climt_tpu.dycore.moist_gcm import build_moist_gcm

    # headline: T85 moist GCM
    nlon, nlat, nz = 256, 128, 28
    moist = build_moist_gcm(nlon=nlon, nlat=nlat, nz=nz, timestep=600.0,
                            dtype=jnp.float32)
    carry, moist_rate = measure(moist, 5, 50, nlon * nlat * nz)
    T = np.asarray(moist[0].sht.synthesize(carry[1]['T']))
    if np.isnan(T).any():
        print(json.dumps({
            'metric': 'moist_gcm_T85_gridpoint_steps_per_s',
            'value': 0.0, 'unit': 'gridpoint-steps/s',
            'vs_baseline': 0.0, 'error': 'NaN in output'}))
        sys.exit(1)

    # secondary: Held-Suarez T42 dry dynamical core
    hs = build_held_suarez_model(nlon=128, nlat=64, nz=28,
                                 timestep=600.0, dtype=jnp.float32)
    _, hs_rate = measure(hs, 10, 200, 128 * 64 * 28)

    print(json.dumps({
        'metric': 'moist_gcm_T85_gridpoint_steps_per_s',
        'value': round(moist_rate, 1),
        'unit': 'gridpoint-steps/s',
        'vs_baseline': round(moist_rate / NOMINAL_BASELINE, 3),
        'secondary_heldsuarez_T42_gridpoint_steps_per_s':
            round(hs_rate, 1),
    }))


if __name__ == '__main__':
    main()
