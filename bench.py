"""Benchmark: Held-Suarez GCM throughput on the spectral dynamical core.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: grid-point-steps per second per chip at T42-equivalent resolution
(nlon=128, nlat=64, nz=28, dt=600 s) with the fused dynamics+physics step
(single jit, lax.scan).  The reference publishes no benchmark numbers
(BASELINE.md); ``vs_baseline`` is measured against a nominal 1e6
gridpoint-steps/s single-node figure for spectral cores of this size on CPU
(documented reference point, not a measured climt number).
"""

import json
import sys
import time

NOMINAL_BASELINE = 1.0e6  # gridpoint-steps/s, nominal single-node reference


def main():
    import jax
    import jax.numpy as jnp
    from climt_tpu.dycore.compiled import build_held_suarez_model

    nlon, nlat, nz = 128, 64, 28
    dycore, init_fn, step_fn, run_fn = build_held_suarez_model(
        nlon=nlon, nlat=nlat, nz=nz, timestep=600.0, dtype=jnp.float32)

    carry = init_fn()
    # warmup / compile
    carry = run_fn(carry, 10)
    jax.block_until_ready(carry[1]['T'])

    n_steps = 200
    t0 = time.perf_counter()
    carry = run_fn(carry, n_steps)
    jax.block_until_ready(carry[1]['T'])
    elapsed = time.perf_counter() - t0

    import numpy as np
    T_grid = np.asarray(dycore.sht.synthesize(carry[1]['T']))
    if np.isnan(T_grid).any():
        print(json.dumps({'metric': 'heldsuarez_T42_gridpoint_steps_per_s',
                          'value': 0.0, 'unit': 'gridpoint-steps/s',
                          'vs_baseline': 0.0, 'error': 'NaN in output'}))
        sys.exit(1)

    gridpoints = nlon * nlat * nz
    value = gridpoints * n_steps / elapsed
    print(json.dumps({
        'metric': 'heldsuarez_T42_gridpoint_steps_per_s',
        'value': round(value, 1),
        'unit': 'gridpoint-steps/s',
        'vs_baseline': round(value / NOMINAL_BASELINE, 3),
    }))


if __name__ == '__main__':
    main()
