"""Held-Suarez dry GCM on the spectral dynamical core.

The climt_tpu analog of the reference's examples/held_suarez.py: the
GFSDynamicalCore wrapping the HeldSuarez forcing, integrated from a slightly
perturbed isothermal rest state until baroclinic eddies and the westerly
jets emerge.
"""

from datetime import timedelta

import numpy as np

import climt_tpu as ct
from climt_tpu.dycore.gfs import GFSDynamicalCore


def main(n_days=5, nx=128, ny=64, nz=20, dt_minutes=15, verbose=True):
    held_suarez = ct.HeldSuarez()
    dycore = GFSDynamicalCore([held_suarez], number_of_damped_levels=5,
                              moist=False)

    grid = ct.get_grid(nx=nx, ny=ny, nz=nz)
    state = ct.get_default_state([dycore], grid_state=grid)
    # break symmetry so the baroclinic instability can grow
    rng = np.random.RandomState(42)
    state['air_temperature'].values[:] += 0.1 * rng.randn(
        *state['air_temperature'].shape)

    timestep = timedelta(minutes=dt_minutes)
    n_steps = int(n_days * 86400 / timestep.total_seconds())
    for i in range(n_steps):
        diagnostics, new_state = dycore(state, timestep)
        state.update(new_state)
        state['time'] += timestep
        if verbose and i % (n_steps // 10 or 1) == 0:
            u = np.asarray(state['eastward_wind'].values)
            T = np.asarray(state['air_temperature'].values)
            ps = np.asarray(state['surface_air_pressure'].values)
            print('day {:6.2f}  u_max={:6.1f} m/s  T range=[{:6.1f},{:6.1f}]'
                  '  ps range=[{:8.0f},{:8.0f}]'.format(
                      i * dt_minutes / 60 / 24, np.abs(u).max(),
                      T.min(), T.max(), ps.min(), ps.max()))
            assert not np.isnan(u).any(), 'NaN in winds'
    return state


if __name__ == '__main__':
    main()
