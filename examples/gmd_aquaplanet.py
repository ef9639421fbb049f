"""Grey-radiation aquaplanet GCM with a slab ocean.

The climt_tpu analog of the reference's examples/gmd_aquaplanet.py
(BASELINE config 4): the spectral dynamical core wrapping grey longwave
radiation (radiation called through an UpdateFrequencyWrapper), simple
physics (TimeDifferencing-wrapped) and slab-surface heating, with NetCDF
output through a monitor.
"""

from datetime import timedelta

import numpy as np

import climt_tpu as ct
from climt_tpu.dycore.gfs import GFSDynamicalCore


def main(n_days=3, nx=64, ny=32, nz=15, dt_minutes=20,
         output_file=None, verbose=True):
    radiation = ct.UpdateFrequencyWrapper(
        ct.GrayLongwaveRadiation(), timedelta(hours=1))
    slab = ct.SlabSurface()
    simple_physics = ct.TimeDifferencingWrapper(ct.SimplePhysics())
    tau = ct.Frierson06LongwaveOpticalDepth(
        linear_optical_depth_parameter=0.2,
        longwave_optical_depth_at_equator=7.2,
        longwave_optical_depth_at_poles=1.8)

    dycore = GFSDynamicalCore(
        [simple_physics, radiation, slab],
        number_of_damped_levels=5, moist=True)

    grid = ct.get_grid(nx=nx, ny=ny, nz=nz)
    state = ct.get_default_state([dycore, tau], grid_state=grid)
    # aquaplanet: slab ocean everywhere, warm equator
    state['area_type'].values[:] = 'sea'
    lat = np.asarray(state['latitude'].values)
    state['surface_temperature'].values[:] = 300. - 38. * np.sin(
        np.deg2rad(lat)) ** 2
    rng = np.random.RandomState(7)
    state['air_temperature'].values[:] += 0.1 * rng.randn(
        *state['air_temperature'].shape)

    monitor = None
    if output_file:
        monitor = ct.NetCDFMonitor(
            output_file,
            store_names=['air_temperature', 'eastward_wind',
                         'surface_air_pressure', 'specific_humidity',
                         'surface_temperature'])

    timestep = timedelta(minutes=dt_minutes)
    n_steps = int(n_days * 86400 / timestep.total_seconds())
    for i in range(n_steps):
        state.update(tau(state))
        diagnostics, new_state = dycore(state, timestep)
        state.update(new_state)
        state.update(diagnostics)
        state['time'] += timestep
        if monitor is not None and i % 18 == 0:
            monitor.store(state)
        if verbose and i % (n_steps // 8 or 1) == 0:
            u = np.asarray(state['eastward_wind'].values)
            T = np.asarray(state['air_temperature'].values)
            q = np.asarray(state['specific_humidity'].values)
            print('day {:5.2f}  |u|max={:6.1f}  T=[{:5.1f},{:5.1f}]  '
                  'q_max={:5.2f} g/kg'.format(
                      i * dt_minutes / 1440, np.abs(u).max(),
                      T.min(), T.max(), q.max() * 1e3))
            assert not np.isnan(u).any()
    if monitor is not None:
        monitor.write()
    return state


if __name__ == '__main__':
    main(output_file='aquaplanet_output.nc')
