"""DCMIP baroclinic-wave test on the dry spectral dynamical core.

The climt_tpu analog of the reference's examples/baroclinic_wave.py: the
Jablonowski-Williamson balanced initial state with an added perturbation
(DcmipInitialConditions) develops a growing baroclinic wave in the
northern mid-latitudes over ~10 days.
"""

from datetime import timedelta

import numpy as np

import climt_tpu as ct


def main(n_steps=1000, nx=128, ny=64, nz=20, dt_minutes=10, plot=False,
         verbose=True):
    ct.set_constant('reference_air_pressure', value=1e5, units='Pa')
    dycore = ct.GFSDynamicalCore(moist=False)
    dcmip = ct.DcmipInitialConditions(add_perturbation=True)

    grid = ct.get_grid(nx=nx, ny=ny, nz=nz)
    state = ct.get_default_state([dycore], grid_state=grid)
    state.update(dcmip(state))

    timestep = timedelta(minutes=dt_minutes)

    monitor = None
    if plot:
        def plot_function(fig, state):
            ax = fig.add_subplot(1, 1, 1)
            cs = ax.contourf(state['longitude'], state['latitude'],
                             state['surface_air_pressure'].to_units(
                                 'mbar'))
            fig.colorbar(cs)
            ax.set_title('Surface Pressure at: ' + str(state['time']))
        monitor = ct.PlotFunctionMonitor(plot_function)

    for i in range(n_steps):
        diag, output = dycore(state, timestep)
        if monitor is not None:
            monitor.store(state)
        state.update(output)
        state.update(diag)
        state['time'] += timestep
        if verbose and i % (n_steps // 10 or 1) == 0:
            ps = np.asarray(state['surface_air_pressure'].values)
            u = np.asarray(state['eastward_wind'].values)
            print('{}  ps=[{:8.1f},{:8.1f}] Pa  |u|max={:6.1f} m/s'
                  .format(state['time'], ps.min(), ps.max(),
                          np.abs(u).max()))
            assert not np.isnan(ps).any()
    return state


if __name__ == '__main__':
    main(plot=True)
