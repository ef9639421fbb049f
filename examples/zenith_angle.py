"""Astronomical zenith angle over a lat-lon grid.

The climt_tpu analog of the reference's examples/zenith_angle.py: the
Instellation diagnostic computes the solar zenith angle on a regular
100x100 grid as model time advances in 6-hour steps.
"""

from datetime import timedelta

import numpy as np

import climt_tpu as ct


def main(n_steps=8, nx=100, ny=100, plot=False, verbose=True):
    instellation = ct.Instellation()
    state = ct.get_default_state(
        [instellation],
        grid_state=ct.get_grid(nx=nx, ny=ny, latitude_grid='regular'))
    timestep = timedelta(hours=6)

    monitor = None
    if plot:
        def plot_function(fig, state):
            ax = fig.add_subplot(1, 1, 1)
            ax.contourf(state['longitude'], state['latitude'],
                        state['zenith_angle'])
            ax.set_xlabel('Longitude')
            ax.set_ylabel('Latitude')
            fig.suptitle('Zenith Angle at time: ' + str(state['time']))
        monitor = ct.PlotFunctionMonitor(plot_function)

    for i in range(n_steps):
        diag = instellation(state)
        state.update(diag)
        if monitor is not None:
            monitor.store(state)
        if verbose:
            za = np.asarray(state['zenith_angle'].values)
            print('{}  zenith angle range [{:5.2f}, {:5.2f}] rad'.format(
                state['time'], za.min(), za.max()))
        state['time'] += timestep
    return state


if __name__ == '__main__':
    main(n_steps=100, plot=True)
