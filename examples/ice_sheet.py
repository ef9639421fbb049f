"""Snow/sea-ice column energy balance with the IceSheet stepper.

The climt_tpu analog of the reference's examples/ice_sheet.py: a 5 m
sea-ice slab under 4 m of snow, cooled from above, evolving its internal
temperature profile and thickness via the implicit Crank-Nicolson solve.
"""

from datetime import timedelta

import numpy as np

import climt_tpu as ct


def main(n_steps=3000, plot=False, verbose=True):
    ice = ct.IceSheet(maximum_snow_ice_height=30.)

    state = ct.get_default_state([ice])
    state['area_type'].values[:] = 'sea_ice'
    state['sea_ice_thickness'].values[:] = 5.
    state['surface_snow_thickness'].values[:] = 4.
    state['surface_temperature'].values[:] = 260.
    state['surface_upward_sensible_heat_flux'].values[:] = -0.5

    monitor = None
    if plot:
        def plot_function(fig, model_state):
            ax = fig.add_subplot(1, 1, 1)
            ax.plot(
                model_state['snow_and_ice_temperature'].values.squeeze(),
                model_state['height_on_ice_interface_levels'
                            ].values.squeeze(), 'o-')
            ax.set_title('Evolution of Temperature in Ice-Snow layers')
            ax.axhline(float(np.asarray(
                state['sea_ice_thickness'].values).ravel()[0]),
                linestyle='--', label='ice-snow interface')
            ax.set_ylabel('model levels')
            ax.set_xlabel('Kelvin')
            ax.legend()
        monitor = ct.PlotFunctionMonitor(plot_function)

    for i in range(n_steps):
        diag, out = ice(state, timedelta(minutes=100))
        if verbose and i % (n_steps // 10 or 1) == 0:
            print('Surface Temperature: ', float(np.asarray(
                out['surface_temperature'].values).ravel()[0]))
            print('Sea Ice thickness: ', float(np.asarray(
                state['sea_ice_thickness'].values).ravel()[0]))
            print('--------------------------')
        state.update(diag)
        state.update(out)
        if monitor is not None:
            monitor.store(state)
        state['time'] += timedelta(minutes=100)
    return state


if __name__ == '__main__':
    main(plot=True)
