"""Boundary-layer moistening of a single column by SimplePhysics.

The climt_tpu analog of the reference's examples/simple_physics_example.py:
a steady 10 m/s wind over the default ocean column drives surface fluxes
and PBL diffusion, moistening the lower troposphere.
"""

from datetime import timedelta

import numpy as np

import climt_tpu as ct


def main(n_steps=600, plot=False, verbose=True):
    simple_physics = ct.SimplePhysics()
    state = ct.get_default_state([simple_physics])
    state['eastward_wind'].values[:] = 10.
    timestep = timedelta(hours=1)

    monitor = None
    if plot:
        def plot_function(fig, state):
            ax = fig.add_subplot(1, 1, 1)
            ax.plot(state['specific_humidity'].values.flatten(),
                    state['air_pressure'].values.flatten(), '-o')
            ax.axes.invert_yaxis()
            ax.set_ylim(1e5, 100.)
            ax.set_xlabel('kg/kg')
            ax.set_ylabel('Pa')
            ax.set_title('Specific Humidity')
        monitor = ct.PlotFunctionMonitor(plot_function)

    for i in range(n_steps):
        diagnostics, new_state = simple_physics(state, timestep)
        if verbose and i % (n_steps // 10 or 1) == 0:
            print('SH Flux:', float(np.asarray(
                diagnostics['surface_upward_sensible_heat_flux'].values
            ).ravel()[0]))
            print('LH Flux:', float(np.asarray(
                diagnostics['surface_upward_latent_heat_flux'].values
            ).ravel()[0]))
        state.update(diagnostics)
        if monitor is not None:
            monitor.store(state)
        state.update(new_state)
        state['time'] += timestep
    return state


if __name__ == '__main__':
    main(plot=True)
