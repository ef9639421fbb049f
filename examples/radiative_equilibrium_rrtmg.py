"""Single-column radiative equilibrium with full RRTMG radiation.

The climt_tpu analog of the reference's examples/radiative_equilibrium_rrtmg.py:
the correlated-k longwave and shortwave schemes drive a 30-level column
toward radiative equilibrium under an AdamsBashforth stepper.
"""

from datetime import timedelta

import numpy as np

import climt_tpu as ct


def main(n_steps=2000, nz=30, plot=False, verbose=True):
    rad_sw = ct.RRTMGShortwave()
    rad_lw = ct.RRTMGLongwave()
    time_stepper = ct.AdamsBashforth([rad_sw, rad_lw])
    timestep = timedelta(hours=3)

    grid = ct.get_grid(nx=1, ny=1, nz=nz)
    state = ct.get_default_state([rad_sw, rad_lw], grid_state=grid)

    monitor = None
    if plot:
        def plot_function(fig, state):
            ax = fig.add_subplot(1, 2, 1)
            ax.plot(state['air_temperature_tendency_from_shortwave'
                          ].values.flatten(),
                    state['air_pressure'].values.flatten() / 100,
                    '-o', label='SW')
            ax.plot(state['air_temperature_tendency_from_longwave'
                          ].values.flatten(),
                    state['air_pressure'].values.flatten() / 100,
                    '-o', label='LW')
            ax.axes.invert_yaxis()
            ax.set_yscale('log')
            ax.set_ylim(1e3, 10.)
            ax.set_title('Heating Rates')
            ax.set_xlabel('K/day')
            ax.set_ylabel('millibar')
            ax.legend()
            ax = fig.add_subplot(1, 2, 2)
            ax.plot(state['air_temperature'].values.flatten(),
                    state['air_pressure'].values.flatten() / 100, '-o')
            ax.axes.invert_yaxis()
            ax.set_yscale('log')
            ax.set_ylim(1e3, 10.)
            ax.set_title('Temperature')
            ax.set_xlabel('K')
            fig.suptitle('Radiative Eq. with RRTMG')
        monitor = ct.PlotFunctionMonitor(plot_function)

    for i in range(n_steps):
        diagnostics, new_state = time_stepper(state, timestep)
        state.update(new_state)
        state.update(diagnostics)
        if monitor is not None and i % 2 == 0:
            monitor.store(state)
        if verbose and i % (n_steps // 10 or 1) == 0:
            T = np.asarray(state['air_temperature'].values).ravel()
            print('step {:5d}  T_sfc_air={:6.1f} K  T_top={:6.1f} K'
                  .format(i, T[0], T[-1]))
        state['time'] += timestep
    return state


if __name__ == '__main__':
    main(n_steps=100000, plot=True)
