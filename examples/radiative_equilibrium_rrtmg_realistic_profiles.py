"""RRTMG radiative equilibrium from observed thermodynamic/gas profiles.

The climt_tpu analog of the reference's
examples/radiative_equilibrium_rrtmg_realistic_profiles.py: the 60-level
column is initialized from the bundled observational profiles
(thermodynamic_profiles.npz: pressure/temperature; molecule_profiles.npz:
specific humidity, CO2, ozone) before relaxing under RRTMG LW+SW.
"""

import os
from datetime import timedelta

import numpy as np

import climt_tpu as ct

DATA_DIR = os.path.dirname(os.path.abspath(__file__))


def load_profiles(state):
    """Overwrite the default column with the observed 60-level profiles."""
    tp_profiles = np.load(os.path.join(DATA_DIR,
                                       'thermodynamic_profiles.npz'))
    mol_profiles = np.load(os.path.join(DATA_DIR, 'molecule_profiles.npz'))

    col = (slice(None), np.newaxis, np.newaxis)
    state['air_pressure'].values[:] = tp_profiles['air_pressure'][col]
    state['air_temperature'].values[:] = \
        tp_profiles['air_temperature'][col]
    state['air_pressure_on_interface_levels'].values[:] = \
        tp_profiles['interface_pressures'][col]
    state['specific_humidity'].values[:] = \
        mol_profiles['specific_humidity'][col] * 1e-3
    state['mole_fraction_of_carbon_dioxide_in_air'].values[:] = \
        mol_profiles['carbon_dioxide'][col]
    state['mole_fraction_of_ozone_in_air'].values[:] = \
        mol_profiles['ozone'][col]
    return state


def main(n_steps=2000, plot=False, verbose=True):
    rad_sw = ct.RRTMGShortwave()
    rad_lw = ct.RRTMGLongwave()
    time_stepper = ct.AdamsBashforth([rad_sw, rad_lw])
    timestep = timedelta(hours=3)

    grid = ct.get_grid(nx=1, ny=1, nz=60)
    state = ct.get_default_state([rad_sw, rad_lw], grid_state=grid)
    load_profiles(state)

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
            olr = np.asarray(state[
                'upwelling_longwave_flux_in_air'].values).ravel()[-1]
            print('step {:5d}  T_sfc_air={:6.1f} K  OLR={:7.2f} W/m^2'
                  .format(i, T[0], olr))
        state['time'] += timestep
    return state


if __name__ == '__main__':
    main(n_steps=100000, plot=True)
