"""Single-column grey-gas radiative equilibrium.

The climt_tpu analog of the reference's examples/radiative_equilibrium.py:
a Frierson grey optical depth + grey longwave radiation column relaxing
toward radiative equilibrium under an AdamsBashforth stepper.
"""

from datetime import timedelta

import numpy as np

import climt_tpu as ct


def main(n_steps=200, nz=30, verbose=True):
    radiation = ct.GrayLongwaveRadiation()
    tau = ct.Frierson06LongwaveOpticalDepth()
    stepper = ct.AdamsBashforth([radiation])

    grid = ct.get_grid(nx=None, ny=None, nz=nz)
    state = ct.get_default_state([radiation, tau], grid_state=grid)
    timestep = timedelta(hours=4)

    for i in range(n_steps):
        state.update(tau(state))
        diagnostics, new_state = stepper(state, timestep)
        # new_state passes untouched quantities through (reference-parity
        # semantics), so apply it before the freshly computed diagnostics
        state.update(new_state)
        state.update(diagnostics)
        state['time'] += timestep
        if verbose and i % 50 == 0:
            T = np.asarray(state['air_temperature'].values).ravel()
            olr = np.asarray(
                state['upwelling_longwave_flux_in_air'].values).ravel()[-1]
            print('step {:4d}  T_sfc_air={:7.2f} K  T_top={:7.2f} K  '
                  'OLR={:7.2f} W/m^2'.format(i, T[0], T[-1], olr))
    return state


if __name__ == '__main__':
    main()
