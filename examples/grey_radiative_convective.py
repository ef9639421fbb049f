"""Grey-gas radiative-convective column with a slab surface.

The climt_tpu analog of the reference's gmd_radiative_convective flow:
grey longwave radiation + slab surface (AB stepper) with time-split
grid-scale condensation and dry convective adjustment.
"""

from datetime import timedelta

import numpy as np

import climt_tpu as ct


def main(n_steps=100, nz=30, verbose=True):
    radiation = ct.GrayLongwaveRadiation()
    surface = ct.SlabSurface()
    tau = ct.Frierson06LongwaveOpticalDepth()
    convection = ct.DryConvectiveAdjustment()
    condensation = ct.GridScaleCondensation()
    stepper = ct.AdamsBashforth([radiation, surface])

    grid = ct.get_grid(nx=None, ny=None, nz=nz)
    state = ct.get_default_state(
        [radiation, tau, surface, convection, condensation],
        grid_state=grid)
    timestep = timedelta(hours=2)

    for i in range(n_steps):
        state.update(tau(state))
        diagnostics, new_state = stepper(state, timestep)
        state.update(new_state)
        state.update(diagnostics)
        diag, new_state = convection(state, timestep)
        state.update(new_state)
        diag, new_state = condensation(state, timestep)
        state.update(new_state)
        state.update(diag)
        state['time'] += timestep
        if verbose and i % 25 == 0:
            T = np.asarray(state['air_temperature'].values).ravel()
            Ts = np.asarray(state['surface_temperature'].values).ravel()[0]
            print('step {:4d}  T_s={:7.2f} K  T_air[0]={:7.2f} K  '
                  'T_top={:7.2f} K'.format(i, Ts, T[0], T[-1]))
    return state


if __name__ == '__main__':
    main()
