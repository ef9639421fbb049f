"""Full-radiation radiative-convective equilibrium column.

The climt_tpu analog of the reference's gmd_radiative_convective flow with
real radiation: RRTMG longwave + shortwave, Emanuel convection, simple
physics surface fluxes/boundary layer, and a slab surface.
"""

from datetime import timedelta

import numpy as np

import climt_tpu as ct


def main(n_steps=400, nz=28, verbose=True):
    lw = ct.RRTMGLongwave()
    sw = ct.RRTMGShortwave()
    convection = ct.EmanuelConvection()
    surface = ct.SlabSurface()
    simple_physics = ct.SimplePhysics()
    stepper = ct.AdamsBashforth([lw, sw, convection, surface])

    state = ct.get_default_state(
        [lw, sw, convection, surface, simple_physics],
        grid_state=ct.get_grid(nx=None, ny=None, nz=nz))
    state['zenith_angle'].values[:] = np.arccos(0.25)  # diurnal mean-ish
    state['surface_temperature'].values[:] = 300.
    state['eastward_wind'].values[:] = 5.0
    timestep = timedelta(minutes=20)

    for i in range(n_steps):
        diagnostics, new_state = stepper(state, timestep)
        state.update(new_state)
        state.update(diagnostics)
        diagnostics, new_state = simple_physics(state, timestep)
        state.update(new_state)
        state.update(diagnostics)
        state['time'] += timestep
        if verbose and i % (n_steps // 8 or 1) == 0:
            T = np.asarray(state['air_temperature'].values).ravel()
            olr = np.ravel(
                state['upwelling_longwave_flux_in_air'].values)[-1]
            asr = (np.ravel(
                state['downwelling_shortwave_flux_in_air'].values)[-1]
                - np.ravel(
                    state['upwelling_shortwave_flux_in_air'].values)[-1])
            precip = np.ravel(
                state['convective_precipitation_rate'].values)[0]
            Ts = np.ravel(state['surface_temperature'].values)[0]
            print('hour {:6.1f}  Ts={:6.2f}  T0={:6.2f}  OLR={:6.1f} '
                  ' ASR={:6.1f}  conv precip={:6.2f} mm/day'.format(
                      i / 3., Ts, T[0], olr, asr, precip))
            assert not np.isnan(T).any()
    return state


if __name__ == '__main__':
    main()
