"""Moist GCM with grey-gas radiation and Emanuel convection.

The climt_tpu analog of the reference's examples/grey_gcm.py: the spectral
dynamical core wrapping grey longwave radiation, Emanuel convection and
TimeDifferencing-wrapped SimplePhysics over a fixed equator-to-pole
surface-temperature profile.
"""

from datetime import timedelta

import numpy as np

import climt_tpu as ct


def main(n_steps=None, n_days=3, nx=128, ny=62, nz=28, dt_seconds=600,
         verbose=True):
    ct.set_constants_from_dict({
        'stellar_irradiance': {'value': 200, 'units': 'W m^-2'}})

    model_time_step = timedelta(seconds=dt_seconds)

    convection = ct.EmanuelConvection()
    simple_physics = ct.TimeDifferencingWrapper(ct.SimplePhysics())
    radiation = ct.GrayLongwaveRadiation()
    tau = ct.Frierson06LongwaveOpticalDepth()

    dycore = ct.GFSDynamicalCore(
        [simple_physics, radiation, convection],
        number_of_damped_levels=5)
    grid = ct.get_grid(nx=nx, ny=ny, nz=nz)

    state = ct.get_default_state([dycore, tau], grid_state=grid)

    latitudes = np.asarray(state['latitude'].values)
    temperature_equator, temperature_pole = 300., 240.
    state['surface_temperature'].values[:] = temperature_equator - (
        (temperature_equator - temperature_pole)
        * np.sin(np.radians(latitudes)) ** 2)
    rng = np.random.RandomState(0)
    state['eastward_wind'].values[:] = rng.randn(
        *state['eastward_wind'].shape)

    if n_steps is None:
        n_steps = int(n_days * 86400 / dt_seconds)
    for i in range(n_steps):
        state.update(tau(state))
        diag, new_state = dycore(state, model_time_step)
        state.update(new_state)
        state.update(diag)
        state['time'] += model_time_step
        if verbose and i % (n_steps // 10 or 1) == 0:
            u = np.asarray(state['eastward_wind'].values)
            T = np.asarray(state['air_temperature'].values)
            print('{}  |u|max={:6.1f} m/s  T=[{:5.1f},{:5.1f}] K'.format(
                state['time'], np.abs(u).max(), T.min(), T.max()))
            assert not np.isnan(u).any()
    return state


if __name__ == '__main__':
    main(n_days=1500)
