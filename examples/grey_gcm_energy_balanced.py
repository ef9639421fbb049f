"""Energy-balanced grey-radiation GCM with a slab ocean.

The climt_tpu analog of the reference's examples/grey_gcm_energy_balanced.py:
the spectral core wraps grey longwave radiation, Emanuel convection,
TimeDifferencing-wrapped SimplePhysics and a slab surface heated by a
prescribed equator-to-pole shortwave flux profile, so the surface
temperature is interactive and the global energy budget closes.
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
    slab_surface = ct.SlabSurface()
    tau = ct.Frierson06LongwaveOpticalDepth()

    dycore = ct.GFSDynamicalCore(
        [simple_physics, radiation, slab_surface, convection],
        number_of_damped_levels=5)
    grid = ct.get_grid(nx=nx, ny=ny, nz=nz)

    state = ct.get_default_state([dycore, tau], grid_state=grid)

    latitudes = np.asarray(state['latitude'].values)
    sw_flux_equator, sw_flux_pole = 300., 0.
    state['downwelling_shortwave_flux_in_air'].values[:] = (
        sw_flux_equator - (sw_flux_equator - sw_flux_pole)
        * np.sin(np.radians(latitudes)) ** 2)[np.newaxis]
    state['surface_temperature'].values[:] = 290.
    state['ocean_mixed_layer_thickness'].values[:] = 5
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
            Ts = np.asarray(state['surface_temperature'].values)
            print('{}  |u|max={:6.1f} m/s  Ts=[{:5.1f},{:5.1f}] K'.format(
                state['time'], np.abs(u).max(), Ts.min(), Ts.max()))
            assert not np.isnan(u).any()
    return state


if __name__ == '__main__':
    main(n_days=1500)
