"""Moist RRTMG GCM with astronomically computed insolation.

The climt_tpu analog of the reference's
examples/full_radiation_with_insolation_gcm.py: identical to
full_radiation_gcm_energy_balanced.py except the zenith angle is updated
every step by the Instellation diagnostic (diurnal + seasonal cycle) and
the slab ocean is shallow (1 m) so the surface responds quickly.
"""

from datetime import timedelta

import numpy as np

import climt_tpu as ct


def main(n_steps=None, n_days=3, nx=128, ny=62, nz=28, dt_seconds=600,
         verbose=True):
    ct.set_constants_from_dict({
        'stellar_irradiance': {'value': 1200, 'units': 'W m^-2'}})

    model_time_step = timedelta(seconds=dt_seconds)
    constant_duration = 6

    convection = ct.EmanuelConvection()
    simple_physics = ct.TimeDifferencingWrapper(ct.SimplePhysics())
    radiation_lw = ct.UpdateFrequencyWrapper(
        ct.RRTMGLongwave(), constant_duration * model_time_step)
    radiation_sw = ct.UpdateFrequencyWrapper(
        ct.RRTMGShortwave(), constant_duration * model_time_step)
    slab_surface = ct.SlabSurface()
    insolation = ct.Instellation()

    dycore = ct.GFSDynamicalCore(
        [simple_physics, slab_surface, radiation_sw, radiation_lw,
         convection], number_of_damped_levels=5)
    grid = ct.get_grid(nx=nx, ny=ny, nz=nz)

    state = ct.get_default_state([dycore, insolation], grid_state=grid)

    latitudes = np.asarray(state['latitude'].values)
    rng = np.random.RandomState(0)
    state['eastward_wind'].values[:] = rng.randn(
        *state['eastward_wind'].shape)
    state['ocean_mixed_layer_thickness'].values[:] = 1
    state['surface_temperature'].values[:] = \
        290 - (40 * np.sin(np.radians(latitudes)) ** 2)

    if n_steps is None:
        n_steps = int(n_days * 86400 / dt_seconds)
    for i in range(n_steps):
        diagnostics = insolation(state)
        state.update(diagnostics)
        diag, new_state = dycore(state, model_time_step)
        state.update(new_state)
        state.update(diag)
        state['time'] += model_time_step
        if verbose and i % (n_steps // 10 or 1) == 0:
            Ts = np.asarray(state['surface_temperature'].values)
            za = np.asarray(state['zenith_angle'].values)
            print('{}  Ts=[{:5.1f},{:5.1f}] K  cos(zen) max={:5.2f}'
                  .format(state['time'], Ts.min(), Ts.max(),
                          np.cos(za).max()))
            assert not np.isnan(Ts).any()
    return state


if __name__ == '__main__':
    main(n_days=1500)
