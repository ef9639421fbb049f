"""Energy-balanced moist GCM with full RRTMG radiation.

The climt_tpu analog of the reference's
examples/full_radiation_gcm_energy_balanced.py (BASELINE config "full
radiation GCM"): the spectral dynamical core wrapping Emanuel convection,
TimeDifferencing-wrapped SimplePhysics, a slab ocean, and the correlated-k
RRTMG longwave and shortwave schemes called on a lagged hourly cadence
through UpdateFrequencyWrapper.  The zenith angle is fixed at the
latitude (annual-mean insolation geometry); the companion
full_radiation_with_insolation_gcm.py computes it astronomically.
"""

from datetime import timedelta

import numpy as np

import climt_tpu as ct


def main(n_steps=None, n_days=3, nx=128, ny=62, nz=28, dt_seconds=600,
         output_file=None, verbose=True):
    ct.set_constants_from_dict({
        'stellar_irradiance': {'value': 200, 'units': 'W m^-2'}})

    model_time_step = timedelta(seconds=dt_seconds)
    constant_duration = 6

    convection = ct.EmanuelConvection()
    simple_physics = ct.TimeDifferencingWrapper(ct.SimplePhysics())
    radiation_lw = ct.UpdateFrequencyWrapper(
        ct.RRTMGLongwave(), constant_duration * model_time_step)
    radiation_sw = ct.UpdateFrequencyWrapper(
        ct.RRTMGShortwave(), constant_duration * model_time_step)
    slab_surface = ct.SlabSurface()

    dycore = ct.GFSDynamicalCore(
        [simple_physics, slab_surface, radiation_sw, radiation_lw,
         convection], number_of_damped_levels=5)
    grid = ct.get_grid(nx=nx, ny=ny, nz=nz)

    state = ct.get_default_state([dycore], grid_state=grid)

    latitudes = np.asarray(state['latitude'].values)
    zenith_angle = np.radians(latitudes)
    state['zenith_angle'].values[:] = zenith_angle
    rng = np.random.RandomState(0)
    state['eastward_wind'].values[:] = rng.randn(
        *state['eastward_wind'].shape)
    state['ocean_mixed_layer_thickness'].values[:] = 50
    state['surface_temperature'].values[:] = \
        290 - (40 * np.sin(zenith_angle) ** 2)

    netcdf_monitor = None
    if output_file:
        fields_to_store = [
            'air_temperature', 'air_pressure', 'eastward_wind',
            'northward_wind', 'air_pressure_on_interface_levels',
            'surface_air_pressure', 'upwelling_longwave_flux_in_air',
            'specific_humidity', 'surface_temperature',
            'latitude', 'longitude']
        netcdf_monitor = ct.NetCDFMonitor(
            output_file, write_on_store=True,
            store_names=fields_to_store)

    if n_steps is None:
        n_steps = int(n_days * 86400 / dt_seconds)
    for i in range(n_steps):
        diag, new_state = dycore(state, model_time_step)
        state.update(new_state)
        state.update(diag)
        state['time'] += model_time_step

        if i % (6 * 24) == 0 and netcdf_monitor is not None:
            netcdf_monitor.store(state)
        if verbose and i % (n_steps // 10 or 1) == 0:
            print('{}  max zonal wind {:6.1f} m/s  max humidity '
                  '{:6.2f} g/kg  max surf temp {:6.1f} K'.format(
                      state['time'],
                      np.amax(state['eastward_wind'].values),
                      1e3 * np.amax(state['specific_humidity'].values),
                      np.amax(state['surface_temperature'].values)))
            assert not np.isnan(
                np.asarray(state['eastward_wind'].values)).any()
    return state


if __name__ == '__main__':
    main(n_days=1500, output_file='gcm_without_seasonal_cycle.nc')
