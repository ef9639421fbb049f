"""Radiative-convective equilibrium column (GMD paper configuration).

The climt_tpu analog of the reference's examples/gmd_radiative_convective.py:
an initially isothermal 270 K ocean column with Emanuel convection, full
RRTMG radiation and a slab surface, plus time-split SimplePhysics surface
fluxes, integrated toward radiative-convective equilibrium.  Optionally
streams selected quantities to a NetCDF file.
"""

from datetime import timedelta

import numpy as np

import climt_tpu as ct


def main(n_steps=20000, output_file=None, verbose=True):
    timestep = timedelta(minutes=5)

    convection = ct.EmanuelConvection()
    radiation_sw = ct.RRTMGShortwave()
    radiation_lw = ct.RRTMGLongwave()
    slab = ct.SlabSurface()
    simple_physics = ct.SimplePhysics()

    netcdf_monitor = None
    if output_file:
        store_quantities = [
            'air_temperature', 'air_pressure', 'specific_humidity',
            'air_pressure_on_interface_levels',
            'air_temperature_tendency_from_convection',
            'air_temperature_tendency_from_longwave',
            'air_temperature_tendency_from_shortwave']
        netcdf_monitor = ct.NetCDFMonitor(
            output_file, store_names=store_quantities,
            write_on_store=True)

    state = ct.get_default_state(
        [simple_physics, convection, radiation_lw, radiation_sw, slab])

    state['air_temperature'].values[:] = 270
    state['surface_albedo_for_direct_shortwave'].values[:] = 0.5
    state['surface_albedo_for_direct_near_infrared'].values[:] = 0.5
    state['surface_albedo_for_diffuse_shortwave'].values[:] = 0.5
    state['zenith_angle'].values[:] = np.pi / 2.5
    state['surface_temperature'].values[:] = 300.
    state['ocean_mixed_layer_thickness'].values[:] = 5
    state['area_type'].values[:] = 'sea'

    time_stepper = ct.AdamsBashforth(
        [convection, radiation_lw, radiation_sw, slab])

    for i in range(n_steps):
        diagnostics, new_state = time_stepper(state, timestep)
        state.update(new_state)
        state.update(diagnostics)
        diagnostics, new_state = simple_physics(state, timestep)
        state.update(diagnostics)
        if (i + 1) % 20 == 0:
            if netcdf_monitor is not None:
                netcdf_monitor.store(state)
            if verbose:
                print(i, float(np.asarray(
                    state['surface_temperature'].values).ravel()[0]))
        state.update(new_state)
        state['time'] += timestep
        ew = state['eastward_wind']
        ew.values = np.full(ew.shape, 3.)
    return state


if __name__ == '__main__':
    main(output_file='rad_conv_eq.nc')
