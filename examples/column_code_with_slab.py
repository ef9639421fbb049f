"""Radiative-convective column over a slab ocean with full RRTMG.

The climt_tpu analog of the reference's examples/column_code_with_slab.py:
Emanuel convection, RRTMG LW+SW and a slab surface step together under
AdamsBashforth while SimplePhysics supplies surface fluxes and boundary-
layer mixing (time-split).
"""

from datetime import timedelta

import numpy as np

import climt_tpu as ct


def main(n_steps=600, plot=False, verbose=True):
    timestep = timedelta(minutes=10)

    convection = ct.EmanuelConvection()
    radiation_sw = ct.RRTMGShortwave()
    radiation_lw = ct.RRTMGLongwave()
    slab = ct.SlabSurface()
    simple_physics = ct.SimplePhysics()
    dry_convection = ct.DryConvectiveAdjustment()

    state = ct.get_default_state(
        [simple_physics, convection, dry_convection,
         radiation_lw, radiation_sw, slab])

    state['air_temperature'].values[:] = 290
    state['surface_albedo_for_direct_shortwave'].values[:] = 0.4
    state['surface_albedo_for_direct_near_infrared'].values[:] = 0.4
    state['surface_albedo_for_diffuse_shortwave'].values[:] = 0.4

    # Set cloud water/fraction on some mid levels to see how clouds
    # change the radiative balance!
    # state['mass_content_of_cloud_liquid_water_in_atmosphere_layer'
    #       ].values[4:8] = 0.03
    # state['cloud_area_fraction_in_atmosphere_layer'].values[4:8] = 1.

    state['zenith_angle'].values[:] = np.pi / 2.5
    state['surface_temperature'].values[:] = 300.
    state['ocean_mixed_layer_thickness'].values[:] = 5
    state['area_type'].values[:] = 'sea'

    monitor = None
    if plot:
        def plot_function(fig, state):
            ax = fig.add_subplot(2, 2, 1)
            ax.plot(state['air_temperature_tendency_from_convection'
                          ].to_units('degK day^-1').values.flatten(),
                    state['air_pressure'].to_units('mbar'
                                                   ).values.flatten(),
                    '-o')
            ax.set_title('Conv. heating rate')
            ax.set_xlabel('K/day')
            ax.set_ylabel('millibar')
            ax.grid()
            ax.axes.invert_yaxis()
            ax = fig.add_subplot(2, 2, 2)
            ax.plot(state['air_temperature'].values.flatten(),
                    state['air_pressure'].to_units('mbar'
                                                   ).values.flatten(),
                    '-o')
            ax.set_title('Air temperature')
            ax.axes.invert_yaxis()
            ax.set_xlabel('K')
            ax.grid()
            ax = fig.add_subplot(2, 2, 3)
            ax.plot(state['air_temperature_tendency_from_longwave'
                          ].values.flatten(),
                    state['air_pressure'].to_units('mbar'
                                                   ).values.flatten(),
                    '-o', label='LW')
            ax.plot(state['air_temperature_tendency_from_shortwave'
                          ].values.flatten(),
                    state['air_pressure'].to_units('mbar'
                                                   ).values.flatten(),
                    '-o', label='SW')
            ax.set_title('LW and SW Heating rates')
            ax.legend()
            ax.axes.invert_yaxis()
            ax.set_xlabel('K/day')
            ax.grid()
            ax.set_ylabel('millibar')
            ax = fig.add_subplot(2, 2, 4)
            net_flux = (state['upwelling_longwave_flux_in_air'].values
                        + state['upwelling_shortwave_flux_in_air'].values
                        - state['downwelling_longwave_flux_in_air'].values
                        - state['downwelling_shortwave_flux_in_air'
                                ].values)
            ax.plot(net_flux.flatten(),
                    state['air_pressure_on_interface_levels'
                          ].to_units('mbar').values.flatten(), '-o')
            ax.set_title('Net Flux')
            ax.axes.invert_yaxis()
            ax.set_xlabel('W/m^2')
            ax.grid()
        monitor = ct.PlotFunctionMonitor(plot_function)

    time_stepper = ct.AdamsBashforth(
        [convection, radiation_lw, radiation_sw, slab])

    for i in range(n_steps):
        diagnostics, new_state = time_stepper(state, timestep)
        state.update(new_state)
        state.update(diagnostics)

        diagnostics, new_state = simple_physics(state, timestep)
        state.update(diagnostics)

        if (i + 1) % 100 == 0:
            if verbose:
                print('Surface Temperature: ', float(np.asarray(
                    state['surface_temperature'].values).ravel()[0]))
            if monitor is not None:
                monitor.store(state)
        state.update(new_state)
        ew = state['eastward_wind']
        ew.values = np.full(ew.shape, 3.)
        state['time'] += timestep
    return state


if __name__ == '__main__':
    main(n_steps=60000, plot=True)
