"""Cloud radiative effect on RRTMG heating rates (McICA).

The climt_tpu analog of the reference's
examples/radiative_heating_rrtmg_clouds.py: an ice cloud of varying area
fraction between 10 and 15 km perturbs the McICA longwave and shortwave
heating-rate profiles of the default column.
"""

import numpy as np

import climt_tpu as ct


def main(area_fractions=(0., 0.25, 0.5, 0.75, 1.0), plot=False,
         verbose=True):
    rad_sw = ct.RRTMGShortwave(mcica=True)
    state_sw = ct.get_default_state([rad_sw])

    rad_lw = ct.RRTMGLongwave(mcica=True)
    state_lw = ct.get_default_state([rad_lw])

    p = np.asarray(state_lw['air_pressure'].values)
    p_interface = np.asarray(
        state_lw['air_pressure_on_interface_levels'].values)
    T = np.asarray(state_lw['air_temperature'].values)
    R = ct.get_constant('gas_constant_of_dry_air', 'J kg^-1 K^-1')
    g = ct.get_constant('gravitational_acceleration', 'm s^-2')
    density = p / (R * T)
    dz = -np.diff(p_interface, axis=0) / (density * g)       # [m]
    z = np.cumsum(dz.ravel()) * 1e-3                         # [km]
    ice_density = 0.5e-3                                     # [kg m^-3]
    cloud_base, cloud_top = 10., 15.                         # [km]
    cloud_loc = (z > cloud_base) & (z < cloud_top)

    results = []
    for area_fraction in area_fractions:
        # in-cloud ice water path per layer (g/m^2), zero outside
        mass_ice = np.where(cloud_loc, area_fraction * ice_density
                            * dz.ravel() * 1e3, 0.0)
        cf = np.where(cloud_loc, area_fraction, 0.0)
        for state in (state_sw, state_lw):
            iwc = state['mass_content_of_cloud_ice_in_atmosphere_layer']
            iwc.values[:] = mass_ice.reshape(iwc.shape)
            caf = state['cloud_area_fraction_in_atmosphere_layer']
            caf.values[:] = cf.reshape(caf.shape)
        sw_heating = np.asarray(rad_sw(state_sw)[1][
            'air_temperature_tendency_from_shortwave'].values).ravel()
        lw_heating = np.asarray(rad_lw(state_lw)[1][
            'air_temperature_tendency_from_longwave'].values).ravel()
        results.append((area_fraction, sw_heating, lw_heating))
        if verbose:
            in_cloud = cloud_loc
            print('area fraction {:4.0%}: SW heating in cloud '
                  '[{:+6.2f},{:+6.2f}] K/day, LW [{:+6.2f},{:+6.2f}]'
                  .format(area_fraction,
                          sw_heating[in_cloud].min(),
                          sw_heating[in_cloud].max(),
                          lw_heating[in_cloud].min(),
                          lw_heating[in_cloud].max()))

    if plot:
        import matplotlib.pyplot as plt
        for i, (af, sw_h, lw_h) in enumerate(results):
            plt.plot(sw_h, z, label='SW, area fraction {:.0%}'.format(af))
            plt.plot(lw_h, z, ls='--',
                     label='LW' if i == 0 else None)
        plt.axhspan(cloud_base, cloud_top, color='gray', alpha=0.5,
                    label='cloud location')
        plt.ylabel('Altitude [km]')
        plt.xlabel('Heating rate [K/day]')
        plt.legend()
        plt.show()
    return results


if __name__ == '__main__':
    main(plot=True)
