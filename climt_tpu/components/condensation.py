"""Grid-scale condensation of supersaturated water.

Behavioral parity with
/root/reference/climt/_components/grid_scale_condensation.py:6-109: condense
q > q_sat with the latent-heat feedback factor 1/(1 + L/Cp dqsat/dT); all
condensate falls immediately as precipitation (vertical mass integral).
Branchless ``jnp.where`` formulation — fully vectorized over (level, column).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.base_components import Stepper, timestep_seconds
from ..core.constants import get_constant
from ..core.util import bolton_dqsat_dT, bolton_q_sat


@jax.jit
def condense(T, q, p, p_interface, cpd, lv, rd, rh2o, g, rhow):
    q_sat = bolton_q_sat(T, p, rd, rh2o)
    dqsat_dT = bolton_dqsat_dT(T, lv, rh2o, q_sat)
    condensed = jnp.where(
        q > q_sat,
        (q - q_sat) / (1.0 + (lv / cpd) * dqsat_dT),
        0.0)
    new_q = q - condensed
    new_T = T + (lv / cpd) * condensed
    # liquid-water-equivalent precipitation depth per layer: dp/(g rho_w)
    mass = (p_interface[1:] - p_interface[:-1]) / (g * rhow)
    precipitation = jnp.sum(condensed * mass, axis=0)
    return new_T, new_q, precipitation


class GridScaleCondensation(Stepper):
    """Condense supersaturated water at the grid scale."""

    input_properties = {
        'air_temperature': {'dims': ['mid_levels', '*'], 'units': 'degK'},
        'specific_humidity': {'dims': ['mid_levels', '*'], 'units': 'kg/kg'},
        'air_pressure': {'dims': ['mid_levels', '*'], 'units': 'Pa'},
        'air_pressure_on_interface_levels': {
            'dims': ['interface_levels', '*'], 'units': 'Pa'},
    }

    diagnostic_properties = {
        'precipitation_amount': {'dims': ['*'], 'units': 'kg m^-2'},
    }

    output_properties = {
        'air_temperature': {'units': 'degK'},
        'specific_humidity': {'units': 'kg/kg'},
    }

    def array_call(self, raw_state, timestep):
        new_T, new_q, precipitation = condense(
            jnp.asarray(raw_state['air_temperature']),
            jnp.asarray(raw_state['specific_humidity']),
            jnp.asarray(raw_state['air_pressure']),
            jnp.asarray(raw_state['air_pressure_on_interface_levels']),
            get_constant('heat_capacity_of_dry_air_at_constant_pressure',
                         'J/kg/degK'),
            get_constant('latent_heat_of_condensation', 'J/kg'),
            get_constant('gas_constant_of_dry_air', 'J/kg/degK'),
            get_constant('gas_constant_of_vapor_phase', 'J/kg/degK'),
            get_constant('gravitational_acceleration', 'm/s^2'),
            get_constant('density_of_liquid_phase', 'kg/m^3'))
        return ({'precipitation_amount': precipitation},
                {'air_temperature': new_T, 'specific_humidity': new_q})
