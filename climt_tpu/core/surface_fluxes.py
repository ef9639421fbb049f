"""Shared bulk aerodynamic surface-flux formulae.

One home for the bulk-transfer flux convention used by the land
(BucketHydrology) and ocean (DataOcean) paths, mirroring the
reference's _core/surface_fluxes.py (v0.31): a single bulk coefficient
times wind speed, with the air-density factors that make the fluxes
dimensionally correct (reference HISTORY v0.30 BucketHydrology fix).
Accepts numpy or jax arrays (pure elementwise math).
"""

from __future__ import annotations

import numpy as np


def bulk_fluxes(wind_speed, surface_temperature, air_temperature,
                surface_specific_humidity, air_specific_humidity,
                air_density, bulk_coefficient=0.0011, latent_heat=2.5e6,
                beta=1.0, heat_capacity=1004.0):
    """E = beta * C_D * U * (q_s - q_a); latent = L * rho * E;
    sensible = rho * c_p * C_D * U * (T_s - T_a)."""
    U = wind_speed
    rho = air_density
    potential_evap = bulk_coefficient * U * (
        surface_specific_humidity - air_specific_humidity)
    evaporation_rate = beta * potential_evap
    latent = latent_heat * rho * evaporation_rate
    sensible = (rho * bulk_coefficient * U
                * (surface_temperature - air_temperature) * heat_capacity)
    return {
        'sensible_heat_flux': sensible,
        'latent_heat_flux': latent,
        'evaporation_rate': evaporation_rate,
    }
