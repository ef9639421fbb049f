"""Initialization matrix tests.

Mirrors the reference test strategy item (4)
(/root/reference/tests/test_initialization.py): grid construction
invariants, every component initializable & callable on default/1d/3d
grids, random pairs/triplets sharing one state (the composability
contract), and wildcard dim broadcasting.
"""

import itertools
import random
from datetime import timedelta

import numpy as np
import pytest

import climt_tpu as ct
from climt_tpu.core.base_components import (
    ImplicitTendencyComponent, Stepper, TendencyComponent)


def all_component_factories():
    return {
        'HeldSuarez': ct.HeldSuarez,
        'GrayLongwaveRadiation': ct.GrayLongwaveRadiation,
        'Frierson06LongwaveOpticalDepth': ct.Frierson06LongwaveOpticalDepth,
        'GridScaleCondensation': ct.GridScaleCondensation,
        'BergerSolarInsolation': ct.BergerSolarInsolation,
        'SimplePhysics': ct.SimplePhysics,
        'RRTMGLongwave': ct.RRTMGLongwave,
        'RRTMGShortwave': ct.RRTMGShortwave,
        'SlabSurface': ct.SlabSurface,
        'EmanuelConvection': ct.EmanuelConvection,
        'DcmipInitialConditions': ct.DcmipInitialConditions,
        'BucketHydrology': ct.BucketHydrology,
        'IceSheet': ct.IceSheet,
        'Instellation': ct.Instellation,
        'DryConvectiveAdjustment': ct.DryConvectiveAdjustment,
    }


def call_any(component, state):
    if isinstance(component, (Stepper, ImplicitTendencyComponent)):
        return component(state, timedelta(minutes=10))
    return component(state)


# -- grid construction invariants -------------------------------------------

def test_grid_pressures_monotonic():
    grid = ct.get_grid(nx=8, ny=4, nz=20)
    p_int = np.asarray(
        grid['air_pressure_on_interface_levels'].values)
    assert (np.diff(p_int, axis=0) < 0).all()  # decreasing upward
    p_mid = np.asarray(grid['air_pressure'].values)
    assert (p_mid[0] < p_int[0]).all() and (p_mid[-1] > p_int[-1]).all()
    # mid-level pressures bracketed by interfaces
    assert ((p_mid <= p_int[:-1]) & (p_mid >= p_int[1:])).all()


def test_grid_custom_surface_pressure():
    grid = ct.get_grid(nx=None, ny=None, nz=10, p_surf_in_Pa=9e4)
    ps = np.asarray(grid['surface_air_pressure'].values)
    np.testing.assert_allclose(ps, 9e4)
    p_int = np.asarray(
        grid['air_pressure_on_interface_levels'].values)
    np.testing.assert_allclose(p_int[0].ravel(), 9e4, rtol=1e-12)


def test_grid_dim_names_and_lengths():
    grid = ct.get_grid(nx=12, ny=6, nz=9)
    assert grid['latitude'].dims == ('lat', 'lon')
    assert grid['latitude'].shape == (6, 12)
    assert grid['air_pressure'].shape == (9, 6, 12)
    assert grid['air_pressure_on_interface_levels'].shape == (10, 6, 12)


def test_gaussian_latitudes_symmetric():
    lat, edges = ct.gaussian_latitudes(16)
    np.testing.assert_allclose(lat, -lat[::-1], atol=1e-12)
    assert (np.abs(lat) < 90).all()


# -- every component initializable and callable on several grids ------------

@pytest.mark.parametrize('name', sorted(all_component_factories()))
@pytest.mark.parametrize('grid_kwargs', [
    dict(nx=None, ny=None, nz=12),
    dict(nx=None, ny=8, nz=12),
    dict(nx=6, ny=4, nz=12),
], ids=['column', '2d', '3d'])
def test_component_runs_on_grid(name, grid_kwargs):
    component = all_component_factories()[name]()
    state = ct.get_default_state(
        [component], grid_state=ct.get_grid(**grid_kwargs))
    output = call_any(component, state)
    assert output is not None


# -- composability: random pairs and triplets share one state ---------------

@pytest.mark.parametrize('seed', range(6))
def test_component_pairs_share_state(seed):
    rng = random.Random(seed)
    factories = all_component_factories()
    names = rng.sample(sorted(factories), 2)
    components = [factories[n]() for n in names]
    state = ct.get_default_state(
        components, grid_state=ct.get_grid(nx=4, ny=3, nz=10))
    for component in components:
        call_any(component, state)


@pytest.mark.parametrize('seed', range(3))
def test_component_triplets_share_state(seed):
    rng = random.Random(100 + seed)
    factories = all_component_factories()
    names = rng.sample(sorted(factories), 3)
    components = [factories[n]() for n in names]
    state = ct.get_default_state(
        components, grid_state=ct.get_grid(nx=4, ny=3, nz=10))
    for component in components:
        call_any(component, state)


# -- wildcard broadcasting ---------------------------------------------------

def test_wildcard_broadcasts_scalar_quantities():
    """Scalar ('*'-dims) quantities broadcast against gridded ones."""
    sw = ct.RRTMGShortwave()
    state = ct.get_default_state(
        [sw], grid_state=ct.get_grid(nx=4, ny=3, nz=10))
    # solar_cycle_fraction is a scalar quantity in the same state as the
    # (lat, lon) fields; extraction must broadcast it
    assert state['solar_cycle_fraction'].shape == ()
    tendencies, diagnostics = sw(state)
    assert diagnostics[
        'downwelling_shortwave_flux_in_air'].shape == (11, 3, 4)
