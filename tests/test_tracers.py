"""Tracer registry + packing, and arbitrary-tracer advection through
GFSDynamicalCore.

Reference behavior: sympl's tracer system lets any registered quantity be
packed into one array and advected by the dynamical core
(/root/reference/tests/test_components.py:23,87-89 exercises
reset_tracers/reset_packers around every dycore test; SURVEY.md §2.1).
"""

import numpy as np
import pytest

import climt_tpu as ct
from climt_tpu.core.dataarray import DataArray
from climt_tpu.core.tracers import (
    TracerPacker, get_tracer_names, register_tracer, reset_packers,
    reset_tracers)


@pytest.fixture(autouse=True)
def _clean_registry():
    reset_tracers()
    reset_packers()
    yield
    reset_tracers()
    reset_packers()


def _dycore_state(nx=16, ny=8, nz=10):
    dycore = ct.GFSDynamicalCore()
    grid = ct.get_grid(nx=nx, ny=ny, nz=nz)
    state = ct.get_default_state([dycore], grid_state=grid)
    shape = state['air_temperature'].shape
    # a solid-body zonal flow so tracers actually move
    state['eastward_wind'].values[:] = 12.0
    return dycore, state, shape


def _add_tracer(state, name, units, field):
    state[name] = DataArray(
        field, dims=['mid_levels', 'lat', 'lon'], attrs={'units': units})


class TestTracerPacker:

    def test_pack_unpack_roundtrip(self):
        register_tracer('tracer_one', 'kg/kg')
        register_tracer('tracer_two', 'g/kg')
        dycore = ct.GFSDynamicalCore()
        packer = TracerPacker(dycore,
                              ['tracer', 'mid_levels', 'lat', 'lon'])
        assert packer.tracer_names == ('tracer_one', 'tracer_two')
        rng = np.random.RandomState(0)
        state = {}
        f1 = rng.rand(5, 4, 8)
        f2 = rng.rand(5, 4, 8)
        _add_tracer(state, 'tracer_one', 'kg/kg', f1)
        _add_tracer(state, 'tracer_two', 'g/kg', f2)
        packed = packer.pack(state)
        assert packed.shape == (2, 5, 4, 8)
        np.testing.assert_allclose(packed[0], f1)
        np.testing.assert_allclose(packed[1], f2)
        out = packer.unpack(packed, state)
        assert set(out) == {'tracer_one', 'tracer_two'}
        np.testing.assert_allclose(out['tracer_one'].values, f1)
        assert out['tracer_two'].attrs['units'] == 'g/kg'

    def test_registration_propagates_to_live_packers(self):
        dycore = ct.GFSDynamicalCore()
        packer = TracerPacker(dycore,
                              ['tracer', 'mid_levels', 'lat', 'lon'])
        assert packer.tracer_names == ()
        register_tracer('late_tracer', 'kg/kg')
        assert packer.tracer_names == ('late_tracer',)

    def test_unit_conflict_raises(self):
        register_tracer('dup', 'kg/kg')
        with pytest.raises(ValueError):
            register_tracer('dup', 'g/kg')
        register_tracer('dup', 'kg/kg')       # same units: fine
        assert get_tracer_names() == ('dup',)


class TestDycoreTracerAdvection:

    def test_two_tracers_advect_and_conserve(self):
        from datetime import timedelta
        register_tracer('tracer_blob', 'kg/kg')
        register_tracer('tracer_uniform', 'kg/kg')
        dycore, state, shape = _dycore_state()
        nz, ny, nx = shape
        lon_idx = np.arange(nx)
        blob2d = np.exp(-((lon_idx - nx // 4) / 2.0) ** 2)[None, None, :]
        blob = np.broadcast_to(blob2d, shape).copy()
        _add_tracer(state, 'tracer_blob', 'kg/kg', blob)
        _add_tracer(state, 'tracer_uniform', 'kg/kg',
                    np.full(shape, 0.5))

        diag, out = dycore(state, timedelta(seconds=600))
        assert 'tracer_blob' in out and 'tracer_uniform' in out
        b0 = blob
        b1 = np.asarray(out['tracer_blob'].values)
        # moved: the blob changed where the wind blows, finitely
        assert np.isfinite(b1).all()
        assert np.abs(b1 - b0).max() > 1e-4
        # uniform tracer is preserved exactly (Lin-Rood consistency)
        np.testing.assert_allclose(
            np.asarray(out['tracer_uniform'].values), 0.5, rtol=1e-10)
        # monotone transport: no new extrema
        assert b1.min() >= -1e-10
        assert b1.max() <= b0.max() + 1e-8

    def test_tracer_mass_conserved_through_dycore(self):
        from datetime import timedelta
        register_tracer('tracer_m', 'kg/kg')
        dycore, state, shape = _dycore_state()
        rng = np.random.RandomState(3)
        field = 1e-3 * (1.0 + rng.rand(*shape))
        _add_tracer(state, 'tracer_m', 'kg/kg', field)
        # mass integral uses the input-state dp (the FV pseudo-density
        # starts from it; transport preserves sum(q dp w) to roundoff)
        p_int = np.asarray(
            state['air_pressure_on_interface_levels'].values)
        dp = np.abs(np.diff(p_int, axis=0))
        diag, out = dycore(state, timedelta(seconds=600))
        w = np.asarray(dycore._dycore.sht.weights)[None, :, None]
        m0 = float((field * dp * w).sum())
        m1 = float((np.asarray(out['tracer_m'].values) * dp * w).sum())
        # compare against the SAME dp (the FV operator's internal
        # pseudo-density bookkeeping guarantees this identity)
        assert abs(m1 - m0) / m0 < 5e-3

    def test_dycore_without_tracers_unaffected(self):
        from datetime import timedelta
        dycore, state, shape = _dycore_state()
        diag, out = dycore(state, timedelta(seconds=600))
        assert not any(k.startswith('tracer') for k in out)
