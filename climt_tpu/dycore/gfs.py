"""GFSDynamicalCore: the climt-compatible Stepper wrapping the spectral
primitive-equation solver together with physics components.

Behavioral parity targets (the reference's out-of-tree gfs_dynamical_core
package): construction ``GFSDynamicalCore([physics...],
number_of_damped_levels=N)`` where the dycore *contains* the physics and
steps them together (/root/reference/examples/gmd_aquaplanet.py:77-95);
Stepper call convention ``diagnostics, new_state = dycore(state, timestep)``;
Stepper-type physics must be pre-wrapped in TimeDifferencingWrapper
(/root/reference/docs/configuration.rst:72-84).

Two execution paths:
- the sympl-compatible path here (host marshalling per call, physics
  components called eagerly, the dynamics step jitted);
- the fused path for production/bench: ``make_scan_step`` returns a pure
  jittable function stepping dynamics+physics together, suitable for
  ``lax.scan`` and ``shard_map``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.base_components import (
    DiagnosticComponent, ImplicitTendencyComponent, Stepper,
    TendencyComponent, timestep_seconds)
from ..core.constants import get_constant
from ..core.dataarray import DataArray
from .spectral_dynamics import SpectralDycore


class GFSDynamicalCore(Stepper):
    """Spectral dynamical core containing a list of physics components."""

    _base_input_properties = {
        'eastward_wind': {'dims': ['mid_levels', 'lat', 'lon'],
                          'units': 'm s^-1'},
        'northward_wind': {'dims': ['mid_levels', 'lat', 'lon'],
                           'units': 'm s^-1'},
        'air_temperature': {'dims': ['mid_levels', 'lat', 'lon'],
                            'units': 'degK'},
        'specific_humidity': {'dims': ['mid_levels', 'lat', 'lon'],
                              'units': 'kg/kg'},
        'surface_air_pressure': {'dims': ['lat', 'lon'], 'units': 'Pa'},
        'surface_geopotential': {'dims': ['lat', 'lon'],
                                 'units': 'm^2 s^-2'},
        'atmosphere_hybrid_sigma_pressure_a_coordinate_on_interface_levels': {
            'dims': ['interface_levels'], 'units': 'dimensionless',
            'alias': 'ak'},
        'atmosphere_hybrid_sigma_pressure_b_coordinate_on_interface_levels': {
            'dims': ['interface_levels'], 'units': 'dimensionless',
            'alias': 'bk'},
    }

    output_properties = {
        'eastward_wind': {'dims': ['mid_levels', 'lat', 'lon'],
                          'units': 'm s^-1'},
        'northward_wind': {'dims': ['mid_levels', 'lat', 'lon'],
                           'units': 'm s^-1'},
        'air_temperature': {'dims': ['mid_levels', 'lat', 'lon'],
                            'units': 'degK'},
        'specific_humidity': {'dims': ['mid_levels', 'lat', 'lon'],
                              'units': 'kg/kg'},
        'surface_air_pressure': {'dims': ['lat', 'lon'], 'units': 'Pa'},
        'air_pressure': {'dims': ['mid_levels', 'lat', 'lon'],
                         'units': 'Pa'},
        'air_pressure_on_interface_levels': {
            'dims': ['interface_levels', 'lat', 'lon'], 'units': 'Pa'},
        'divergence_of_wind': {'dims': ['mid_levels', 'lat', 'lon'],
                               'units': 's^-1'},
        'atmosphere_relative_vorticity': {
            'dims': ['mid_levels', 'lat', 'lon'], 'units': 's^-1'},
    }

    @property
    def diagnostic_properties(self):
        """Wrapped components' diagnostics pass through the dycore call
        (reference behavior: the full-moist cache's first dict holds the
        LW fluxes, convection scales and surface fluxes of the wrapped
        components, TestFullMoistGFSDycoreWithPhysics-3d-0.cache).

        The dycore itself computes none (restore path sees {}): the
        wrapped components return labeled DataArrays that are merged in
        ``__call__``."""
        if getattr(self, '_restoring', False):
            return {}
        combined = {}
        for comp in getattr(self, '_components', ()):
            combined.update(getattr(comp, 'diagnostic_properties', {}))
        return combined

    def __init__(self, tendency_component_list=None,
                 number_of_damped_levels=0,
                 damping_timescale=2.0 * 86400.0,
                 truncation=None,
                 asselin_strength=0.05,
                 moist=True, moisture_advection='spectral', **kwargs):
        """``moisture_advection``: 'spectral' (cache-parity default),
        'fv' (conservative grid-space flux-form transport), or 'sl'
        (semi-Lagrangian, ops/sl_advection.py).  Registered tracers
        (core/tracers.py) are ALWAYS advected in grid space with the
        flux-form FV operator on the dycore's diagnosed mass fluxes —
        the reference dycore advected every registered tracer
        (/root/reference/tests/test_components.py:23,87-89)."""
        from ..core.tracers import TracerPacker
        self._moisture_advection = moisture_advection
        self._tracer_packer = TracerPacker(
            self, ['tracer', 'mid_levels', 'lat', 'lon'])
        self._fv = None
        self._pending_tracers = None
        self._advected_tracers = None
        self._components = list(tendency_component_list or [])
        for comp in self._components:
            if not isinstance(comp, (TendencyComponent,
                                     ImplicitTendencyComponent)) and \
                    not hasattr(comp, 'tendency_properties'):
                raise TypeError(
                    'GFSDynamicalCore wraps TendencyComponents; wrap '
                    'Steppers in TimeDifferencingWrapper first '
                    '(got {})'.format(type(comp)))
        self._n_damped = number_of_damped_levels
        self._damping_timescale = damping_timescale
        self._truncation = truncation
        self._asselin = asselin_strength
        self._moist = moist
        self._dycore = None
        self._prev = None
        self._now = None
        super().__init__(**kwargs)

    @property
    def input_properties(self):
        """Union of dycore + wrapped-component inputs (used by
        get_default_state); extraction uses only the dycore's own fields —
        each wrapped component marshals its own inputs at call time."""
        combined = dict(self._base_input_properties)
        for comp in self._components:
            for name, spec in comp.input_properties.items():
                combined.setdefault(name, spec)
        return combined

    @property
    def restoration_properties(self):
        """Output restoration must not see wrapped components' aliases."""
        return self._base_input_properties

    def _extract(self, state):
        from ..core.properties import extract_arrays
        return extract_arrays(state, self._base_input_properties)

    def _ensure_dycore(self, nlon, nlat, nz, ak, bk, dt):
        if self._dycore is not None and self._dycore.dt == dt:
            return
        # default truncation follows the reference dycore's nlon//3 - 2
        # (probed from its regression caches: spectral power of the cached
        # air_temperature vanishes for n>8 at nlon=32 and n>3 at nlon=16)
        truncation = self._truncation
        if truncation is None:
            truncation = max(nlon // 3 - 2, 1)
        self._dycore = SpectralDycore(
            nlon, nlat, nz, ak, bk,
            truncation=truncation,
            timestep=dt,
            number_of_damped_levels=self._n_damped,
            damping_timescale=self._damping_timescale,
            asselin_strength=self._asselin,
            moisture_advection=self._moisture_advection,
            rd=get_constant('gas_constant_of_dry_air', 'J/kg/degK'),
            cpd=get_constant(
                'heat_capacity_of_dry_air_at_constant_pressure',
                'J/kg/degK'),
            g=get_constant('gravitational_acceleration', 'm/s^2'),
            radius=get_constant('planetary_radius', 'm'),
            omega=get_constant('planetary_rotation_rate', 's^-1'))
        self._jit_step = jax.jit(self._dycore.step)
        self._prev = None

    def _physics_tendencies(self, state, timestep, shape3d):
        """Run wrapped components (sympl path) and collect top-down grids."""
        if not self._components:
            return None
        nz, nlat, nlon = shape3d
        du = jnp.zeros(shape3d)
        dv = jnp.zeros(shape3d)
        dT = jnp.zeros(shape3d)
        dq = jnp.zeros(shape3d)

        def to_topdown(value, units, target_units):
            arr = value.to_units(target_units)
            da = arr.transpose('mid_levels', 'lat', 'lon') \
                if set(arr.dims) == {'mid_levels', 'lat', 'lon'} else arr
            return jnp.asarray(da.values)[::-1]

        self._collected_diagnostics = {}
        for comp in self._components:
            if isinstance(comp, ImplicitTendencyComponent) or (
                    not isinstance(comp, TendencyComponent)
                    and hasattr(comp, 'tendency_properties')):
                try:
                    tendencies, diags = comp(state, timestep)
                except TypeError:
                    tendencies, diags = comp(state)
            else:
                tendencies, diags = comp(state)
            self._collected_diagnostics.update(diags)
            for name, value in tendencies.items():
                if name == 'eastward_wind':
                    du = du + to_topdown(value, value.units, 'm s^-2')
                elif name == 'northward_wind':
                    dv = dv + to_topdown(value, value.units, 'm s^-2')
                elif name == 'air_temperature':
                    dT = dT + to_topdown(value, value.units, 'degK s^-1')
                elif name == 'specific_humidity':
                    dq = dq + to_topdown(value, value.units, 's^-1')
        return {'du': du, 'dv': dv, 'dT': dT, 'dq': dq}

    def array_call(self, raw_state, timestep):
        dt = timestep_seconds(timestep)
        u_bu = jnp.asarray(raw_state['eastward_wind'])
        nz, nlat, nlon = u_bu.shape
        ak = np.asarray(raw_state['ak'])
        bk = np.asarray(raw_state['bk'])
        self._ensure_dycore(nlon, nlat, nz, ak, bk, dt)
        dyc = self._dycore

        # bottom-up state -> top-down internal grids
        def td(x):
            return jnp.asarray(x)[::-1]

        ps = jnp.asarray(raw_state['surface_air_pressure'])
        dyc.set_surface_geopotential(
            jnp.asarray(raw_state['surface_geopotential']))
        spec_in = dyc.spectral_state_from_grid(
            td(raw_state['eastward_wind']),
            td(raw_state['northward_wind']),
            td(raw_state['air_temperature']),
            td(raw_state['specific_humidity']),
            jnp.log(ps))

        if self._prev is None:
            # leapfrog start: forward half/full step from the initial state
            _, new = dyc.initial_step(spec_in, dt=dt)
            self._prev = spec_in
        else:
            # continue the leapfrog: center state is the externally
            # (physics-)updated grid state, previous is the filtered memory
            filtered, new, _ = self._jit_step(self._prev, spec_in)
            self._prev = filtered

        g = dyc.grid_state_from_spectral(new)
        ps_new = jnp.exp(g['lnps'])
        p_half = (dyc.A[:, None, None] + dyc.B[:, None, None]
                  * ps_new[None])
        rd = dyc.rd
        rk = dyc.kappa
        dp = p_half[1:] - p_half[:-1]
        p_full = ((p_half[1:] ** (rk + 1) - p_half[:-1] ** (rk + 1))
                  / ((rk + 1) * dp)) ** (1.0 / rk)
        vort_g = dyc.sht.synthesize(new['vort'])
        div_g = dyc.sht.synthesize(new['div'])

        def bu(x):
            return x[::-1]

        # physics applied as a split (forward-Euler) update on the new
        # state: evaluating dissipative physics at the leapfrog center and
        # integrating over 2 dt amplifies the computational mode, so the
        # dynamics step above is physics-free and physics advance dt here.
        # Tendencies pass through the (truncated) spectral roundtrip, which
        # is the reference dycore's behavior: the cached
        # TestGFSDycoreWithHeldSuarez new state equals
        # T + dt * P_T3[tendency] to machine precision (truncation 3 at
        # nlon=16), i.e. physics is injected in spectral space.
        u_out, v_out, T_out, q_out = g['u'], g['v'], g['T'], g['q']
        phys = self._phys_for_state
        if phys is not None:
            sht = dyc.sht
            cosl = dyc.coslat[:, None]
            dvort, ddiv = sht.vort_div_analysis(phys['du'] * cosl,
                                                phys['dv'] * cosl)
            du_t, dv_t = sht.uv_from_vort_div(dvort, ddiv)
            u_out = u_out + dt * du_t
            v_out = v_out + dt * dv_t
            T_out = T_out + dt * sht.synthesize(sht.analyze(phys['dT']))
            if dyc.fv is not None:
                q_out = q_out + dt * phys['dq']   # grid-space moisture
            else:
                q_out = q_out + dt * sht.synthesize(
                    sht.analyze(phys['dq']))

        # registered tracers: conservative grid-space FV transport on
        # the input state's diagnosed mass fluxes over dt
        if self._pending_tracers is not None:
            u_c, v_c, dp_c, mdot_c = dyc.diagnose_mass_fluxes(spec_in)
            fv = self._ensure_fv(dt)
            packed_td = jnp.asarray(self._pending_tracers)[:, ::-1]
            adv = jax.vmap(
                lambda tr: fv.advect(tr, dp_c, u_c, v_c, mdot_c, dt))(
                packed_td)
            self._advected_tracers = np.asarray(adv[:, ::-1])

        q_new = jnp.clip(q_out, 0.0, None) if self._moist else q_out
        outputs = {
            'eastward_wind': bu(u_out),
            'northward_wind': bu(v_out),
            'air_temperature': bu(T_out),
            'specific_humidity': bu(q_new),
            'surface_air_pressure': ps_new,
            'air_pressure': bu(p_full),
            'air_pressure_on_interface_levels': bu(p_half),
            'divergence_of_wind': bu(div_g),
            'atmosphere_relative_vorticity': bu(vort_g),
        }
        return {}, outputs

    def _ensure_fv(self, dt):
        if self._fv is None:
            from ..ops.fv_advection import FVAdvection
            dyc = self._dycore
            self._fv = FVAdvection(
                np.asarray(dyc.sht.mu), np.asarray(dyc.sht.weights),
                dyc.nlon, dyc.radius, dt_max=2.0 * dt,
                dtype=dyc.dtype)
        return self._fv

    def __call__(self, state, timestep):
        # stash the labeled state so wrapped physics can be called with it
        self._phys_state = state
        self._phys_for_state = None
        self._collected_diagnostics = {}
        if self._components:
            shape = state['eastward_wind'].transpose(
                'mid_levels', 'lat', 'lon').shape
            self._phys_for_state = self._physics_tendencies(
                state, timestep, shape)
        # pack registered tracers (sympl tracer contract, SURVEY.md §2.1)
        self._pending_tracers = None
        self._advected_tracers = None
        packer = self._tracer_packer
        if packer.tracer_names:
            self._pending_tracers = packer.pack(state)
        self._restoring = True
        try:
            diagnostics, new_state = super().__call__(state, timestep)
        finally:
            self._restoring = False
        if self._advected_tracers is not None:
            tracers = packer.unpack(self._advected_tracers, state)
            # the dycore's own prognostics (e.g. specific_humidity, if
            # someone registered it) keep the dycore's update
            for name in list(tracers):
                if name in new_state:
                    tracers.pop(name)
            new_state.update(tracers)
        # wrapped components' diagnostics pass through (reference dycore
        # behavior, see diagnostic_properties)
        merged = dict(self._collected_diagnostics)
        merged.update(diagnostics)
        return merged, new_state
