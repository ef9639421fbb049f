"""Multi-step dycore validation: stability, climatology, conservation.

The reference's caches store only a single call, so the golden tests
(test_dycore_golden.py) stop at one step; this tier adds what BASELINE.md
actually asks of a usable dycore — N-step stability, the emergence of the
Held-Suarez climatology, global mass conservation, and water-budget
closure of the fused moist GCM (the spectral advective-form moisture
transport requires the global mass fixer, dycore/moist_gcm.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import climt_tpu as ct
from climt_tpu.dycore.compiled import build_held_suarez_model
from climt_tpu.dycore.moist_gcm import build_moist_gcm


@pytest.fixture(scope='module')
def held_suarez_30day():
    """30 simulated days of Held-Suarez at ~T21 (64x32x20, dt=20 min) —
    long enough for the thermal-wind jets to spin up from rest."""
    model = build_held_suarez_model(nlon=64, nlat=32, nz=20,
                                    timestep=1200.0, dtype=jnp.float64)
    dycore, init_fn, step_fn, run_fn = model
    carry = init_fn()
    n_steps = 30 * 72
    out = run_fn(carry, n_steps)
    carry = out[0] if isinstance(out, tuple) and len(out) == 2 else out
    return dycore, carry


class TestHeldSuarezClimatology:
    def test_multistep_stability(self, held_suarez_30day):
        dycore, carry = held_suarez_30day
        spec = carry[1]
        T = np.asarray(dycore.sht.synthesize(spec['T']))
        u, v = dycore.sht.uv_from_vort_div(spec['vort'], spec['div'])
        u, v = np.asarray(u), np.asarray(v)
        ps = np.exp(np.asarray(dycore.sht.synthesize(spec['lnps'])))
        assert np.isfinite(T).all() and np.isfinite(u).all()
        # physical bounds after 30 days of forced dynamics
        assert 150.0 < T.min() and T.max() < 350.0, (T.min(), T.max())
        assert np.abs(u).max() < 150.0
        assert 8.0e4 < ps.min() and ps.max() < 1.2e5

    def test_global_mass_conserved(self, held_suarez_30day):
        """d/dt <ln ps> has no source: global mean surface pressure must
        hold to a fraction of a percent over 30 days."""
        dycore, carry = held_suarez_30day
        spec = carry[1]
        w = np.asarray(dycore.sht.weights)[:, None]
        ps = np.exp(np.asarray(dycore.sht.synthesize(spec['lnps'])))
        mean_ps = (w * ps).sum() / (w.sum() * ps.shape[1])
        assert abs(mean_ps - 1.0e5) < 500.0, mean_ps

    def test_westerly_jets_emerge(self, held_suarez_30day):
        """Held-Suarez forcing must spin up westerly midlatitude jets
        aloft (the defining feature of the benchmark climatology)."""
        dycore, carry = held_suarez_30day
        spec = carry[1]
        u, _ = dycore.sht.uv_from_vort_div(spec['vort'], spec['div'])
        u = np.asarray(u)                      # (nz, nlat, nlon) top-down
        uz = u.mean(axis=2)                    # zonal mean
        lat = np.degrees(np.arcsin(np.asarray(dycore.sht.mu)))
        mid = (np.abs(lat) > 20.0) & (np.abs(lat) < 70.0)
        upper = uz[:uz.shape[0] // 2, :]       # upper half of the column
        assert upper[:, mid].max() > 10.0, upper[:, mid].max()
        # and the flow is predominantly westerly aloft in midlatitudes
        assert upper[:, mid].mean() > 0.0


class TestMoistGCMBudgets:
    @pytest.fixture(scope='class')
    def moist_run(self):
        model = build_moist_gcm(nlon=32, nlat=16, nz=10, timestep=600.0,
                                dtype=jnp.float64, rad_every=3,
                                rad_col_chunk=512, conserve_water=True)
        dycore, init_fn, step_fn, run_fn = model
        carry0 = init_fn()
        out = run_fn(carry0, 12)
        carry = out[0] if isinstance(out, tuple) and len(out) == 2 else out
        return dycore, step_fn, carry

    def test_multistep_stability(self, moist_run):
        dycore, _, carry = moist_run  # (dycore, step_fn, carry)
        spec = carry[1]
        T = np.asarray(dycore.sht.synthesize(spec['T']))
        q = np.asarray(dycore.sht.synthesize(spec['q']))
        assert np.isfinite(T).all() and np.isfinite(q).all()
        assert 140.0 < T.min() and T.max() < 360.0
        assert q.max() < 0.06

    def test_water_budget_closes(self, moist_run):
        """With the mass fixer, the change in area-weighted total water
        over one leapfrog step equals 2*dt*(global source) to high
        relative accuracy (the fixer enforces it; re-analysis truncation
        is the only residual)."""
        dycore, step_fn, carry = moist_run
        prev = carry[0]
        sht = dycore.sht
        w = jnp.asarray(np.asarray(sht.weights))[None, :, None]

        def tw(spec):
            qg = sht.synthesize(spec['q'])
            ps = jnp.exp(sht.synthesize(spec['lnps']))
            ph, _, _, _ = dycore._vertical_structures(ps)
            return float(jnp.sum(w * qg * (ph[1:] - ph[:-1])))

        # advance one more step to capture the physics source it applies
        tw_prev = tw(prev)
        (f2, new2, g2, aux2, k2), diag = step_fn(carry, None)
        tw_new = tw(new2)

        # global source from the step's own diagnosed fluxes:
        # evaporation (lhf/Lv) minus convective+large-scale precip
        lhf = jnp.asarray(np.asarray(diag['lhf']))
        evap = jnp.sum(w[0] * lhf / 2.5e6)
        # convective precip is mm/day, large-scale is m/s -> kg/m^2/s
        precip = jnp.sum(w[0] * (
            jnp.asarray(np.asarray(diag['conv_precip'])) / 86400.0
            + jnp.asarray(np.asarray(diag['ls_precip'])) * 1000.0))
        g = 9.80665
        # tw units: Pa * kg/kg; source in kg/m^2/s * g -> Pa/s
        src = float((evap - precip) * g)
        dtw = tw_new - tw_prev
        expected = 2.0 * 600.0 * src
        scale = max(abs(expected), abs(dtw), 1e-8 * max(tw_prev, 1.0))
        assert abs(dtw - expected) < 0.05 * scale + 1e-7 * tw_prev, (
            dtw, expected, tw_prev)

    def test_without_fixer_budget_drifts(self):
        """Sanity check that the fixer is doing real work: the unfixed
        spectral advection + clip does NOT close the budget exactly."""
        model = build_moist_gcm(nlon=32, nlat=16, nz=10, timestep=600.0,
                                dtype=jnp.float64, rad_every=3,
                                rad_col_chunk=512, conserve_water=False)
        dycore, init_fn, step_fn, _ = model
        carry = init_fn()
        for _ in range(3):
            carry, diag = step_fn(carry, None)
        # no assertion on magnitude — just that the run is stable and the
        # fixerless path stays available for cache-parity comparisons
        q = np.asarray(dycore.sht.synthesize(carry[1]['q']))
        assert np.isfinite(q).all()
