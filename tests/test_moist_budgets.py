"""Energy/water budget closure and multi-day drift bounds for the
flagship moist GCM (VERDICT r3 item 5; BASELINE config 5
"energy-balanced aquaplanet").

Tier 1 (strict, f64, one simulated day with per-step flux accumulation):
the atmospheric column budget must close quantitatively —

  water:  d/dt <q dp/g>  =  <lhf>/Lv - <P>            (FV transport: no
          global fixer; measured residual ~1.5%, asserted < 5%)
  energy: d/dt <(cp T + Lv q) dp/g>
          = <asr - olr - sfc_rad + shf + lhf>
          (asr-olr enters the column at TOA; sfc_rad leaves it into the
          slab ocean, which returns shf + lhf.  Measured residual
          ~15 W/m^2 — Emanuel convection's approximate enthalpy closure,
          hyperdiffusion/Rayleigh dissipation without frictional
          heating, and the cpT-only energy norm (no KE term) — asserted
          < 30 W/m^2, which still catches any accounting/sign/cadence
          regression at the ~100 W/m^2 scale.)

Tier 2 (15 simulated days, f64 — the test conftest enables x64, under
which an f32 model promotes mid-scan): stability and drift bounds —
finite fields, physical temperature range, global-mean surface pressure
held to tens of Pa (measured ~0.3 Pa/day), water path inside physical
bounds through the spin-up.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climt_tpu.dycore.moist_gcm import build_moist_gcm

CP, LV, G = 1004.64, 2.5e6, 9.80665


def _build(dtype, **kw):
    return build_moist_gcm(nlon=32, nlat=16, nz=10, timestep=600.0,
                           dtype=dtype, rad_every=6, rad_col_chunk=512,
                           moisture_advection='fv', **kw)


def _area_ops(dycore, nlon):
    w = np.asarray(dycore.sht.weights)
    wsum = w.sum() * nlon
    return w, wsum


def _column_integrals(dycore, carry, w, wsum):
    spec = carry[1]
    W = w[None, :, None]
    T = np.asarray(dycore.sht.synthesize(spec['T']))
    q = np.asarray(spec['q'])                        # grid in fv mode
    dp = np.asarray(dycore._dp_of(spec['lnps']))
    enth = ((CP * T + LV * q) * dp * W).sum() / (G * wsum)
    tw = (q * dp * W).sum() / (G * wsum)
    ps = np.exp(np.asarray(dycore.sht.synthesize(spec['lnps'])))
    mps = (ps * w[:, None]).sum() / wsum
    return enth, tw, mps, T


class TestOneDayBudgetClosure:

    @pytest.fixture(scope='class')
    def day_run(self):
        dycore, init_fn, step_fn, _ = _build(jnp.float64)
        w, wsum = _area_ops(dycore, 32)
        W2 = w[:, None]
        carry = init_fn()
        jstep = jax.jit(lambda c: step_fn(c, None))
        for _ in range(6):                 # leapfrog start transients
            carry, _ = jstep(carry)
        e0, tw0, mps0, _ = _column_integrals(dycore, carry, w, wsum)
        acc = dict(asr=0.0, olr=0.0, shf=0.0, lhf=0.0, P=0.0, sfc=0.0)
        n = 144
        for _ in range(n):
            carry, diag = jstep(carry)
            aux = carry[3]
            for k, arr in (('asr', diag['asr']), ('olr', diag['olr']),
                           ('shf', diag['shf']), ('lhf', diag['lhf']),
                           ('sfc', aux['sfc_rad'])):
                acc[k] += float((np.asarray(arr) * W2).sum() / wsum)
            # conv precip in mm/day, large-scale in m/s -> kg/m^2/s
            acc['P'] += float((
                (np.asarray(diag['conv_precip']) / 86400.0
                 + np.asarray(diag['ls_precip']) * 1000.0)
                * W2).sum() / wsum)
        e1, tw1, mps1, _ = _column_integrals(dycore, carry, w, wsum)
        dt = 600.0
        return dict(
            dE=(e1 - e0) / (n * dt),
            srcE=(acc['asr'] - acc['olr'] - acc['sfc'] + acc['shf']
                  + acc['lhf']) / n,
            dW=(tw1 - tw0) / (n * dt),
            srcW=(acc['lhf'] / LV - acc['P']) / n,
            dps=mps1 - mps0)

    def test_water_budget_closes_without_fixer(self, day_run):
        r = day_run
        rel = abs(r['dW'] - r['srcW']) / max(abs(r['srcW']), 1e-20)
        assert rel < 0.05, (r['dW'], r['srcW'], rel)

    def test_energy_budget_closes(self, day_run):
        r = day_run
        resid = r['dE'] - r['srcE']
        assert abs(resid) < 30.0, (r['dE'], r['srcE'], resid)

    def test_surface_pressure_steady(self, day_run):
        assert abs(day_run['dps']) < 10.0, day_run['dps']


class TestFifteenDayDrift:

    @pytest.fixture(scope='class')
    def long_run(self):
        dycore, init_fn, step_fn, run_fn = _build(jnp.float64)
        w, wsum = _area_ops(dycore, 32)
        carry = init_fn()
        trace = []
        for day in range(15):
            out = run_fn(carry, 144)
            carry = out[0] if isinstance(out, tuple) else out
            trace.append(_column_integrals(dycore, carry, w, wsum))
        return dycore, carry, trace

    def test_long_run_stable_and_physical(self, long_run):
        dycore, carry, trace = long_run
        _, tw, mps, T = trace[-1]
        assert np.isfinite(T).all()
        assert 150.0 < T.min() and T.max() < 340.0, (T.min(), T.max())
        assert 5.0 < tw < 60.0, tw           # physical water path
        q = np.asarray(carry[1]['q'])
        assert q.min() >= 0.0                # FV positivity

    def test_surface_pressure_drift_bounded(self, long_run):
        _, _, trace = long_run
        mps = [t[2] for t in trace]
        assert abs(mps[-1] - 1.0e5) < 100.0, mps[-1]

    def test_toa_trend_toward_balance(self, long_run):
        """The spin-up cooling must decelerate: |dE/dt| over the last 5
        days below the first 5 days (approach to energy balance)."""
        _, _, trace = long_run
        e = [t[0] for t in trace]
        first = abs(e[4] - e[0])
        last = abs(e[14] - e[10])
        assert last < first, (first, last)
