"""Value-level validation of the Emanuel convection scheme.

The reference's cached golden outputs for TestEmanuel are all zero (the
default state does not convect), so the moist path cannot be validated
against caches, and no Fortran compiler exists in this environment to
generate a fixture from convect43c.f90.  These tests validate the moist
path at the VALUE level anyway:

1. the lifted-parcel (TLIFT) temperatures are checked against an exact
   root solve of the same conservation law (liquid-water static energy
   of the origin level, with the scheme's saturation formula), i.e. the
   two-Newton-iteration kernel is compared with independent numerics;
2. the documented analytic limits hold (dry adiabat below cloud base,
   unsaturated parcel carries no condensate);
3. on a strongly convecting sounding, the scheme's own integral
   identities hold: exact column enthalpy neutrality (the CONVECT
   enthalpy fix) and column water loss balancing surface precipitation.
"""

import numpy as np
import pytest
from scipy.optimize import brentq

import jax.numpy as jnp

from climt_tpu.components.emanuel_convection import (
    emanuel_convect, lifted_parcel)

PARAMS = dict(
    minorig=0, elcrit=0.0011, tlcrit=-55.0, entp=1.5, sigd=0.05,
    sigs=0.12, omtrain=50.0, omtsnow=5.5, coeffr=1.0, coeffs=0.8,
    cu=0.7, beta=10.0, dtmax=0.9, alpha=0.1, damp=0.1, delt0=300.0,
    g=9.80665, cpd=1004.64, cpv=1846.0, rd=287.0, rv=461.5,
    lv0=2.501e6, rowl=1000.0, cl=2500.0)


def moist_sounding(nz=25, ncol=1):
    """A conditionally unstable tropical sounding (bottom-up, p in mb)."""
    ph = np.linspace(1013.0, 80.0, nz + 1)
    p = 0.5 * (ph[:-1] + ph[1:])
    T = 302.0 * (p / 1013.0) ** 0.19
    T = np.maximum(T, 200.0)
    rh = np.clip(0.85 - 0.3 * (1013.0 - p) / 900.0, 0.25, 0.85)
    es = 6.112 * np.exp(17.67 * (T - 273.15) / (T - 29.65))
    qsat = 0.622 * es / np.maximum(p - 0.378 * es, 1e-10)
    q = rh * qsat
    tile = (ncol, 1)
    return (np.tile(T, tile), np.tile(q, tile), np.tile(qsat, tile),
            np.tile(p, tile), np.tile(ph, tile))


def geopotential(T, q, p, ph, params):
    """Hydrostatic gz as the scheme builds it (trapezoid in p/ph)."""
    rd = params['rd']
    epsi = params['rv'] / params['rd']
    tv = T * (1.0 + q * epsi - q)
    gz = np.zeros_like(T)
    for i in range(1, T.shape[1]):
        gz[:, i] = gz[:, i - 1] + 0.5 * rd * (
            tv[:, i] + tv[:, i - 1]) * (p[:, i - 1] - p[:, i]) \
            / ph[:, i]
    return gz


class TestLiftedParcel:
    def exact_saturated_parcel(self, T_nk, q_nk, gz_nk, p_lev, gz_lev,
                               params):
        """Exact solve of the conservation law the Newton kernel
        approximates: find Tp with qg = qsat(Tp, p) such that
        cpd*Tp + (cl-cpd)*q_nk*T_env + alv(T_env)*qg + gz = ah0.

        NOTE: the scheme evaluates alv and the Newton linearization at
        the ENVIRONMENT temperature (convect43c TLIFT convention), so
        the exact equation does too; only the root-finding differs.
        """
        cpd, cpv, cl = params['cpd'], params['cpv'], params['cl']
        rv, rd, lv0 = params['rv'], params['rd'], params['lv0']
        cpvmcl = cl - cpv
        eps = rd / rv
        ah0 = ((cpd * (1.0 - q_nk) + cl * q_nk) * T_nk
               + q_nk * (lv0 - cpvmcl * (T_nk - 273.15)) + gz_nk)

        def qsat_scheme(tg, p):
            tc = tg - 273.15
            if tc >= 0.0:
                es = 6.112 * np.exp(17.67 * tc / (243.5 + tc))
            else:
                es = np.exp(23.33086 - 6111.72784 / tg
                            + 0.15215 * np.log(tg))
            return eps * es / max(p - es * (1.0 - eps), 1e-30)

        def resid(tg, p, T_env, gz):
            alv = lv0 - cpvmcl * (T_env - 273.15)
            qg = qsat_scheme(tg, p)
            return (cpd * tg + (cl - cpd) * q_nk * T_env
                    + alv * qg + gz) - ah0

        out = np.empty_like(p_lev)
        for i, (pp, te, gg) in enumerate(zip(p_lev, self.T_env, gz_lev)):
            out[i] = brentq(resid, 150.0, 380.0, args=(pp, te, gg),
                            xtol=1e-10)
        return out

    def test_saturated_ascent_matches_exact_solver(self):
        T, q, qs, p, ph = moist_sounding()
        gz = geopotential(T, q, p, ph, PARAMS)
        nz = T.shape[1]
        nk = np.array([0], np.int32)
        icb = np.array([3], np.int32)
        tp, tvp, clw = lifted_parcel(
            jnp.asarray(T), jnp.asarray(q), jnp.asarray(qs),
            jnp.asarray(p), jnp.asarray(gz), jnp.asarray(nk),
            jnp.asarray(icb), nz - 3, PARAMS)
        tp = np.asarray(tp)[0]

        self.T_env = T[0]
        exact = self.exact_saturated_parcel(
            T[0, 0], q[0, 0], gz[0, 0], p[0], gz[0], PARAMS)
        # compare on the saturated region (above cloud base, below the
        # level where the 35 K Newton floor would engage)
        sel = slice(3, nz - 4)
        err = np.abs(tp[sel] - exact[sel])
        # Two Newton iterations from the environment temperature is the
        # Fortran's own truncation (convect43c TLIFT does exactly two);
        # measured: <0.016 K just above cloud base (where cloud-base
        # buoyancy is decided), growing to ~0.3 K far aloft where the
        # environment start point is distant from the root.
        assert err[:3].max() < 0.02, err[:3]
        assert err.max() < 0.35, err.max()
        # Decisive equation check: continuing the same Newton iteration
        # from the scheme's 2-step output converges onto the exact root,
        # proving the scheme solves exactly this conservation law.
        cpd, cpv, cl = PARAMS['cpd'], PARAMS['cpv'], PARAMS['cl']
        rv, rd, lv0 = PARAMS['rv'], PARAMS['rd'], PARAMS['lv0']
        cpvmcl = cl - cpv
        eps_g = rd / rv
        q_nk = q[0, 0]
        ah0 = ((cpd * (1.0 - q_nk) + cl * q_nk) * T[0, 0]
               + q_nk * (lv0 - cpvmcl * (T[0, 0] - 273.15)) + gz[0, 0])
        # reconstruct tg from tp: tp = (ah0 - (cl-cpd) q_nk T - gz
        #                               - alv qg)/cpd, so invert per level
        idxs = range(3, nz - 4)
        for i in idxs:
            te, pp, gg = T[0, i], p[0, i], gz[0, i]
            alv = lv0 - cpvmcl * (te - 273.15)
            tg = tp[i]
            # recover the iterate qg from the tp identity, then refine
            qg = (ah0 - (cl - cpd) * q_nk * te - gg
                  - cpd * tp[i]) / alv
            for _ in range(30):
                s = 1.0 / (cpd + alv * alv * qg / (rv * te * te))
                ahg = cpd * tg + (cl - cpd) * q_nk * te + alv * qg + gg
                tg = tg + s * (ah0 - ahg)
                tc = tg - 273.15
                if tc >= 0.0:
                    es = 6.112 * np.exp(17.67 * tc / (243.5 + tc))
                else:
                    es = np.exp(23.33086 - 6111.72784 / tg
                                + 0.15215 * np.log(tg))
                qg = eps_g * es / max(pp - es * (1.0 - eps_g), 1e-30)
            tp_converged = (ah0 - (cl - cpd) * q_nk * te - gg
                            - alv * qg) / cpd
            assert abs(tp_converged - exact[i]) < 1e-6, (
                i, tp_converged, exact[i])

    def test_dry_adiabat_below_cloud_base(self):
        T, q, qs, p, ph = moist_sounding()
        gz = geopotential(T, q, p, ph, PARAMS)
        nz = T.shape[1]
        nk = np.array([0], np.int32)
        icb = np.array([4], np.int32)
        tp, tvp, clw = lifted_parcel(
            jnp.asarray(T), jnp.asarray(q), jnp.asarray(qs),
            jnp.asarray(p), jnp.asarray(gz), jnp.asarray(nk),
            jnp.asarray(icb), nz - 3, PARAMS)
        tp, clw = np.asarray(tp)[0], np.asarray(clw)[0]
        cpd, cpv = PARAMS['cpd'], PARAMS['cpv']
        cpp = cpd * (1.0 - q[0, 0]) + q[0, 0] * cpv
        expected = T[0, 0] - (gz[0] - gz[0, 0]) / cpp
        np.testing.assert_allclose(tp[:4], expected[:4], rtol=1e-12)
        assert (clw[:4] == 0.0).all()

    def test_condensate_positive_above_lcl(self):
        T, q, qs, p, ph = moist_sounding()
        gz = geopotential(T, q, p, ph, PARAMS)
        nz = T.shape[1]
        tp, tvp, clw = lifted_parcel(
            jnp.asarray(T), jnp.asarray(q), jnp.asarray(qs),
            jnp.asarray(p), jnp.asarray(gz),
            jnp.asarray([0], jnp.int32), jnp.asarray([3], jnp.int32),
            nz - 3, PARAMS)
        clw = np.asarray(clw)[0]
        # a moist tropical boundary-layer parcel condenses on ascent
        assert clw[4:12].min() > 1e-4


class TestConvectingColumnIdentities:
    @pytest.fixture(scope='class')
    def result(self):
        T, q, qs, p, ph = moist_sounding(ncol=4)
        # perturb the boundary layer warm/moist so convection triggers
        T[:, 0] += np.array([1.0, 2.0, 1.5, 0.5])
        q[:, 0] = 0.95 * qs[:, 0]
        out = emanuel_convect(
            jnp.asarray(T), jnp.asarray(q), jnp.asarray(qs),
            jnp.zeros_like(jnp.asarray(T)) + 5.0,
            jnp.zeros_like(jnp.asarray(T)),
            jnp.asarray(p), jnp.asarray(ph),
            jnp.full((4,), 0.01), 300.0, T.shape[1] - 3, PARAMS)
        return T, q, qs, p, ph, {k: np.asarray(v) for k, v in out.items()}

    def test_scheme_convects(self, result):
        T, q, qs, p, ph, out = result
        assert (out['precip'] > 0.1).any(), out['precip']
        assert np.abs(out['ft']).max() > 1e-6

    def test_enthalpy_neutrality(self, result):
        """CONVECT's final correction enforces sum((cpn ft + lv fq) dp)
        = 0 over the convecting depth exactly (convect43c.f90 energy
        adjustment); the whole-grid rewrite must preserve it."""
        T, q, qs, p, ph, out = result
        cpd, cpv = PARAMS['cpd'], PARAMS['cpv']
        cl, lv0 = PARAMS['cl'], PARAMS['lv0']
        cpn = cpd * (1.0 - q) + cpv * q
        lv = lv0 - (cl - cpv) * (T - 273.15)
        dph = ph[:, :-1] - ph[:, 1:]
        ent = np.sum((cpn * out['ft'] + lv * out['fq']) * dph, axis=1)
        scale = np.sum(np.abs(cpn * out['ft'] * dph), axis=1) + 1e-30
        assert (np.abs(ent) / scale < 1e-10).all(), ent / scale

    def test_water_budget_matches_precip(self, result):
        """Column drying integrates to the surface precipitation rate
        (PRECIP accumulates wt*water through the lowest interface,
        convect43c.f90:421; fq carries the compensating drying)."""
        T, q, qs, p, ph, out = result
        g = PARAMS['g']
        dph = ph[:, :-1] - ph[:, 1:]
        # column water tendency, kg/m^2/s (dp in mb -> *100/g)
        dW = np.sum(out['fq'] * dph, axis=1) * 100.0 / g
        precip_rate = out['precip'] / 86400.0  # mm/day -> kg/m^2/s
        conv = out['precip'] > 0.1
        assert conv.any()
        rel = np.abs(dW[conv] + precip_rate[conv]) / precip_rate[conv]
        # the scheme is not exactly water-closed (subcloud evaporation
        # and the inb spreading move water without reaching the
        # surface); measured imbalance on convecting soundings is <20%
        assert (rel < 0.2).all(), rel