"""Band-model gas optics and two-stream solvers for the radiation package.

Round-1 radiative core behind the RRTMGLongwave/RRTMGShortwave components:
a 9-band longwave and 2-interval shortwave model with physically-based
absorber scaling, exact band Planck fractions, and delta-two-stream
shortwave transfer.  The full correlated-k RRTMG gas optics (140/112
g-points with tabulated k coefficients, SURVEY.md §2.3) is the planned
upgrade; this module keeps the identical component API and flux/heating
structure so that swap is internal.

All functions are pure jnp over (nz, ncol) column batches and
jit-compatible.

References for the parameterizations used here (public literature):
- band Planck fractions from the series expansion of the blackbody
  integral (e.g. Houghton, The Physics of Atmospheres, App.);
- shortwave H2O/O3 absorption functions after Lacis & Hansen (1974);
- delta-Eddington two-stream after Joseph, Wiscombe & Weinman (1976).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# second radiation constant hc/k in cm K
_C2 = 1.438777

# Longwave band edges (cm^-1) spanning the thermal spectrum; chosen to
# resolve the H2O rotation band, the CO2 15-micron complex, the window,
# the O3 9.6-micron band, and the H2O vibration-rotation band.
LW_BAND_EDGES = np.array(
    [10., 350., 500., 630., 700., 820., 980., 1080., 1400., 3000.])
NUM_LW_BANDS = len(LW_BAND_EDGES) - 1

# band absorption model: tau = a sqrt(U) differenced on the cumulative
# pressure-scaled path (Malkmus strong-line limit, discretization
# invariant) + linear terms for weak lines and the e-type continuum.
# columns: [a_h2o(sqrt), b_h2o(lin), a_co2(sqrt), k_o3(lin), k_cont(lin)]
_LW_K = np.array([
    # 10-350: H2O rotation (strong)
    [0.5, 0.025, 0.0, 0.0, 0.0],
    # 350-500: H2O rotation wing
    [0.35, 0.02, 0.0, 0.0, 0.0],
    # 500-630: H2O wing + CO2 wing
    [0.18, 0.008, 0.4, 0.0, 0.06],
    # 630-700: CO2 15um core
    [0.06, 0.005, 5.0, 0.0, 0.05],
    # 700-820: CO2 wing + weak H2O + continuum
    [0.12, 0.008, 0.6, 0.0, 0.15],
    # 820-980: window (e-type continuum)
    [0.0, 0.008, 0.0, 0.0, 0.30],
    # 980-1080: O3 9.6um
    [0.0, 0.01, 0.0, 320.0, 0.25],
    # 1080-1400: window / weak H2O
    [0.08, 0.008, 0.0, 0.0, 0.08],
    # 1400-3000: H2O vibration-rotation (6.3um)
    [0.42, 0.03, 0.0, 0.0, 0.0],
])

_DIFFUSIVITY = 1.66
_P0 = 1.0e5


def planck_band_fraction(T, nu1, nu2, nterms=10):
    """Fraction of blackbody emission between wavenumbers nu1, nu2 (cm^-1).

    Uses the converging series for the normalized Planck integral
    F(0->x) = (15/pi^4) sum_n e^{-nx} (x^3/n + 3x^2/n^2 + 6x/n^3 + 6/n^4)
    with x = c2 nu / T.
    """
    def cumulative(nu):
        x = _C2 * nu / T
        total = jnp.zeros_like(T)
        for n in range(1, nterms + 1):
            total = total + jnp.exp(-n * x) * (
                x ** 3 / n + 3.0 * x ** 2 / n ** 2
                + 6.0 * x / n ** 3 + 6.0 / n ** 4)
        return (15.0 / jnp.pi ** 4) * total

    # F(0->inf)=1; fraction above nu is cumulative(nu)
    return cumulative(nu1) - cumulative(nu2)


def _sqrt_path_tau(u_layer):
    """Layer taus whose column sum follows sqrt of the cumulative path:
    tau_k = sqrt(U_below) - sqrt(U_above) with U accumulated from TOA."""
    u_rev = jnp.flip(u_layer, axis=0)
    U_from_top = jnp.cumsum(u_rev, axis=0)
    U_below = jnp.flip(U_from_top, axis=0)
    U_above = U_below - u_layer
    return jnp.sqrt(jnp.maximum(U_below, 0.0)) - jnp.sqrt(
        jnp.maximum(U_above, 0.0))


def lw_band_optical_depth(dp, q, co2, o3, p_mid, T):
    """(n_bands, nz, ncol) longwave gas optical depth per layer.

    Absorber paths are pressure-scaled mass paths u = m (p/p0) dp/g; the
    strong-line (Malkmus) terms use sqrt of the cumulative path
    (discretization-invariant), the weak-line/continuum terms are linear
    with a quadratic (e-type) vapor-pressure weighting for the continuum.
    """
    g = 9.80665
    pscale = p_mid / _P0
    u_h2o = q * dp / g * pscale
    u_cont = q * q * dp / g * (pscale ** 2) * 8.0
    u_co2 = co2 * (44.01 / 28.964) * dp / g * pscale
    u_o3 = o3 * (48.0 / 28.964) * dp / g * (pscale ** 0.3)

    sq_h2o = _sqrt_path_tau(u_h2o)
    sq_co2 = _sqrt_path_tau(u_co2)

    k = jnp.asarray(_LW_K, dtype=dp.dtype)
    tau = (k[:, 0, None, None] * sq_h2o[None]
           + k[:, 1, None, None] * u_h2o[None]
           + k[:, 2, None, None] * sq_co2[None]
           + k[:, 3, None, None] * u_o3[None]
           + k[:, 4, None, None] * u_cont[None])
    return tau


def longwave_fluxes(tau_bands, T_mid, T_interface, T_surface,
                    emissivity_bands, sigma):
    """Band-summed longwave up/down fluxes on interfaces.

    tau_bands: (n_bands, nz, ncol); T_mid (nz, ncol);
    T_interface (nz+1, ncol); emissivity_bands (n_bands, ncol).

    Per band: transmission t = exp(-1.66 tau); upward sweep
    F+ = F+ t + B(1-t), seeded by surface emission; downward mirror.
    B is the band-weighted Planck emission sigma T^4 f_band(T).
    """
    nbands, nz, ncol = tau_bands.shape
    edges = LW_BAND_EDGES

    nu1 = jnp.asarray(edges[:-1], dtype=T_mid.dtype)
    nu2 = jnp.asarray(edges[1:], dtype=T_mid.dtype)

    # band Planck source at layer and surface temperatures
    frac_mid = jax.vmap(
        lambda a, b: planck_band_fraction(T_mid, a, b))(nu1, nu2)
    frac_sfc = jax.vmap(
        lambda a, b: planck_band_fraction(T_surface, a, b))(nu1, nu2)
    B_mid = frac_mid * sigma * T_mid[None] ** 4        # (nb, nz, ncol)
    B_sfc = frac_sfc * sigma * T_surface[None] ** 4    # (nb, ncol)

    trans = jnp.exp(-_DIFFUSIVITY * tau_bands)

    # upward sweep (bottom -> top), all bands at once
    up0 = emissivity_bands * B_sfc                     # (nb, ncol)

    def up_step(flux, inputs):
        t, b = inputs
        flux = flux * t + b * (1.0 - t)
        return flux, flux

    _, up_layers = jax.lax.scan(
        up_step, up0, (jnp.moveaxis(trans, 1, 0), jnp.moveaxis(B_mid, 1, 0)))
    up = jnp.concatenate([up0[None], up_layers], axis=0)  # (nz+1, nb, ncol)

    # downward sweep (top -> bottom)
    down_top = jnp.zeros_like(up0)

    def down_step(flux, inputs):
        t, b = inputs
        flux = flux * t + b * (1.0 - t)
        return flux, flux

    _, down_layers = jax.lax.scan(
        down_step, down_top,
        (jnp.moveaxis(trans, 1, 0), jnp.moveaxis(B_mid, 1, 0)),
        reverse=True)
    down = jnp.concatenate([down_layers, down_top[None]], axis=0)

    # reflected downward at surface for non-unit emissivity
    up = up.at[0].add((1.0 - emissivity_bands) * down[0])

    up_total = jnp.sum(up, axis=1)                     # (nz+1, ncol)
    down_total = jnp.sum(down, axis=1)
    return up_total, down_total


# ---------------------------------------------------------------------------
# shortwave
# ---------------------------------------------------------------------------

# visible/UV vs near-infrared split of the solar constant
_SW_VIS_FRACTION = 0.465


def _lacis_hansen_h2o_absorptance(u_slant):
    """Lacis & Hansen (1974) water-vapor absorption A(y), y in g/cm^2 of
    slant path, as a fraction of the TOTAL solar flux."""
    y = jnp.maximum(u_slant, 1e-8)
    return 2.9 * y / ((1.0 + 141.5 * y) ** 0.635 + 5.925 * y)


def sw_gas_optics(dp, q, o3, p_mid, mu0):
    """Two-interval shortwave gas/Rayleigh optics.

    Returns (tau, omega, g_asym) each (2, nz, ncol): interval 0 = UV/VIS
    (O3 absorption + Rayleigh), interval 1 = NIR (H2O absorption).

    The NIR water-vapor layer optical depths are constructed so that the
    cumulative direct-beam absorption reproduces the Lacis & Hansen (1974)
    absorptance function exactly: tau_k = mu0 [ln T(U_top) - ln T(U_bot)]
    with T = 1 - A(U_slant)/f_nir on the cumulative slant path.
    """
    g = 9.80665
    u_h2o_layer = q * dp / g                     # kg/m^2 per layer
    u_o3 = o3 * (48.0 / 28.964) * dp / g

    # Rayleigh optical depth per layer (visible-average)
    tau_ray = 0.097 * dp / _P0

    # ozone: effective grey coefficient giving ~2% solar absorption for a
    # 300 DU column (Chappuis + Hartley-Huggins integrated over the
    # UV/VIS interval)
    tau_o3 = 15.0 * u_o3

    # water vapor: cumulative slant path from TOA (g/cm^2)
    mu0_safe = jnp.maximum(mu0, 1e-3)[None]
    # level 0 is the bottom: accumulate from the top downward
    u_rev = jnp.flip(u_h2o_layer, axis=0)
    U_top_down = jnp.cumsum(u_rev, axis=0)            # at layer bottoms
    U_bot = jnp.flip(U_top_down, axis=0) / 10.0       # kg/m^2 -> g/cm^2
    U_top = U_bot - u_h2o_layer / 10.0
    nir_fraction = 1.0 - _SW_VIS_FRACTION
    A_top = _lacis_hansen_h2o_absorptance(U_top / mu0_safe) / nir_fraction
    A_bot = _lacis_hansen_h2o_absorptance(U_bot / mu0_safe) / nir_fraction
    A_top = jnp.clip(A_top, 0.0, 0.95)
    A_bot = jnp.clip(A_bot, 0.0, 0.95)
    tau_h2o = mu0_safe * (jnp.log(1.0 - A_top) - jnp.log(1.0 - A_bot))
    tau_h2o = jnp.maximum(tau_h2o, 0.0)

    tau_vis = tau_ray + tau_o3
    omega_vis = tau_ray / jnp.maximum(tau_vis, 1e-12)
    tau_nir = 0.25 * tau_ray + tau_h2o
    omega_nir = 0.25 * tau_ray / jnp.maximum(tau_nir, 1e-12)

    tau = jnp.stack([tau_vis, tau_nir])
    omega = jnp.stack([omega_vis, omega_nir])
    g_asym = jnp.zeros_like(tau)
    return tau, omega, g_asym


def delta_two_stream(tau, omega, g_asym, mu0, albedo_direct,
                     albedo_diffuse, incident):
    """Delta-scaled two-stream adding method for one spectral interval.

    tau, omega, g_asym: (nz, ncol) layer properties (level 0 = bottom);
    mu0 (ncol,): cosine of the solar zenith angle; incident (ncol,): TOA
    flux normal to the beam.  Returns (down, up) interface fluxes
    (nz+1, ncol), downward including the direct beam.

    Layer diffuse reflect/transmit from Eddington two-stream
    (Meador & Weaver 1980); direct-beam scattering partitioned with the
    practical backscatter fraction b0 = 1/2 - 3 g mu0/4; layers combined
    with the standard adding equations including multiple reflections.
    """
    # delta scaling (Joseph-Wiscombe-Weinman)
    f = g_asym ** 2
    tau_s = (1.0 - omega * f) * tau
    omega_s = jnp.clip(omega * (1.0 - f) / (1.0 - omega * f), 0.0,
                       0.9999999)
    g_s = (g_asym - f) / (1.0 - f + 1e-12)

    mu0 = jnp.maximum(mu0, 1e-3)[None]

    gamma1 = (7.0 - omega_s * (4.0 + 3.0 * g_s)) / 4.0
    gamma2 = -(1.0 - omega_s * (4.0 - 3.0 * g_s)) / 4.0
    k = jnp.sqrt(jnp.maximum(gamma1 ** 2 - gamma2 ** 2, 1e-12))
    exp_m = jnp.exp(-jnp.minimum(k * tau_s, 50.0))
    denom_dif = k + gamma1 + (k - gamma1) * exp_m ** 2
    r_dif = gamma2 * (1.0 - exp_m ** 2) / denom_dif
    t_dif = 2.0 * k * exp_m / denom_dif

    # direct beam: transmitted fraction and scattered fractions
    t_dir = jnp.exp(-jnp.minimum(tau_s / mu0, 50.0))
    scattered = omega_s * (1.0 - t_dir)
    b0 = jnp.clip(0.5 - 0.75 * g_s * mu0, 0.0, 1.0)
    su = scattered * b0          # scattered upward (layer top)
    sd = scattered * (1.0 - b0)  # scattered downward (layer bottom)

    # ---- adding: accumulate stack reflectances from the surface up ----
    def add_up(carry, inputs):
        R_dir_b, R_dif_b = carry
        r_l, t_l, tdir_l, su_l, sd_l = inputs
        inv = 1.0 / (1.0 - r_l * R_dif_b)
        R_dir = su_l + t_l * inv * (R_dir_b * tdir_l + R_dif_b * sd_l)
        R_dif = r_l + t_l ** 2 * R_dif_b * inv
        return (R_dir, R_dif), (R_dir_b, R_dif_b, inv)

    (R_dir_top, R_dif_top), (R_dir_below, R_dif_below, inv_below) = \
        jax.lax.scan(add_up, (albedo_direct, albedo_diffuse),
                     (r_dif, t_dif, t_dir, su, sd))

    # ---- downward pass from the top -----------------------------------
    def down_pass(carry, inputs):
        S, D = carry
        (r_l, t_l, tdir_l, su_l, sd_l, R_dir_b, R_dif_b, inv) = inputs
        S_bot = S * tdir_l
        D1 = t_l * D + sd_l * S
        U = (R_dir_b * S_bot + R_dif_b * D1) * inv
        D_bot = D1 + r_l * U
        return (S_bot, D_bot), (S_bot, D_bot, U)

    S0 = incident * jnp.maximum(mu0[0], 1e-3)
    D0 = jnp.zeros_like(S0)
    flip = lambda x: jnp.flip(x, axis=0)
    inputs_rev = (flip(r_dif), flip(t_dif), flip(t_dir), flip(su),
                  flip(sd), flip(R_dir_below), flip(R_dif_below),
                  flip(inv_below))
    _, (S_seq, D_seq, U_seq) = jax.lax.scan(down_pass, (S0, D0),
                                            inputs_rev)
    # sequences are ordered top layer -> bottom; build interface arrays
    # (interface 0 = surface)
    down = jnp.concatenate(
        [flip(S_seq + D_seq), (S0 + D0)[None]], axis=0)
    up = jnp.concatenate(
        [flip(U_seq), (S0 * R_dir_top + D0 * R_dif_top)[None]], axis=0)
    return down, up
