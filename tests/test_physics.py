import numpy as np
import jax.numpy as jnp
import pytest

from clima_tpu.physics import eqns, water, saturation
from clima_tpu import constants as const


def test_planck_peak_wien():
    # Wien's displacement law: nu_peak = 5.879e10 * T (Hz/K)
    T = 300.0
    nus = np.linspace(1e12, 1e14, 20000)
    B = np.asarray(eqns.planck_fcn(jnp.asarray(nus), T))
    nu_peak = nus[np.argmax(B)]
    np.testing.assert_allclose(nu_peak, 5.879e10 * T, rtol=1e-2)


def test_planck_stefan_boltzmann():
    # integral of pi*B dnu = sigma*T^4
    T = 288.0
    nus = np.linspace(1e9, 8e14, 400000)
    B = np.asarray(eqns.planck_fcn(jnp.asarray(nus), T)) * 1e-3  # -> W
    total = np.pi * np.trapezoid(B, nus)
    np.testing.assert_allclose(total, const.sigma_si * T**4, rtol=1e-3)


def test_zenith_quadrature_integrates_mu():
    # Gauss-Legendre over mu in [0,1]: integral of mu dmu = 0.5
    ang, w = eqns.zenith_angles_and_weights(4)
    mu = np.cos(ang * np.pi / 180.0)
    np.testing.assert_allclose(np.sum(w), 1.0, rtol=1e-12)
    np.testing.assert_allclose(np.sum(mu * w), 0.5, rtol=1e-12)
    np.testing.assert_allclose(np.sum(mu**3 * w), 0.25, rtol=1e-12)


def test_gravity_earth():
    g = eqns.gravity(6.371e8, 5.972e27, 0.0)
    np.testing.assert_allclose(g, 981.0, rtol=1e-2)


def test_heat_capacity_shomate_n2():
    # N2 Shomate from the reference species.yaml; cp(298K) ~ 29.1 J/mol/K
    coeffs = jnp.array([26.09, 8.22, -1.98, 0.16, 0.04, -7.99, 221.02])
    cp = float(eqns.heat_capacity_shomate(coeffs, 298.15))
    np.testing.assert_allclose(cp, 29.1, rtol=1e-2)


def test_press_and_den_isothermal_scale_height():
    nz = 200
    T = jnp.full(nz, 250.0)
    grav = jnp.full(nz, 981.0)
    dz = jnp.full(nz, 1.0e4)  # 100 m layers
    mubar = jnp.full(nz, 28.0)
    P, den = eqns.press_and_den(T, grav, 1.0e6, dz, mubar)
    H = const.N_avo * const.k_boltz * 250.0 / (28.0 * 981.0)
    z = np.asarray(jnp.cumsum(dz) - 0.5 * dz)
    np.testing.assert_allclose(np.asarray(P), 1.0e6 * np.exp(-z / H), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(den), np.asarray(P) / (const.k_boltz * 250.0))


def test_water_svp_boiling_point():
    # SVP at 373.15 K should be ~1 atm (fit anchor P0 at clima_eqns_water.f90:31)
    np.testing.assert_allclose(float(water.sat_pressure_H2O(373.15)), 1.0142e6, rtol=1e-8)
    # ~611 Pa at the triple point (6110 dynes/cm2), fit accuracy a few %
    np.testing.assert_allclose(float(water.sat_pressure_H2O(273.15)), 6.11e3, rtol=0.05)


def test_water_latent_heat():
    # ~2.26e10 erg/g at 373 K, ~2.5e10 at 273 K
    np.testing.assert_allclose(float(water.latent_heat_H2O(373.15)), 2.26e10, rtol=0.05)
    np.testing.assert_allclose(float(water.latent_heat_H2O(274.0)), 2.5e10, rtol=0.02)


def h2o_sat_params():
    # From templates/AdiabatClimate/species.yaml (H2O LinearLatentHeat)
    return saturation.SaturationParams.from_gas_list(
        [
            dict(
                mu=18.01534,
                T_ref=373.15,
                P_ref=1.0142e6,
                T_triple=273.15,
                T_critical=647.0,
                a_v=2.841421e10,
                b_v=-1.399732e7,
                a_s=2.746884e10,
                b_s=4.181527e6,
                a_c=1.793161e12,
                b_c=0.0,
            ),
            None,  # a non-condensible
        ]
    )


def test_saturation_h2o_linear_latent_heat():
    p = h2o_sat_params()
    # anchor: P(T_ref) = P_ref
    psat = np.asarray(saturation.sat_pressure(p, 373.15))
    np.testing.assert_allclose(psat[0], 1.0142e6, rtol=1e-10)
    assert psat[1] == saturation.BIG
    # roughly consistent with the exp-fit H2O module across 250-600 K
    for T in [260.0, 280.0, 300.0, 350.0, 450.0]:
        ps = float(np.asarray(saturation.sat_pressure(p, T))[0])
        ref = float(water.sat_pressure_H2O(T)) if T < 400 else None
        if ref is not None:
            np.testing.assert_allclose(ps, ref, rtol=0.1)


def test_saturation_derivative_vs_fd():
    p = h2o_sat_params()
    T = 300.0
    dPdT = np.asarray(saturation.sat_pressure_derivative(p, T))[0]
    h = 1e-4
    fd = (
        np.asarray(saturation.sat_pressure(p, T + h))[0]
        - np.asarray(saturation.sat_pressure(p, T - h))[0]
    ) / (2 * h)
    np.testing.assert_allclose(dPdT, fd, rtol=1e-6)


def test_latent_heat_regimes():
    p = h2o_sat_params()
    L_below = np.asarray(saturation.latent_heat(p, 270.0))[0]
    L_above = np.asarray(saturation.latent_heat(p, 280.0))[0]
    # sublimation: a_s + b_s*T ; vaporization: a_v + b_v*T
    np.testing.assert_allclose(L_below, 2.746884e10 + 4.181527e6 * 270.0, rtol=1e-12)
    np.testing.assert_allclose(L_above, 2.841421e10 - 1.399732e7 * 280.0, rtol=1e-12)


def test_eddy_for_heat_regimes():
    l, g, T, ad = 1e5, 981.0, 280.0, 1e-4
    # strongly unstable
    kh = float(eqns.eddy_for_heat(l, g, T, -3 * ad, ad))
    expect = l**2 * np.sqrt((g / T) * (2 * ad))
    np.testing.assert_allclose(kh, expect, rtol=1e-10)
    # stable
    assert float(eqns.eddy_for_heat(l, g, T, 0.0, ad)) == 0.0


def test_heat_redistribution_terms():
    # Koll 2022 f in (5/12 bound): f in [0.25, 2/3]
    k = float(eqns.k_term_heat_redistribution(6.371e8, 981.0, 0.2, 28.0, 1.0e7, 2.0, 1.9e-3))
    assert k > 0
    f = float(eqns.f_heat_redistribution(1.0, 1.0e6, 300.0, k))
    assert 0.25 <= f <= 2.0 / 3.0
