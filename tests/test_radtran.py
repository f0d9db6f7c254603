"""End-to-end Radtran tests on a synthetic opacity database.

Mirrors the scope of the reference's ``tests/test_radtran.f90`` (standalone
Radtran on a prescribed column; custom optical property round-trip), with
physical-invariant assertions replacing the missing Fortran oracle.
"""

import numpy as np
import pytest

from clima_tpu.data import make_template_dir
from clima_tpu.radtran import Radtran
from clima_tpu import constants as const
from clima_tpu.physics import eqns


@pytest.fixture(scope="module")
def template(tmp_path_factory):
    root = tmp_path_factory.mktemp("template")
    return make_template_dir(str(root), nz=50, n_zenith=8, particles=True)


@pytest.fixture(scope="module")
def rad(template):
    return Radtran.from_settings(
        _modern_earth_settings(template),
        template["star"],
        num_zenith_angles=8,
        surface_albedo=0.15,
        nz=50,
        datadir=template["datadir"],
    )


def _modern_earth_settings(template):
    # write a settings file with explicit gas list (like templates/ModernEarth)
    import os

    path = os.path.join(os.path.dirname(template["settings"]), "settings_me.yaml")
    with open(path, "w") as f:
        f.write(
            """\
atmosphere-grid:
  bottom: 0.0
  top: 0.7e7
  number-of-layers: 50

planet:
  surface-pressure: 1.013
  planet-mass: 5.972e27
  planet-radius: 6.371e8
  surface-albedo: 0.3
  number-of-zenith-angles: 1

optical-properties:
  species:
    gases: [H2O, CO2, O2, N2, CH4]
    particles: [HCaer]
  k-method: RandomOverlapResortRebin
  opacities: {k-distributions: true, CIA: true, rayleigh: true, photolysis-xs: true,
    water-continuum: MT_CKD, particle-xs: [{name: HCaer, data: khare1984}]}
"""
        )
    return path


def make_column(nz=50, ng=5, T_surf=288.0):
    """Earth-like prescribed column (ground-up)."""
    z, dz = eqns.vertical_grid(0.0, 0.7e7, nz)
    T = np.maximum(T_surf - 6.5e-5 * z, 200.0)
    mubar = np.full(nz, 28.6)
    grav = np.full(nz, 981.0)
    import jax.numpy as jnp

    P, den = [np.asarray(x) for x in eqns.press_and_den(
        jnp.asarray(T), jnp.asarray(grav), 1.013e6, jnp.asarray(dz), jnp.asarray(mubar)
    )]
    # H2O, CO2, O2, N2, CH4
    mix = np.zeros((nz, ng))
    mix[:, 0] = 1e-2 * np.exp(-z / 2e5)  # H2O decreasing
    mix[:, 1] = 400e-6
    mix[:, 2] = 0.21
    mix[:, 4] = 1.8e-6
    mix[:, 3] = 1.0 - mix[:, [0, 1, 2, 4]].sum(axis=1)
    densities = mix * den[:, None]
    return T, P / 1.0e6, densities, dz


def test_radiate_basic(rad):
    T, P, densities, dz = make_column()
    nz = 50
    pdens = np.zeros((nz, 1))
    pdens[:10] = 100.0
    pradii = np.full((nz, 1), 1e-5)
    rad.radiate(288.0, T, P, densities, dz, pdens, pradii)

    # finite everywhere
    for w in (rad.wrk_ir, rad.wrk_sol):
        assert np.all(np.isfinite(w.fup_a))
        assert np.all(np.isfinite(w.fdn_a))
        assert np.all(np.isfinite(w.fup_n))
        assert np.all(np.isfinite(w.fdn_n))
    assert np.all(np.isfinite(rad.f_total))

    # TOA solar downward flux = 0.25 * bolometric (zenith-quadrature of u0 x diurnal 0.5)
    toa_fdn = rad.wrk_sol.fdn_n[-1]
    np.testing.assert_allclose(toa_fdn, 0.25 * rad.bolometric_flux() * 1.0e3, rtol=1e-6)

    # OLR positive, bounded by surface blackbody (greenhouse) and above skin-T emission
    OLR = rad.wrk_ir.fup_n[-1] - rad.wrk_ir.fdn_n[-1]
    sigT4_mW = const.sigma_si * 288.0**4 * 1.0e3
    assert 0 < OLR < 1.05 * sigT4_mW

    # IR fdn at TOA is zero
    np.testing.assert_allclose(rad.wrk_ir.fdn_a[-1, :], 0.0, atol=1e-12)

    # surface upward IR flux is near emissivity*sigma*T^4 (plus small reflected term)
    fup_sfc = rad.wrk_ir.fup_n[0]
    np.testing.assert_allclose(fup_sfc, sigT4_mW, rtol=0.1)


def test_radiate_no_solar(rad):
    T, P, densities, dz = make_column()
    nz = 50
    pdens = np.zeros((nz, 1))
    pradii = np.full((nz, 1), 1e-5)
    rad.radiate(288.0, T, P, densities, dz, pdens, pradii, compute_solar=False)
    assert np.all(np.isfinite(rad.f_total))


def test_toa_fluxes(rad):
    T, P, densities, dz = make_column()
    nz = 50
    pdens = np.zeros((nz, 1))
    pradii = np.full((nz, 1), 1e-5)
    ISR, OLR = rad.TOA_fluxes(288.0, T, P, densities, dz, pdens, pradii)
    assert ISR > 0 and OLR > 0
    # ISR is bounded by the quadrature TOA insolation
    assert ISR < 0.25 * rad.bolometric_flux() * 1.0e3


def test_bolometric_flux_matches_input(rad):
    # star file was scaled to 1361 W/m2 over 50nm-200um; the solar channel
    # band (0.1-6 um) captures most but not all of it
    bf = rad.bolometric_flux()
    assert 0.8 * 1361.0 < bf < 1.05 * 1361.0


def test_set_bolometric_flux(rad):
    old = rad.photon_scale_factor
    rad.set_bolometric_flux(500.0)
    np.testing.assert_allclose(rad.bolometric_flux(), 500.0, rtol=1e-12)
    rad.photon_scale_factor = old


def test_skin_equilibrium_temperature(rad):
    Teq = rad.equilibrium_temperature(0.3)
    Tskin = rad.skin_temperature(0.3)
    np.testing.assert_allclose(Tskin, Teq * 0.5**0.25, rtol=1e-12)
    assert 200.0 < Teq < 300.0


def test_opacities2yaml(rad):
    out = rad.opacities2yaml()
    assert "k-distributions" in out
    assert "H2O" in out
    assert "water-continuum: MT_CKD" in out


def test_custom_optical_properties_roundtrip(rad):
    T, P, densities, dz = make_column()
    nz = 50
    pdens = np.zeros((nz, 1))
    pradii = np.full((nz, 1), 1e-5)
    ISR0, OLR0 = rad.TOA_fluxes(288.0, T, P, densities, dz, pdens, pradii)

    # a strongly absorbing custom haze must change the fluxes
    wv = np.geomspace(150.0, 9e4, 30)
    Pgrid = np.geomspace(1.0e6, 10.0, 20)  # decreasing
    dtau_dz = np.full((20, 30), 1e-6)
    w0 = np.full((20, 30), 0.5)
    g0 = np.full((20, 30), 0.3)
    rad.set_custom_optical_properties(wv, Pgrid, dtau_dz, w0, g0)
    ISR1, OLR1 = rad.TOA_fluxes(288.0, T, P, densities, dz, pdens, pradii)
    assert abs(ISR1 - ISR0) > 1e-6 * abs(ISR0)

    # unsetting returns the original answer
    rad.unset_custom_optical_properties()
    ISR2, OLR2 = rad.TOA_fluxes(288.0, T, P, densities, dz, pdens, pradii)
    np.testing.assert_allclose(ISR2, ISR0, rtol=1e-10)
    np.testing.assert_allclose(OLR2, OLR0, rtol=1e-10)


def test_opacity_reuse(rad):
    T, P, densities, dz = make_column()
    nz = 50
    pdens = np.zeros((nz, 1))
    pradii = np.full((nz, 1), 1e-5)
    ISR0, OLR0 = rad.TOA_fluxes(288.0, T, P, densities, dz, pdens, pradii)
    # same column with compute_opacity=False must reproduce the result
    ISR1, OLR1 = rad.TOA_fluxes(
        288.0, T, P, densities, dz, pdens, pradii, compute_opacity=False
    )
    np.testing.assert_allclose(ISR1, ISR0, rtol=1e-12)
    np.testing.assert_allclose(OLR1, OLR0, rtol=1e-12)


def test_input_validation(rad):
    from clima_tpu.utils.errors import ClimaException

    T, P, densities, dz = make_column()
    with pytest.raises(ClimaException):
        rad.radiate(288.0, T[:-1], P, densities, dz)
    with pytest.raises(ClimaException):
        rad.radiate(288.0, T, P, densities[:, :2], dz)
