"""Additional reference-behavior coverage: RH, surface heat flow, tropopause
edge cases, photon scale factor, rc cold-trap pre-check."""

import numpy as np
import pytest

from clima_tpu.data import make_template_dir, write_settings_yaml
from clima_tpu.adiabat import AdiabatClimate
from clima_tpu.physics import saturation


@pytest.fixture(scope="module")
def template(tmp_path_factory):
    root = tmp_path_factory.mktemp("template_more")
    return make_template_dir(str(root), nz=16, n_zenith=1)


@pytest.fixture(scope="module")
def c(template):
    c = AdiabatClimate(
        template["species"], template["settings"], template["star"], template["datadir"]
    )
    c.verbose = False
    return c


def P_i_of(c, **kw):
    P_i = np.full(c.sp.ng, 1.0e-15)
    for name, v in kw.items():
        P_i[c.species_names.index(name)] = v
    return P_i


def test_relative_humidity_scales_h2o(c):
    P_i = P_i_of(c, H2O=270.0e6, N2=1.0e6)
    c.RH[:] = 1.0
    c.make_profile(290.0, P_i)
    f_full = c.f_i_surf[c.species_names.index("H2O")]
    c.RH[:] = 0.5
    c.make_profile(290.0, P_i)
    f_half = c.f_i_surf[c.species_names.index("H2O")]
    c.RH[:] = 1.0
    assert f_half < f_full
    # surface H2O partial pressure = RH * Psat exactly
    iH2O = c.species_names.index("H2O")
    psat = float(np.asarray(saturation.sat_pressure(c.sp.sat, 290.0))[iH2O])
    np.testing.assert_allclose(f_half * c.P_surf, 0.5 * psat, rtol=1e-8)


def test_surface_heat_flow_shifts_balance(c):
    P_i = P_i_of(c, H2O=270.0e6, N2=1.0e6, CO2=400.0)
    c.surface_heat_flow = 0.0
    T0 = c.surface_temperature(P_i, T_guess=280.0)
    c.surface_heat_flow = 5.0e4  # mW/m^2 of internal heating
    T1 = c.surface_temperature(P_i, T_guess=T0)
    c.surface_heat_flow = 0.0
    assert T1 > T0  # internal heat warms the surface


def test_no_tropopause_found(c):
    P_i = P_i_of(c, N2=1.0e6, CO2=400.0)
    old = c.T_trop
    c.T_trop = 1.0  # unreachably cold
    try:
        c.make_profile(300.0, P_i)
        assert c.P_trop < 0  # no tropopause identified (general.f90:329-331)
    finally:
        c.T_trop = old


def test_photon_scale_factor(template):
    import os

    settings_mars = os.path.join(
        os.path.dirname(template["settings"]), "settings_mars.yaml"
    )
    write_settings_yaml(settings_mars, nz=16, n_zenith=1, photon_scale_factor=0.4286)
    c2 = AdiabatClimate(
        template["species"], settings_mars, template["star"], template["datadir"]
    )
    c2.verbose = False
    c_full = AdiabatClimate(
        template["species"], template["settings"], template["star"], template["datadir"]
    )
    np.testing.assert_allclose(
        c2.rad.bolometric_flux(), 0.4286 * c_full.rad.bolometric_flux(), rtol=1e-12
    )


def test_rc_surface_cold_trap_precheck(c):
    """A supersaturated-at-surface gas under a near-isothermal radiative
    profile gets demoted to dry at the surface (rc.f90:416-427)."""
    P_i = P_i_of(c, H2O=270.0e6, N2=1.0e6)
    c.convecting_with_below = np.zeros(c.nz, dtype=bool)
    c._set_convecting_zones(c.convecting_with_below)
    # isothermal prescribed profile: f = Psat/P would increase upward -> dry
    T_in = np.full(c.nz + 1, 285.0)
    c.make_profile_rc(P_i, T_in)
    iH2O = c.species_names.index("H2O")
    f = c.f_i[:, iH2O]
    # dry behavior: mixing ratio constant (not decreasing like Psat/P would)
    np.testing.assert_allclose(f[1:], f[0], rtol=1e-6)


def test_make_profile_rc_updates_convective_temps(c):
    P_i = P_i_of(c, H2O=270.0e6, N2=1.0e6)
    mask = np.zeros(c.nz, dtype=bool)
    mask[:5] = True
    c._set_convecting_zones(mask)
    T_in = np.linspace(290.0, 210.0, c.nz + 1)
    T_in[1:6] = -1.0  # placeholders for convective layers
    c.make_profile_rc(P_i, T_in)
    assert np.all(c.T[:5] > 0)  # filled from the adiabat
    np.testing.assert_allclose(c.T[5:], T_in[6:], rtol=1e-12)  # radiative kept
    # convective temps follow a decreasing adiabat
    assert np.all(np.diff(c.T[:5]) < 0)
