"""AdiabatClimate end-to-end tests.

Mirrors the scope of the reference ``tests/test_adiabat.f90`` (minus RCE,
which has its own test module): TOA fluxes, surface_temperature variants,
make_column mass conservation, bg-gas solve, dry-profile consistency, ocean
solubility callbacks, tidally-locked dayside + solve_for_T_trop +
reference_pressure, and output utilities.
"""

import numpy as np
import pytest

from clima_tpu.data import make_template_dir
from clima_tpu.adiabat import AdiabatClimate
from clima_tpu.utils.errors import ClimaException


@pytest.fixture(scope="module")
def template(tmp_path_factory):
    root = tmp_path_factory.mktemp("template_adiabat")
    return make_template_dir(str(root), nz=30, n_zenith=2, particles=False)


@pytest.fixture(scope="module")
def c(template):
    c = AdiabatClimate(
        template["species"], template["settings"], template["star"], template["datadir"]
    )
    c.verbose = False
    return c


def earth_like_P_i(c, P_H2O=270.0e6, P_CO2=400e-6 * 1e6, P_N2=0.78e6):
    ng = c.sp.ng
    P_i = np.full(ng, 1.0e-15)
    P_i[c.species_names.index("H2O")] = P_H2O
    P_i[c.species_names.index("CO2")] = P_CO2
    P_i[c.species_names.index("N2")] = P_N2
    return P_i


def test_make_profile_basic(c):
    P_i = earth_like_P_i(c)
    c.make_profile(280.0, P_i)
    assert c.P_surf > 0
    assert np.all(np.diff(c.P) < 0)
    assert np.all(c.T >= c.T_trop - 1e-8)
    assert np.all(c.dz > 0)
    np.testing.assert_allclose(np.sum(c.f_i, axis=1), 1.0, rtol=1e-8)
    # H2O forms an ocean: surface reservoir positive
    iH2O = c.species_names.index("H2O")
    assert c.N_surface[iH2O] > 0


def test_TOA_fluxes(c):
    P_i = earth_like_P_i(c)
    ISR, OLR = c.TOA_fluxes(280.0, P_i)
    assert ISR > 0 and OLR > 0
    assert np.isfinite(ISR) and np.isfinite(OLR)


def test_surface_temperature(c):
    P_i = earth_like_P_i(c)
    T = c.surface_temperature(P_i, T_guess=280.0)
    assert 150.0 < T < 450.0
    # at the solution, energy balance holds
    ISR, OLR = c.TOA_fluxes(T, P_i)
    np.testing.assert_allclose(ISR, OLR, rtol=1e-5)


def test_make_column_mass_conservation(c):
    ng = c.sp.ng
    N_i = np.full(ng, 1.0e-10)
    N_i[c.species_names.index("H2O")] = 15.0e3  # mol/cm2
    N_i[c.species_names.index("CO2")] = 1.0
    N_i[c.species_names.index("N2")] = 36.0e2
    c.make_column(280.0, N_i)
    N_tot = c.N_atmos + c.N_surface + np.sum(c.N_ocean, axis=1)
    for i in [c.species_names.index(s) for s in ("H2O", "CO2", "N2")]:
        np.testing.assert_allclose(N_tot[i], N_i[i], rtol=1e-6)


def test_make_profile_bg_gas(c):
    P_i = earth_like_P_i(c, P_H2O=1.0e4, P_CO2=400.0, P_N2=1.0)
    c.make_profile_bg_gas(280.0, P_i, 1.0e6, "N2")
    np.testing.assert_allclose(c.P_surf, 1.0e6, rtol=1e-6)


def test_dry_profile_consistency(c):
    """make_profile then make_profile_dry on its output: same T/P/fluxes
    (test_adiabat.f90:104-122)."""
    P_i = earth_like_P_i(c)
    ISR1, OLR1 = c.TOA_fluxes(280.0, P_i)
    P = np.concatenate([[c.P_surf], c.P])
    T = np.concatenate([[c.T_surf], c.T])
    f_i = np.concatenate([[c.f_i_surf], c.f_i], axis=0)
    ISR2, OLR2 = c.TOA_fluxes_dry(P, T, f_i)
    np.testing.assert_allclose(ISR2, ISR1, rtol=2e-2)
    np.testing.assert_allclose(OLR2, OLR1, rtol=2e-2)


def test_ocean_solubility(c):
    """CO2 dissolving in an H2O ocean (test_adiabat.f90:124-143)."""

    def ocean_fcn(T_surf, ng, P_i_bars, args):
        m = np.zeros(ng)
        m[c.species_names.index("CO2")] = 1.0e-2 * P_i_bars[c.species_names.index("CO2")]
        return m

    c.set_ocean_solubility_fcn("H2O", ocean_fcn)
    P_i = earth_like_P_i(c)
    c.make_profile(280.0, P_i)
    iCO2 = c.species_names.index("CO2")
    iH2O = c.species_names.index("H2O")
    assert c.N_ocean[iCO2, iH2O] > 0
    c.ocean_fcns[iH2O] = None


def test_solve_for_T_trop_and_tidally_locked(template):
    c2 = AdiabatClimate(
        template["species"], template["settings"], template["star"], template["datadir"]
    )
    c2.verbose = False
    c2.solve_for_T_trop = True
    c2.tidally_locked_dayside = True
    c2.reference_pressure = 1.0e5
    P_i = np.full(c2.sp.ng, 1.0e-15)
    P_i[c2.species_names.index("H2O")] = 270.0e6
    P_i[c2.species_names.index("CO2")] = 400.0
    P_i[c2.species_names.index("N2")] = 1.0e6
    T = c2.surface_temperature(P_i, T_guess=280.0)
    assert 150.0 < T < 500.0
    # T_trop should now equal the skin temperature at the solution
    tau_LW, k_term, f_term = c2.heat_redistribution_parameters()
    assert np.isfinite(tau_LW) and k_term > 0 and 0.25 <= f_term <= 2.0 / 3.0


def test_albedo_fcn(c):
    calls = []

    def albedo_fcn(T_surf):
        calls.append(T_surf)
        return 0.45

    c.albedo_fcn = albedo_fcn
    P_i = earth_like_P_i(c)
    ISR_a, _ = c.TOA_fluxes(280.0, P_i)
    c.albedo_fcn = None
    c.rad.surface_albedo = np.full(c.rad.sol.nw, 0.25)
    ISR_b, _ = c.TOA_fluxes(280.0, P_i)
    assert len(calls) > 0
    assert ISR_a < ISR_b  # higher albedo -> less absorbed


def test_to_regular_grid_and_out2atmosphere(c, tmp_path):
    P_i = earth_like_P_i(c)
    c.make_profile(280.0, P_i)
    N_before = np.sum(c.densities * c.dz[:, None], axis=0)
    c.to_regular_grid()
    N_after = np.sum(c.densities * c.dz[:, None], axis=0)
    np.testing.assert_allclose(N_after, N_before, rtol=0.05)
    assert np.allclose(np.diff(c.z), c.dz[1:], rtol=1e-8)

    c.make_profile(280.0, P_i)
    fn = str(tmp_path / "atm.txt")
    c.out2atmosphere_txt(fn, np.zeros(c.nz), overwrite=True)
    with open(fn) as f:
        header = f.readline().split()
    assert header[:5] == ["alt", "press", "den", "temp", "eddy"]
    data = np.loadtxt(fn, skiprows=1)
    assert data.shape[0] == c.nz
    with pytest.raises(ClimaException):
        c.out2atmosphere_txt(fn, np.zeros(c.nz), overwrite=False)


def test_input_validation(c):
    with pytest.raises(ClimaException):
        c.make_profile(100.0, earth_like_P_i(c))  # T_surf < T_trop
    with pytest.raises(ClimaException):
        c.make_profile(280.0, np.ones(2))
    with pytest.raises(ClimaException):
        c.make_profile_bg_gas(280.0, earth_like_P_i(c), 1e6, "XYZ")
