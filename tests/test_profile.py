import numpy as np
import jax.numpy as jnp
import pytest

from clima_tpu.adiabat.profile import (
    AdiabatParams,
    make_profile_core,
    mixing_ratios,
    lapse_rate_moist,
    surface_classification,
)
from clima_tpu.adiabat.altitude import compute_altitude_core
from clima_tpu.config import load_species
from clima_tpu.data import write_species_yaml
from clima_tpu.physics import saturation
from clima_tpu import constants as const


@pytest.fixture(scope="module")
def species(tmp_path_factory):
    p = tmp_path_factory.mktemp("sp") / "species.yaml"
    write_species_yaml(str(p))
    return load_species(str(p))


def make_params(species, nz=50, P_top=1.0, substeps=6):
    return AdiabatParams(
        gas_masses=jnp.asarray(species.gas_masses),
        thermo=species.thermo,
        sat=species.sat,
        nz=nz,
        planet_mass=5.972e27,
        planet_radius=6.371e8,
        P_top=P_top,
        substeps=substeps,
    )


def test_dry_adiabat_analytic(species):
    """Pure N2 column (no condensation): T follows T0*(P/P0)^(R/cp)."""
    par = make_params(species, nz=50, P_top=1.0e3)
    ng = species.ng
    RH = jnp.ones(ng)
    P_i = np.zeros(ng)
    iN2 = species.gas_names.index("N2")
    P_i[iN2] = 1.0e6
    T_surf = 300.0
    out = make_profile_core(par, RH, T_surf, jnp.asarray(P_i), T_trop=10.0)
    P_e = np.asarray(out["P_e"])
    T_e = np.asarray(out["T_e"])
    # N2 cp ~ 29.1 J/mol/K near 300K but varies; use mean cp over the range
    from clima_tpu.config.species import heat_capacity

    # high-accuracy scipy oracle for dlnT/dlnP = R/cp(T)
    from scipy.integrate import solve_ivp

    def rhs(lnP, lnT):
        cp = float(np.asarray(heat_capacity(species.thermo, np.exp(lnT[0])))[iN2])
        return [const.Rgas_si / cp]

    sol = solve_ivp(
        rhs, (np.log(P_e[0]), np.log(P_e[-1])), [np.log(T_surf)],
        t_eval=np.log(P_e), rtol=1e-11, atol=1e-13, method="DOP853",
    )
    T_expect = np.exp(sol.y[0])
    np.testing.assert_allclose(T_e, T_expect, rtol=1e-6)
    assert float(out["P_trop"]) < 0  # T_trop=10K never reached


def test_tropopause_isothermal(species):
    par = make_params(species, nz=50, P_top=1.0)
    ng = species.ng
    RH = jnp.ones(ng)
    P_i = np.zeros(ng)
    P_i[species.gas_names.index("N2")] = 1.0e6
    out = make_profile_core(par, RH, 300.0, jnp.asarray(P_i), T_trop=200.0)
    T_e = np.asarray(out["T_e"])
    P_e = np.asarray(out["P_e"])
    P_trop = float(out["P_trop"])
    assert P_trop > 0
    above = P_e < P_trop
    np.testing.assert_allclose(T_e[above], 200.0, rtol=1e-12)
    # T at the tropopause is continuous
    assert T_e[~above].min() >= 200.0 - 1e-6


def test_moist_h2o_profile(species):
    """Ocean world: H2O condensing at the surface, N2 background."""
    par = make_params(species, nz=60, P_top=10.0)
    ng = species.ng
    RH = jnp.ones(ng)
    iH2O = species.gas_names.index("H2O")
    iN2 = species.gas_names.index("N2")
    P_i = np.zeros(ng)
    P_i[iH2O] = 10.0e6  # 10 bar requested -> ocean forms
    P_i[iN2] = 1.0e6
    T_surf = 320.0
    out = make_profile_core(par, RH, T_surf, jnp.asarray(P_i), T_trop=180.0)
    psat_surf = float(np.asarray(saturation.sat_pressure(species.sat, T_surf))[iH2O])
    # surface H2O partial pressure capped at saturation; rest in the ocean
    np.testing.assert_allclose(float(out["P_surf"]), psat_surf + 1.0e6, rtol=1e-10)
    N_surf = np.asarray(out["N_surface"])
    grav = 981.9
    expect_N = (10.0e6 - psat_surf) / (species.gas_masses[iH2O] * grav)
    np.testing.assert_allclose(N_surf[iH2O], expect_N, rtol=1e-2)
    # H2O mixing ratio follows Psat/P in the lower atmosphere
    P_e = np.asarray(out["P_e"])
    T_e = np.asarray(out["T_e"])
    f_e = np.asarray(out["f_i_e"])
    for lev in [1, 5, 10]:
        psat = float(np.asarray(saturation.sat_pressure(species.sat, T_e[lev]))[iH2O])
        np.testing.assert_allclose(f_e[lev, iH2O], min(psat / P_e[lev], 1.0), rtol=1e-8)
    # moist lapse rate is shallower than dry near the surface
    dry_slope = const.Rgas_si / 29.1
    slope = (np.log(T_e[0]) - np.log(T_e[1])) / (np.log(P_e[0]) - np.log(P_e[1]))
    assert slope < dry_slope


def test_dry_gas_reaches_saturation_aloft(species):
    """Subsaturated surface H2O switches to condensing at altitude (cold trap)."""
    par = make_params(species, nz=80, P_top=1.0e2)
    ng = species.ng
    RH = jnp.ones(ng)
    iH2O = species.gas_names.index("H2O")
    iN2 = species.gas_names.index("N2")
    P_i = np.zeros(ng)
    P_i[iH2O] = 0.01e6  # 1% H2O, subsaturated at 320K
    P_i[iN2] = 1.0e6
    out = make_profile_core(par, RH, 320.0, jnp.asarray(P_i), T_trop=150.0)
    f_e = np.asarray(out["f_i_e"])
    P_e = np.asarray(out["P_e"])
    T_e = np.asarray(out["T_e"])
    # dry at the surface
    psat0 = float(np.asarray(saturation.sat_pressure(species.sat, 320.0))[iH2O])
    assert 0.01e6 < psat0
    f0 = f_e[0, iH2O]
    np.testing.assert_allclose(f0, 0.01e6 / 1.01e6, rtol=1e-10)
    # at altitude, H2O hits saturation and follows psat/P
    mid = np.argmin(np.abs(T_e - 250.0))
    psat_mid = float(np.asarray(saturation.sat_pressure(species.sat, T_e[mid]))[iH2O])
    np.testing.assert_allclose(f_e[mid, iH2O], psat_mid / P_e[mid], rtol=1e-6)
    assert f_e[mid, iH2O] < f0


def test_altitude_isothermal_analytic(species):
    nz = 60
    P = np.geomspace(0.9e6, 1.0e3, nz)  # ground-up decreasing
    T = np.full(nz, 270.0)
    mubar = np.full(nz, 28.0134)
    out = compute_altitude_core(
        jnp.asarray(P), jnp.asarray(T), jnp.asarray(mubar),
        1.0e6, 270.0, 28.0134, 0.5e3, 5.972e27, 6.371e8,
    )
    z = np.asarray(out["z"])
    # compare with constant-gravity scale height (allow small g(z) deviation)
    g0 = 981.9
    H = const.Rgas * 270.0 / (g0 * 28.0134)
    z_expect = -H * np.log(P / 1.0e6)
    np.testing.assert_allclose(z, z_expect, rtol=2e-2)
    assert np.all(np.asarray(out["dz"]) > 0)
    np.testing.assert_allclose(float(out["gravity_surf"]), 981.9, rtol=1e-3)


def test_altitude_reference_pressure(species):
    nz = 40
    P = np.geomspace(0.9e6, 1.0e3, nz)
    T = np.full(nz, 270.0)
    mubar = np.full(nz, 28.0)
    out0 = compute_altitude_core(
        jnp.asarray(P), jnp.asarray(T), jnp.asarray(mubar),
        1.0e6, 270.0, 28.0, 0.5e3, 5.972e27, 6.371e8,
    )
    out1 = compute_altitude_core(
        jnp.asarray(P), jnp.asarray(T), jnp.asarray(mubar),
        1.0e6, 270.0, 28.0, 0.5e3, 5.972e27, 6.371e8,
        reference_pressure=1.0e5,
    )
    # z stays surface-anchored in both cases
    assert abs(float(out1["z"][0]) - float(out0["z"][0])) < 1e3
    # gravity at the reference level equals the nominal surface gravity
    zref_idx = np.argmin(np.abs(P - 1.0e5))
    g_at_ref = float(np.asarray(out1["gravity"])[zref_idx])
    np.testing.assert_allclose(g_at_ref, 981.9, rtol=2e-3)
