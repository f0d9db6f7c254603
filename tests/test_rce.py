"""RCE tests (scope of tests/test_adiabat.f90:163-252 test_RCE)."""

import numpy as np
import pytest

from clima_tpu.data import make_template_dir
from clima_tpu.adiabat import (
    AdiabatClimate,
    RCE_SOLVE_PTC_THEN_HYBRJ,
    RCE_SOLVE_HYBRJ_THEN_PTC_THEN_HYBRJ,
)


@pytest.fixture(scope="module")
def template(tmp_path_factory):
    root = tmp_path_factory.mktemp("template_rce")
    # RCE test config: nz, 1 zenith angle (settings_RCE_test.yaml)
    return make_template_dir(str(root), nz=20, n_zenith=1, surface_albedo=0.3)


@pytest.fixture(scope="module")
def c(template):
    c = AdiabatClimate(
        template["species"], template["settings"], template["star"], template["datadir"]
    )
    c.verbose = False
    return c


def P_i_earth(c):
    P_i = np.full(c.sp.ng, 1.0e-15)
    P_i[c.species_names.index("H2O")] = 270.0e6
    P_i[c.species_names.index("CO2")] = 400.0
    P_i[c.species_names.index("N2")] = 1.0e6
    return P_i


def test_make_profile_rc_radiative(c):
    """All-radiative mask: prescribed T is preserved; only z integrated."""
    P_i = P_i_earth(c)
    c.convecting_with_below = np.zeros(c.nz, dtype=bool)
    c._set_convecting_zones(c.convecting_with_below)
    T_in = np.linspace(280.0, 200.0, c.nz + 1)
    c.make_profile_rc(P_i, T_in)
    np.testing.assert_allclose(c.T, T_in[1:], rtol=1e-12)
    assert np.all(c.dz > 0)
    np.testing.assert_allclose(np.sum(c.f_i, axis=1), 1.0, rtol=1e-8)


def test_make_profile_rc_convective_matches_make_profile(c):
    """All-convective mask reproduces make_profile's adiabat."""
    P_i = P_i_earth(c)
    c.make_profile(285.0, P_i)
    # make_profile tropopause: only layers below P_trop convect
    T_ref = c.T.copy()
    P_ref = c.P.copy()

    mask = np.ones(c.nz, dtype=bool)
    c._set_convecting_zones(mask)
    T_in = np.concatenate([[285.0], np.full(c.nz, -1.0)])
    c.make_profile_rc(P_i, T_in)
    np.testing.assert_allclose(c.P, P_ref, rtol=1e-10)
    # the rc adiabat has no tropopause clamp, so compare only below the
    # reference profile's tropopause (where T_ref > T_trop)
    below = T_ref > c.T_trop + 0.5
    assert np.sum(below) >= 2
    np.testing.assert_allclose(c.T[below], T_ref[below], rtol=1e-4)


def test_rce_converges(c):
    P_i = P_i_earth(c)
    T_surf = c.surface_temperature(P_i, T_guess=280.0)
    T_guess = c.T.copy()
    converged = c.RCE(P_i, T_surf, T_guess)
    assert converged
    # energy balance: max|F/F0| below tolerance at every active DOF
    from clima_tpu.adiabat.rce import _objective, _flux_metrics

    x = np.empty(len(c._inds_Tx))
    x[0] = c.T_surf
    for k in range(1, len(c._inds_Tx)):
        x[k] = c.T[c._inds_Tx[k] - 2]
    dFdt, _ = _objective(c, P_i, x)
    _, max_ratio = _flux_metrics(c, dFdt)
    assert max_ratio < 10 * c.xtol_rc
    # physically sensible result
    assert 150.0 < c.T_surf < 500.0
    assert np.all(c.T > 100.0) and np.all(c.T < 500.0)


def test_rce_strategy_2_warm_start(c):
    """Strategy 2 (PTC->HYBRJ) seeded from the previous solution (warm start)."""
    P_i = P_i_earth(c)
    old_strategy = c.rce_solve_strategy
    c.rce_solve_strategy = RCE_SOLVE_PTC_THEN_HYBRJ
    try:
        converged = c.RCE(
            P_i, c.T_surf, c.T, convecting_with_below=c.convecting_with_below
        )
        assert converged
    finally:
        c.rce_solve_strategy = old_strategy


def test_rce_custom_mixing_ratios(c):
    """Custom prescribed-mix species through RCE (test_adiabat.f90:221-252)."""
    P_i = P_i_earth(c)
    P_custom = np.geomspace(2.0e6, 1.0, 20)
    mix_custom = np.zeros((20, 2))
    iCH4 = 0
    mix_custom[:, 0] = 1.8e-6  # CH4
    mix_custom[:, 1] = 1.0 - 1.8e-6  # N2 fills the rest
    converged = c.RCE(
        P_i, c.T_surf, c.T,
        convecting_with_below=c.convecting_with_below,
        sp_custom=["CH4", "N2"], P_custom=P_custom, mix_custom=mix_custom,
    )
    assert converged
    iCH4 = c.species_names.index("CH4")
    # CH4 follows its prescribed ratio relative to the dry portion
    assert np.all(c.f_i[:, iCH4] > 0)


def test_batched_jacobian_matches_serial(c):
    """The vmapped-IR FD Jacobian must equal the serial fixed-profile path."""
    from clima_tpu.adiabat import rce as R
    import numpy as np

    P_i = P_i_earth(c)
    c.convecting_with_below = np.zeros(c.nz, dtype=bool)
    c.convecting_with_below[:3] = True  # one convective zone for zone-block coverage
    c._set_convecting_zones(c.convecting_with_below)
    x = np.empty(len(c._inds_Tx))
    T_lin = np.linspace(280.0, 200.0, c.nz + 1)
    x[0] = T_lin[0]
    for k in range(1, len(c._inds_Tx)):
        x[k] = T_lin[c._inds_Tx[k] - 1]
    dFdt, dTdt = R._objective(c, P_i, x)

    jac_batched = R._jacobian_from_base(c, x, dTdt)

    # force the serial path
    old = c.compute_solar_in_jac
    try:
        c.compute_solar_in_jac = False
        T_base, T_perts, deltas = R._perturbation_matrix(c, x)
        n = len(x)
        jac_serial = np.empty((n, n))
        for i in range(n):
            _, dTdt_p = R._objective_fixed_profile(c, T_perts[i], False, False)
            jac_serial[:, i] = (dTdt_p - dTdt) / deltas[i]
        R._objective_fixed_profile(c, T_base, False, False)
    finally:
        c.compute_solar_in_jac = old

    np.testing.assert_allclose(jac_batched, jac_serial, rtol=1e-8, atol=1e-12)


@pytest.fixture(scope="module")
def c_part(tmp_path_factory):
    """AdiabatClimate with a particle species (test_adiabat.f90:216-230:
    particle setter feeding RCE)."""
    root = tmp_path_factory.mktemp("template_rce_part")
    t = make_template_dir(str(root), nz=12, n_zenith=1, surface_albedo=0.3,
                          particles=True)
    c = AdiabatClimate(t["species"], t["settings"], t["star"], t["datadir"])
    c.verbose = False
    return c


def test_rce_with_particles(c_part):
    """RCE with a prescribed haze profile: converges and the haze changes
    the equilibrium relative to the particle-free column."""
    c = c_part
    P_i = P_i_earth(c)

    # no particles: baseline equilibrium
    np_ = len(c.particle_names)
    P_nodes = np.geomspace(2.0e6, 1.0, 8)
    c.set_particle_density_and_radii(
        P_nodes, np.zeros((8, np_)), np.full((8, np_), 1.0e-5))
    Ts0 = c.surface_temperature(P_i, T_guess=280.0)
    c.xtol_rc = 1.0e-4  # keep the fixture fast; reference default is 1e-5
    assert c.RCE(P_i, Ts0, c.T)
    T_surf_clear = float(c.T_surf)

    # optically active haze aloft (10 cm^-3 shifts the equilibrium by ~4 K;
    # the synthetic khare1984 haze is strongly absorbing: at 1e2 cm^-3 the
    # greenhouse outruns ISR inside the valid temperature range (no
    # radiative equilibrium to find), and at 5e3 the TOA fluxes decouple
    # from T_surf entirely — see
    # test_surface_temperature_flat_residual_raises)
    c.set_particle_density_and_radii(
        P_nodes, np.full((8, np_), 1.0e1), np.full((8, np_), 1.0e-5))
    Ts1 = c.surface_temperature(P_i, T_guess=T_surf_clear)
    assert c.RCE(P_i, Ts1, c.T)
    assert np.isfinite(c.T_surf) and np.all(np.isfinite(c.T))
    assert abs(float(c.T_surf) - T_surf_clear) > 1.0e-3  # haze has an effect


def test_surface_temperature_flat_residual_raises(c_part):
    """An IR-opaque haze decouples both TOA fluxes from T_surf: the energy-
    balance residual is constant (~0.8*ISR) and MINPACK's xtol test
    'converges' on the unmodified guess. The solver must refuse that
    non-answer loudly instead of returning the guess (caught live in the r5
    nz=50 TPU validation: surface_temperature returned exactly T_guess)."""
    from clima_tpu.utils.errors import ClimaException

    c = c_part
    P_i = P_i_earth(c)
    np_ = len(c.particle_names)
    P_nodes = np.geomspace(2.0e6, 1.0, 8)
    c.set_particle_density_and_radii(
        P_nodes, np.full((8, np_), 5.0e3), np.full((8, np_), 1.0e-5))
    with pytest.raises(ClimaException, match="flat|not small"):
        c.surface_temperature(P_i, T_guess=280.0)
    # restore the fixture's particle-free state for other tests
    c.set_particle_density_and_radii(
        P_nodes, np.zeros((8, np_)), np.full((8, np_), 1.0e-5))
