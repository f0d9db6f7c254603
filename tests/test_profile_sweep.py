"""Profile-accuracy sweep + substep convergence control (VERDICT r1 item 7).

The reference resolves adiabats with an adaptive dop853 integrator at
rtol=1e-9 and locates dry->condensing switches with dense-output events
(clima_adiabat_general.f90:274-513). The TPU build integrates fixed RK4
substeps per log-P interval; this suite pins that scheme against an
independent scipy-DOP853 oracle of the same lapse-rate ODE at rtol=1e-11
across hard cases (H2O-dominated near-critical, CO2-condensing Mars-like,
multi-condensible, cold-trap switching) and T_surf 170-580 K, and measures
the convergence order of the ``substeps`` knob.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

from clima_tpu.adiabat.profile import (
    AdiabatParams,
    make_profile_core,
    lapse_rate_moist,
    update_mask,
    surface_classification,
)
from clima_tpu.config import load_species
from clima_tpu.data import write_species_yaml


@pytest.fixture(scope="module")
def species(tmp_path_factory):
    p = tmp_path_factory.mktemp("sp_sweep") / "species.yaml"
    write_species_yaml(str(p))
    return load_species(str(p))


def make_params(species, nz, P_top, substeps):
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


def oracle_T_e(par, RH, T_surf, P_i_surf, T_trop):
    """Adaptive DOP853 integration of dlnT/dlnP on the same edge grid.

    The condensing set is evaluated POINTWISE at every RHS call (the
    fixed-point characterization the scan formulation relies on), so this
    oracle is independent of the substep/level march: its accuracy is set
    only by scipy's rtol=1e-11 adaptive control — the analogue of the
    reference's dop853 at rtol=1e-9.
    """
    RH = jnp.asarray(RH)
    _, _, mask0, r_dry = surface_classification(par, RH, T_surf, jnp.asarray(P_i_surf))
    P_i_atm, _, _, _ = surface_classification(par, RH, T_surf, jnp.asarray(P_i_surf))
    P_surf = float(np.sum(np.asarray(P_i_atm)))
    ne = 2 * par.nz + 1
    logP = np.linspace(np.log(P_surf), np.log(par.P_top), ne)

    point_mask = jax.jit(lambda P, T: update_mask(par, RH, mask0, r_dry, P, T))
    lapse = jax.jit(
        lambda m, P, T: lapse_rate_moist(par, RH, m, r_dry, P, T)
    )

    def rhs(lnP, y):
        P = np.exp(lnP)
        T = np.exp(y[0])
        m = point_mask(P, T)
        return [float(lapse(m, P, T))]

    def hit_trop(lnP, y):
        return y[0] - np.log(T_trop)

    hit_trop.terminal = True
    hit_trop.direction = -1

    sol = solve_ivp(
        rhs, (logP[0], logP[-1]), [np.log(float(T_surf))], t_eval=logP,
        rtol=1e-11, atol=1e-13, method="DOP853", events=hit_trop,
    )
    T_e = np.full(ne, T_trop)
    T_e[: sol.y.shape[1]] = np.exp(sol.y[0])
    return T_e


CASES = [
    # (label, T_surf, T_trop, partials in bar: dict)
    ("h2o_dominated_320", 320.0, 180.0, {"H2O": 5.0, "N2": 0.1}),
    ("h2o_dominated_450", 450.0, 200.0, {"H2O": 100.0, "N2": 1.0}),
    ("h2o_near_critical_580", 580.0, 250.0, {"H2O": 250.0, "N2": 1.0}),
    ("co2_condensing_mars_170", 170.0, 120.0, {"CO2": 2.0, "N2": 0.05}),
    ("multi_condensible_250", 250.0, 140.0, {"H2O": 0.005, "CO2": 2.0, "N2": 0.5}),
    ("cold_trap_switch_300", 300.0, 160.0, {"H2O": 0.02, "N2": 1.0}),
]


@pytest.mark.parametrize("label,T_surf,T_trop,bars", CASES,
                         ids=[c[0] for c in CASES])
def test_profile_sweep_vs_dop853(species, label, T_surf, T_trop, bars):
    nz = 40
    P_top = max(1.0e-5 * sum(bars.values()) * 1.0e6, 1.0e2)
    par = make_params(species, nz=nz, P_top=P_top, substeps=6)
    ng = species.ng
    P_i = np.zeros(ng)
    for name, bar in bars.items():
        P_i[species.gas_names.index(name)] = bar * 1.0e6
    RH = np.ones(ng)

    out = make_profile_core(par, jnp.asarray(RH), T_surf, jnp.asarray(P_i), T_trop)
    T_e = np.asarray(out["T_e"])
    assert np.isfinite(T_e).all(), f"{label}: non-finite profile"

    T_ref = oracle_T_e(par, RH, T_surf, P_i, T_trop)
    rel = np.abs(T_e - T_ref) / T_ref
    # smooth regions sit at ~1e-8; secant-located events (condensation
    # onsets, latent-heat kinks, tropopause) limit the worst case.
    assert rel.max() < 5.0e-6, f"{label}: max rel err {rel.max():.2e}"


def test_substeps_convergence_order(species):
    """Error vs the DOP853 oracle decays ~4th order in substeps (RK4)."""
    nz = 20
    par0 = make_params(species, nz=nz, P_top=1.0e3, substeps=1)
    ng = species.ng
    P_i = np.zeros(ng)
    P_i[species.gas_names.index("H2O")] = 5.0e6
    P_i[species.gas_names.index("N2")] = 1.0e6
    RH = np.ones(ng)
    T_surf, T_trop = 330.0, 10.0  # no tropopause: smooth moist adiabat

    T_ref = oracle_T_e(par0, RH, T_surf, P_i, T_trop)

    errs = []
    for sub in (1, 2, 4, 8):
        par = make_params(species, nz=nz, P_top=1.0e3, substeps=sub)
        out = make_profile_core(par, jnp.asarray(RH), T_surf, jnp.asarray(P_i), T_trop)
        errs.append(np.abs(np.asarray(out["T_e"]) - T_ref).max() / T_surf)
    errs = np.array(errs)
    assert np.all(np.diff(errs) < 0), f"errors not decreasing: {errs}"
    # observed order between successive doublings; RK4 -> ~4
    orders = np.log2(errs[:-1] / errs[1:])
    assert orders.min() > 3.0, f"convergence order too low: {orders} (errs {errs})"
    assert errs[-1] < 5.0e-9


def test_substeps_knob_on_facade(species, tmp_path):
    """AdiabatClimate exposes substeps; raising it changes/refines profiles."""
    from clima_tpu.data import make_template_dir
    from clima_tpu.adiabat import AdiabatClimate

    t = make_template_dir(str(tmp_path), nz=12, n_zenith=1)
    c = AdiabatClimate(t["species"], t["settings"], t["star"], t["datadir"],
                       substeps=2)
    assert c.substeps == 2
    P_i = np.full(c.sp.ng, 1.0e-15)
    P_i[c.species_names.index("H2O")] = 270.0e6
    P_i[c.species_names.index("N2")] = 1.0e6
    c.make_profile(300.0, P_i)
    T_lo = c.T.copy()
    c.substeps = 12
    assert c.substeps == 12
    c.make_profile(300.0, P_i)
    T_hi = c.T.copy()
    # refined integration changes the profile but only slightly
    assert not np.array_equal(T_lo, T_hi)
    np.testing.assert_allclose(T_lo, T_hi, rtol=1e-4)
    with pytest.raises(Exception):
        c.substeps = 0
