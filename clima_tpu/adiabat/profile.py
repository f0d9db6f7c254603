"""Moist multispecies pseudoadiabat construction (Graham et al. 2021 Eq. 1).

Re-implements ``make_profile`` (``src/adiabat/clima_adiabat_general.f90``)
TPU-first. The reference integrates [dT/dP, dz/dP] with an adaptive dop853
integrator and locates dry->condensing switches and the tropopause with
dense-output event detection + Brent root refinement — hostile to XLA.

Key reformulation: in the general adiabat, species switch only dry ->
condensing as altitude increases, and the reference's dry re-partitioning
(``update_f_i_dry``, general.f90:529-546) preserves the relative proportions
of still-dry gases. Hence the condensing set is a *pointwise* fixed point of

    C = { i : f_dry(C) * r_i * P >= RH_i * Psat_i(T) }

with r_i the surface dry proportions — no path dependence. The profile then
integrates level-by-level on the fixed 2*nz+1 log-P grid with a
``lax.scan`` of fixed RK4 substeps; the tropopause crossing is located by
in-substep interpolation and the stratosphere follows the reference's
analytic isothermal hydrostatic solution (general.f90:658-669).

Everything is pure jnp: jit-able, vmap-able over batched columns.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .. import constants as const
from ..config.species import GasThermo, heat_capacity
from ..physics import saturation

__all__ = ["AdiabatParams", "make_profile_core", "mixing_ratios", "lapse_rate_moist",
           "surface_classification"]

F_DRY_MIN = 1.0e-40  # general.f90:566
G_GRAV_CGS = 6.67e-8  # used by the reference's analytic altitude (general.f90:664)


@dataclasses.dataclass(frozen=True)
class AdiabatParams:
    """Static parameters closed over by the profile constructors."""

    gas_masses: jnp.ndarray  # (ng,)
    thermo: GasThermo
    sat: saturation.SaturationParams
    nz: int
    planet_mass: float
    planet_radius: float
    P_top: float
    substeps: int = 4


def mixing_ratios(par: AdiabatParams, RH, mask, r_dry, P, T, T_branch=None):
    """Mixing ratios given the condensing mask (general.f90:548-574).

    mask: (ng,) bool condensing set; r_dry: (ng,) dry proportions
    (normalized over non-condensing gases). Returns (f_i, f_dry).
    """
    psat = RH * saturation.sat_pressure(par.sat, T, T_branch)
    f_cond = jnp.minimum(psat / P, 1.0)
    f_moist = jnp.sum(jnp.where(mask, f_cond, 0.0))
    f_dry = jnp.maximum(1.0 - f_moist, F_DRY_MIN)
    r = jnp.where(mask, 0.0, r_dry)
    r = r / jnp.maximum(jnp.sum(r), 1e-200)
    f_i = jnp.where(mask, f_cond, f_dry * r)
    return f_i, f_dry


def update_mask(par: AdiabatParams, RH, mask, r_dry, P, T):
    """Pointwise fixed point of the condensing set (replaces event detection).

    Gases are added when their dry-extrapolated partial pressure exceeds
    saturation (the root ``P_sat - P_i`` of general.f90:483-513). The set can
    only grow, so ng iterations converge.
    """
    psat = RH * saturation.sat_pressure(par.sat, T)

    def body(m, _):
        f_i, _ = mixing_ratios(par, RH, m, r_dry, P, T)
        P_i = f_i * P
        newly = (~m) & par.sat.has_sat & (P_i > psat)
        return m | newly, None

    mask, _ = jax.lax.scan(body, mask, None, length=par.gas_masses.shape[0])
    return mask


def lapse_rate_moist(par: AdiabatParams, RH, mask, r_dry, P, T, T_branch=None):
    """Graham et al. (2021) Eq. 1 generalized moist lapse rate dlnT/dlnP.

    Mirrors general.f90:576-656 (no-condensate simplification).
    """
    f_i, f_dry = mixing_ratios(par, RH, mask, r_dry, P, T, T_branch)
    cp_i = heat_capacity(par.thermo, T)  # J/(mol K)
    r = jnp.where(mask, 0.0, r_dry)
    r = r / jnp.maximum(jnp.sum(r), 1e-200)
    cp_dry = jnp.sum(jnp.where(mask, 0.0, r * cp_i)) + 1e-300

    L = saturation.latent_heat(par.sat, T, T_branch) * par.gas_masses * 1.0e-7  # J/mol
    Rsi = const.Rgas_si
    beta = L / (Rsi * T)
    first = jnp.sum(jnp.where(mask, f_i * (cp_i - Rsi * beta + Rsi * beta**2), 0.0))
    second = jnp.sum(jnp.where(mask, beta * f_i, 0.0))
    return 1.0 / (
        f_dry * ((cp_dry * f_dry + first) / (Rsi * (f_dry + second))) + second
    )


def _gravity(par: AdiabatParams, z):
    g = const.G_grav * (par.planet_mass / 1.0e3) / ((par.planet_radius + z) / 1.0e2) ** 2
    return g * 1.0e2


def _mubar(par: AdiabatParams, f_i):
    return jnp.sum(f_i * par.gas_masses)


def _rhs(par: AdiabatParams, RH, mask, r_dry, P, u, T_branch=None):
    """RHS of [dT/dP, dz/dP] (general.f90:576-656)."""
    T, z = u[0], u[1]
    dlnT_dlnP = lapse_rate_moist(par, RH, mask, r_dry, P, T, T_branch)
    dT_dP = dlnT_dlnP * (T / P)
    f_i, _ = mixing_ratios(par, RH, mask, r_dry, P, T, T_branch)
    mubar = _mubar(par, f_i)
    grav = _gravity(par, z)
    dz_dP = -(const.Rgas * T) / (grav * P * mubar)
    return jnp.array([dT_dP, dz_dP])


def _rk4(par, RH, mask, r_dry, P0, P1, u, T_branch=None):
    h = P1 - P0
    k1 = _rhs(par, RH, mask, r_dry, P0, u, T_branch)
    k2 = _rhs(par, RH, mask, r_dry, P0 + 0.5 * h, u + 0.5 * h * k1, T_branch)
    k3 = _rhs(par, RH, mask, r_dry, P0 + 0.5 * h, u + 0.5 * h * k2, T_branch)
    k4 = _rhs(par, RH, mask, r_dry, P1, u + h * k3, T_branch)
    return u + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def kink_temps(sat):
    """Temperatures where the RHS is only C0: latent-heat branch switches.

    LinearLatentHeat changes slope at T_triple (sublimation->vaporization)
    and T_critical (->super-critical constant), clima_saturationdata.f90:80-91.
    Integrating a fixed RK4 substep across one of these kinks degrades the
    order to ~1 and breaks convergence; the profile march splits substeps at
    the crossing instead (the same trick as the tropopause event).
    """
    k = jnp.concatenate([jnp.asarray(sat.T_triple), jnp.asarray(sat.T_critical)])
    v = jnp.concatenate([jnp.asarray(sat.has_sat), jnp.asarray(sat.has_sat)])
    return k, v


def _rk4_event_split(par, RH, mask, r_dry, la, lb, u, kinks, kvalid):
    """One RK4 substep over log-P [la, lb], split at the first event crossing.

    Events (the reference's dense-output dop853 roots,
    general.f90:355-513, handled here without adaptive stepping):

    - latent-heat regime kinks: L JUMPS at T_triple (heat of fusion) and
      kinks at T_critical, so a stage evaluation straddling the boundary
      injects O(h) error — observed as total loss of substep convergence.
      Every RK4 piece therefore pins the saturation-regime branch to its own
      side (``T_branch``), making pieces analytic.
    - dry->condensing switches: root ``f_i*P - RH_i*psat_i(T)`` of a
      still-dry species (general.f90:483-513); integrating past the onset
      with the dry lapse rate is O(h).

    The first event's location is refined with two secant iterations on the
    branch-pinned trajectory, and the step restarts on the other side
    (other L branch / grown condensing set). Restores ~4th-order substep
    convergence on profiles with switches (tests/test_profile_sweep.py).
    """
    ng = par.gas_masses.shape[0]
    Pa, Pb = jnp.exp(la), jnp.exp(lb)
    T0 = u[0]
    u1 = _rk4(par, RH, mask, r_dry, Pa, Pb, u, T_branch=T0)
    T1 = u1[0]

    def g_sat(P, T):
        """Per-gas saturation excess f_i*P - RH_i*psat_i under the OLD mask."""
        f_i, _ = mixing_ratios(par, RH, mask, r_dry, P, T, T_branch=T0)
        psat = RH * saturation.sat_pressure(par.sat, T, T_branch=T0)
        return f_i * P - psat

    # --- candidate events with linear-in-theta first estimates ---
    # latent-heat kinks: root T(theta) - K
    crossed_k = kvalid & ((T0 - kinks) * (T1 - kinks) < 0.0)
    denomT = jnp.where(jnp.abs(T0 - T1) > 1e-300, T0 - T1, 1e-300)
    theta_k = jnp.where(crossed_k, (T0 - kinks) / denomT, jnp.inf)
    # condensation onsets: root g_j(theta), g goes negative -> positive
    g0 = g_sat(Pa, T0)
    g1 = g_sat(Pb, T1)
    newly = jnp.asarray(par.sat.has_sat) & (~mask) & (g0 < 0.0) & (g1 >= 0.0)
    denomG = jnp.where(jnp.abs(g0 - g1) > 1e-300, g0 - g1, 1e-300)
    theta_m = jnp.where(newly, g0 / denomG, jnp.inf)

    thetas = jnp.concatenate([theta_k, theta_m])
    j = jnp.argmin(thetas)
    has_event = jnp.isfinite(thetas[j]) & (thetas[j] < 1.0)
    theta0 = jnp.clip(jnp.where(has_event, thetas[j], 0.5), 1e-6, 1.0 - 1e-6)
    is_kink = j < 2 * ng
    K_sel = jnp.where(is_kink, kinks[jnp.minimum(j, 2 * ng - 1)], 0.0)
    j_gas = jnp.where(is_kink, 0, j - 2 * ng)
    r0 = jnp.where(is_kink, T0 - K_sel, g0[j_gas])

    def residual_at(theta):
        uc = _rk4(par, RH, mask, r_dry, Pa,
                  jnp.exp(la + theta * (lb - la)), u, T_branch=T0)
        Pc = jnp.exp(la + theta * (lb - la))
        r = jnp.where(is_kink, uc[0] - K_sel, g_sat(Pc, uc[0])[j_gas])
        return uc, r

    def refine(theta_a, r_a):
        denom = jnp.where(jnp.abs(r0 - r_a) > 1e-300, r0 - r_a, 1e-300)
        th = theta_a * r0 / denom
        return jnp.clip(jnp.where(jnp.isfinite(th), th, theta_a),
                        1e-6, 1.0 - 1e-6)

    _, r_c0 = residual_at(theta0)
    theta1 = refine(theta0, r_c0)
    _, r_c1 = residual_at(theta1)
    theta2 = refine(theta1, r_c1)
    uc, _ = residual_at(theta2)
    Pc = jnp.exp(la + theta2 * (lb - la))
    # second piece: far-side L branch; condensing set grown on a mask event
    mask2 = mask | (jnp.arange(ng) == j_gas) & ~is_kink
    u2 = _rk4(par, RH, mask2, r_dry, Pc, Pb, uc, T_branch=T1)
    return jnp.where(has_event, u2, u1)


def _altitude_isothermal(par: AdiabatParams, P, T, mubar, P0, z0):
    """Analytic hydrostatic altitude for constant T, mubar (general.f90:658-669)."""
    return (
        (const.N_avo * const.k_boltz * T) / (G_GRAV_CGS * par.planet_mass * mubar)
        * jnp.log(P / P0)
        + 1.0 / (par.planet_radius + z0)
    ) ** (-1.0) - par.planet_radius


def surface_classification(par: AdiabatParams, RH, T_surf, P_i_surf):
    """Surface dry/condensing split and reservoirs (general.f90:199-224).

    Returns (P_i_atm, N_surface, mask0, r_dry).
    """
    psat = RH * saturation.sat_pressure(par.sat, T_surf)
    cond = par.sat.has_sat & (P_i_surf > psat)
    P_i_atm = jnp.where(cond, psat, P_i_surf)
    grav = _gravity(par, 0.0)
    N_surface = jnp.where(cond, (P_i_surf - psat) / (par.gas_masses * grav), 0.0)
    P_dry = jnp.sum(jnp.where(cond, 0.0, P_i_atm))
    r_dry = jnp.where(cond, 0.0, P_i_atm) / jnp.maximum(P_dry, 1e-200)
    return P_i_atm, N_surface, cond, r_dry


def make_profile_core(par: AdiabatParams, RH, T_surf, P_i_surf, T_trop):
    """Build the adiabat profile on the 2*nz+1 edge grid.

    All arguments may be traced. Returns a dict with:
      P_e (2nz+1) (surface first, decreasing), T_e, z_e, f_i_e (2nz+1, ng),
      P_trop (negative if no tropopause), N_surface (ng,), P_surf.
    """
    ng = par.gas_masses.shape[0]
    ne = 2 * par.nz + 1

    P_i_atm, N_surface, mask0, r_dry = surface_classification(par, RH, T_surf, P_i_surf)
    P_surf = jnp.sum(P_i_atm)

    # log-spaced pressure grid, endpoints pinned (general.f90:256-259)
    logP = jnp.linspace(jnp.log10(P_surf), jnp.log10(par.P_top), ne)
    P_e = 10.0**logP
    P_e = P_e.at[0].set(P_surf)
    P_e = P_e.at[-1].set(par.P_top)

    f_i_surf, _ = mixing_ratios(par, RH, mask0, r_dry, P_surf, T_surf)

    # latent-heat branch kinks: split substeps there (static skip when no
    # species condenses — has_sat is concrete at trace time)
    import numpy as _np

    _any_sat = bool(_np.any(_np.asarray(par.sat.has_sat)))
    kinks, kvalid = kink_temps(par.sat)

    def _step(la, lb, u, mask):
        if _any_sat:
            return _rk4_event_split(par, RH, mask, r_dry, la, lb, u, kinks, kvalid)
        return _rk4(par, RH, mask, r_dry, jnp.exp(la), jnp.exp(lb), u)

    K = par.substeps

    def interval(carry, P_pair):
        (T, z, mask, tropped, P_trop, z_trop, mubar_trop) = carry
        P_a_full, P_b_full = P_pair

        def substep(carry_s, k):
            T, z, mask, tropped, P_trop, z_trop, mubar_trop = carry_s
            # log-spaced substeps within the interval
            la = jnp.log(P_a_full) + (jnp.log(P_b_full) - jnp.log(P_a_full)) * k / K
            lb = jnp.log(P_a_full) + (jnp.log(P_b_full) - jnp.log(P_a_full)) * (k + 1) / K
            Pa, Pb = jnp.exp(la), jnp.exp(lb)

            u = jnp.array([T, z])
            u_new = _step(la, lb, u, mask)
            T_new, z_new = u_new[0], u_new[1]

            # tropopause crossing inside this substep (root T - T_trop)
            crossed = (~tropped) & (T_new <= T_trop)
            theta = jnp.where(
                crossed, (T - T_trop) / jnp.maximum(T - T_new, 1e-30), 1.0
            )
            lP_cross = la + theta * (lb - la)
            P_cross = jnp.exp(lP_cross)
            u_cross = _step(la, lP_cross, u, mask)
            f_cross, _ = mixing_ratios(par, RH, mask, r_dry, P_cross, T_trop)
            mubar_cross = _mubar(par, f_cross)

            P_trop = jnp.where(crossed, P_cross, P_trop)
            z_trop = jnp.where(crossed, u_cross[1], z_trop)
            mubar_trop = jnp.where(crossed, mubar_cross, mubar_trop)
            tropped_new = tropped | crossed

            # above the tropopause: T = T_trop, analytic isothermal altitude
            T_out = jnp.where(tropped_new, T_trop, T_new)
            z_iso = _altitude_isothermal(par, Pb, T_trop, mubar_trop, P_trop, z_trop)
            z_out = jnp.where(tropped_new, z_iso, z_new)

            # condensing-set growth (only below the tropopause)
            mask_new = update_mask(par, RH, mask, r_dry, Pb, T_out)
            mask_out = jnp.where(tropped_new, mask, mask_new)

            return (T_out, z_out, mask_out, tropped_new, P_trop, z_trop, mubar_trop), None

        carry_s = (T, z, mask, tropped, P_trop, z_trop, mubar_trop)
        carry_s, _ = jax.lax.scan(substep, carry_s, jnp.arange(K))
        T, z, mask, tropped, P_trop, z_trop, mubar_trop = carry_s

        f_i, _ = mixing_ratios(
            par, RH, mask, r_dry, jnp.where(tropped, P_trop, P_b_full),
            jnp.where(tropped, T_trop, T),
        )
        out = (T, z, f_i, mask)
        return (T, z, mask, tropped, P_trop, z_trop, mubar_trop), out

    T_surf = jnp.asarray(T_surf, dtype=P_e.dtype)
    carry0 = (
        T_surf,
        jnp.asarray(0.0, dtype=P_e.dtype),
        mask0,
        jnp.asarray(False),
        jnp.asarray(-1.0, dtype=P_e.dtype),
        jnp.asarray(0.0, dtype=P_e.dtype),
        _mubar(par, f_i_surf),
    )
    carry, (T_lev, z_lev, f_lev, mask_lev) = jax.lax.scan(
        interval, carry0, (P_e[:-1], P_e[1:])
    )
    tropped_final = carry[3]
    P_trop = jnp.where(tropped_final, carry[4], -1.0)

    T_e = jnp.concatenate([jnp.atleast_1d(T_surf), T_lev])
    z_e = jnp.concatenate([jnp.zeros(1, dtype=z_lev.dtype), z_lev])
    f_i_e = jnp.concatenate([f_i_surf[None, :], f_lev], axis=0)

    return dict(
        P_e=P_e,
        T_e=T_e,
        z_e=z_e,
        f_i_e=f_i_e,
        P_trop=P_trop,
        N_surface=N_surface,
        P_surf=P_surf,
        mask_surf=mask0,
        r_dry=r_dry,
    )
