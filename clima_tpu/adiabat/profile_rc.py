"""Radiative/convective profile reconstruction (``src/adiabat/clima_adiabat_rc.f90``).

Given the convection mask ``convecting_with_below`` and temperatures of the
surface + radiative layers, rebuild the full column: convective zones
integrate T along the generalized moist adiabat; radiative zones interpolate
the prescribed temperatures and integrate only the hydrostatic altitude.
Handles dry<->condensing switching including cold traps (condensing gas whose
mixing ratio would increase with altitude switches to dry, rc.f90:697-751)
and custom prescribed-mix species (CustomDrySpeciesType, rc.f90:786-833).

TPU-native design: one ``lax.scan`` over the 2*nz grid intervals with fixed
RK4 substeps. The convection mask is a TRACED boolean array — RCE mask
updates do not recompile. The radiative-region temperature interpolator is a
carried node array updated in place as convective temps are computed, which
reproduces the reference's re-initialized interpolator semantics
(rc.f90:322-342) because interpolation brackets only ever touch nodes already
determined.

``super_saturated`` is always False, matching the reference (rc.f90:795 sets
it false and never true).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import constants as const
from ..config.species import heat_capacity
from ..physics import saturation
from ..ops.interp import searchsorted_right
from .profile import AdiabatParams, F_DRY_MIN

__all__ = ["make_profile_rc_core", "CustomMix"]

EPS_ROOT = 1.0e-8  # thresholds in rc root functions (rc.f90:741,746)


@dataclasses.dataclass(frozen=True)
class CustomMix:
    """Prescribed custom mixing ratios: log10P ascending grid + log10 mix."""

    log10P: jnp.ndarray  # (nPc,)
    log10mix: jnp.ndarray  # (nPc, ng) — columns for non-custom species unused
    mask: jnp.ndarray  # (ng,) bool


def _interp1(xs, ys, x):
    idx = searchsorted_right(xs, x)
    t = (x - xs[idx]) / (xs[idx + 1] - xs[idx])
    return ys[idx] + t * (ys[idx + 1] - ys[idx]), (ys[idx + 1] - ys[idx]) / (
        xs[idx + 1] - xs[idx]
    )


def _custom_f(cm: CustomMix, P):
    """Normalized custom mixing-ratio shares at pressure P (rc.f90:816-831)."""
    lg = jnp.log10(P)
    idx = searchsorted_right(cm.log10P, lg)
    t = (lg - cm.log10P[idx]) / (cm.log10P[idx + 1] - cm.log10P[idx])
    lf = cm.log10mix[idx, :] + t * (cm.log10mix[idx + 1, :] - cm.log10mix[idx, :])
    f = jnp.where(cm.mask, 10.0**lf, 0.0)
    return f / jnp.maximum(jnp.sum(f), 1e-200)


def mixing_ratios_rc(par, RH, cond, cm: CustomMix, f_i_dry, P, T,
                     T_branch=None):
    """Mixing ratios with condensing/dry/custom species (rc.f90:786-833).

    ``T_branch`` pins the latent-heat regime (see profile.saturation notes):
    the event-split RK4 pieces must be analytic within a piece.
    """
    psat = RH * saturation.sat_pressure(par.sat, T, T_branch)
    f_c = jnp.minimum(psat / P, 1.0)
    f_moist = jnp.sum(jnp.where(cond, f_c, 0.0))
    f_dry = jnp.maximum(1.0 - f_moist, F_DRY_MIN)
    plain_dry = (~cond) & (~cm.mask)
    f_dry_tot = jnp.sum(jnp.where(plain_dry, f_i_dry, 0.0))
    f_custom = _custom_f(cm, P) * (1.0 - f_dry_tot) * f_dry
    f_i = jnp.where(
        cond, f_c, jnp.where(cm.mask, f_custom, f_dry * f_i_dry)
    )
    return f_i, f_dry


def update_f_i_dry_rc(cond, cm: CustomMix, f_i, P):
    """Repartition dry fractions after a switch (rc.f90:767-784)."""
    P_i = f_i * P
    dry_or_custom = (~cond) | cm.mask  # custom never condenses
    P_dry = jnp.sum(jnp.where(dry_or_custom & (~cond), P_i, 0.0))
    return P_i / jnp.maximum(P_dry, 1e-200)


def lapse_rate_rc(par, RH, cond, cm: CustomMix, f_i_dry, P, T, T_branch=None):
    """Generalized adiabat dlnT/dlnP with custom species in cp_dry (rc.f90:835-891)."""
    f_i, f_dry = mixing_ratios_rc(par, RH, cond, cm, f_i_dry, P, T, T_branch)
    cp_i = heat_capacity(par.thermo, T)
    dry_or_custom = (~cond)
    cp_dry = jnp.sum(jnp.where(dry_or_custom, f_i_dry * cp_i, 0.0)) + 1e-300
    L = saturation.latent_heat(par.sat, T, T_branch) * par.gas_masses * 1.0e-7
    Rsi = const.Rgas_si
    beta = L / (Rsi * T)
    first = jnp.sum(jnp.where(cond, f_i * (cp_i - Rsi * beta + Rsi * beta**2), 0.0))
    second = jnp.sum(jnp.where(cond, beta * f_i, 0.0))
    return 1.0 / (
        f_dry * ((cp_dry * f_dry + first) / (Rsi * (f_dry + second))) + second
    )


def _root_switches(par, RH, cond, cm, f_i_dry, P, T, dTdlog10P, in_conv):
    """Apply dry<->condensing switches from the rc root functions.

    dry -> condensing when P_i/Psat > 1+eps (rc.f90:743-747).
    condensing -> dry (cold trap) when dlog10(f_i)/dP > eps, evaluated only in
    radiative regions (rc.f90:709-741).
    Returns the updated (cond, f_i_dry).
    """
    psat = RH * saturation.sat_pressure(par.sat, T)
    f_i, _ = mixing_ratios_rc(par, RH, cond, cm, f_i_dry, P, T)
    P_i = f_i * P

    to_cond = (~cond) & (~cm.mask) & par.sat.has_sat & (
        P_i / psat > 1.0 + EPS_ROOT
    )

    # cold trap: df_i/dP of the saturation-following mixing ratio
    # The mixing ratio of a condensing species is f = Psat(T(P))/P. Where
    # dlog10(f)/dP <= eps the mixing ratio would INCREASE with altitude —
    # a cold trap: the species switches back to dry (rc.f90:722-741 root
    # gout = dlog10fi_dP - 1e-8; demotion on gout <= 0, rc.f90:420-424).
    dPi_dT = RH * saturation.sat_pressure_derivative(par.sat, T)
    dTdP = dTdlog10P / (P * jnp.log(10.0))
    dPi_dP = dPi_dT * dTdP
    dfi_dP = (1.0 / P) * dPi_dP - psat / P**2
    dlog10fi_dP = dfi_dP / (jnp.maximum(f_i, 1e-200) * jnp.log(10.0))
    to_dry = cond & (~in_conv) & (dlog10fi_dP < EPS_ROOT)

    new_cond = (cond | to_cond) & (~to_dry)
    switched = jnp.any(new_cond != cond)
    f_i_new, _ = mixing_ratios_rc(par, RH, cond, cm, f_i_dry, P, T)
    f_i_dry_new = update_f_i_dry_rc(new_cond, cm, f_i_new, P)
    f_i_dry = jnp.where(switched, f_i_dry_new, f_i_dry)
    return new_cond, f_i_dry


def make_profile_rc_core(par: AdiabatParams, RH, T_surf, T_in, P_i_surf,
                         convecting_with_below, cm: CustomMix):
    """Rebuild the column for the given convection mask.

    T_in: (nz,) prescribed layer temperatures (values in convective layers are
    ignored and replaced by the adiabat integration). Returns dict with edge
    arrays plus the updated layer temperatures ``T`` and ``lapse_rate_e``.
    """
    ng = par.gas_masses.shape[0]
    nz = par.nz
    ne = 2 * nz + 1
    K = par.substeps

    # ---- surface classification with custom species (rc.f90:218-264) ----
    psat_surf = RH * saturation.sat_pressure(par.sat, T_surf)
    cond0 = (~cm.mask) & par.sat.has_sat & (P_i_surf > psat_surf)
    P_i_cur = jnp.where(cm.mask, 0.0, jnp.where(cond0, psat_surf, P_i_surf))
    grav0 = (
        const.G_grav * (par.planet_mass / 1.0e3) / (par.planet_radius / 1.0e2) ** 2 * 1.0e2
    )
    N_surface = jnp.where(cond0, (P_i_surf - psat_surf) / (par.gas_masses * grav0), 0.0)
    P_custom_tot = jnp.sum(jnp.where(cm.mask, P_i_surf, 0.0))
    P_surf = jnp.sum(P_i_cur) + P_custom_tot
    # custom partial pressures at the surface
    f_cust_surf = _custom_f(cm, P_surf)
    P_i_cur = jnp.where(cm.mask, P_custom_tot * f_cust_surf, P_i_cur)

    f_i_cur = P_i_cur / P_surf
    f_i_dry0 = update_f_i_dry_rc(cond0, cm, f_i_cur, P_surf)

    # ---- pressure grid ----
    logP = jnp.linspace(jnp.log10(P_surf), jnp.log10(par.P_top), ne)
    P_e = 10.0**logP
    P_e = P_e.at[0].set(P_surf)
    P_e = P_e.at[-1].set(par.P_top)

    # ---- temperature nodes: [surface, layer centers] over ascending log10P ----
    T_surf = jnp.asarray(T_surf, P_e.dtype)
    T_nodes0 = jnp.concatenate([jnp.atleast_1d(T_surf), T_in])  # index 0=surface
    node_logP = jnp.log10(jnp.concatenate([jnp.atleast_1d(P_surf), P_e[1::2]]))
    node_logP_asc = node_logP[::-1]

    def T_interp(T_nodes, P):
        val, slope = _interp1(node_logP_asc, T_nodes[::-1], jnp.log10(P))
        return val, slope  # slope = dT/dlog10P

    # surface cold-trap pre-check (rc.f90:416-427): if the surface region is
    # radiative, demote condensing gases whose mixing ratio would increase
    conv0 = convecting_with_below[0]
    _, slope0 = T_interp(T_nodes0, P_surf)
    cond0_b, _ = _root_switches(
        par, RH, cond0, cm, f_i_dry0, P_surf, T_surf, slope0,
        jnp.asarray(False),
    )
    # only the condensing->dry demotion applies here; only when radiative
    cond_start = jnp.where(conv0, cond0, cond0 & cond0_b)
    f_i_surf0, _ = mixing_ratios_rc(par, RH, cond0, cm, f_i_dry0, P_surf, T_surf)
    fid_start = jnp.where(
        conv0, f_i_dry0, update_f_i_dry_rc(cond_start, cm, f_i_surf0, P_surf)
    )

    # per-interval metadata (static python lists -> arrays)
    import numpy as _np
    from .profile import kink_temps

    # latent-heat branch kinks for the convective event-split (static skip
    # when nothing condenses)
    _any_sat = bool(_np.any(_np.asarray(par.sat.has_sat)))
    kinks, kvalid = kink_temps(par.sat)

    li = _np.array([(m + 1) // 2 for m in range(2 * nz)])  # 0-based governing layer
    li = _np.minimum(li, nz - 1)
    # grid point g = m+1 is a layer center at odd 0-based indices -> m even;
    # its temperature-node index is (m+2)//2
    node_out = _np.array([(m + 2) // 2 if (m % 2) == 0 else -1 for m in range(2 * nz)])

    def interval(carry, xs):
        z, T_run, cond, fid, T_nodes = carry
        P_a, P_b, conv_flag, node_i = xs

        la, lb = jnp.log(P_a), jnp.log(P_b)

        def rhs_conv(P, u, cond, fid, Tb):
            zz, TT = u[0], u[1]
            f_i, _ = mixing_ratios_rc(par, RH, cond, cm, fid, P, TT, Tb)
            mubar = jnp.sum(f_i * par.gas_masses)
            grav = (
                const.G_grav * (par.planet_mass / 1.0e3)
                / ((par.planet_radius + zz) / 1.0e2) ** 2 * 1.0e2
            )
            dz = -(const.Rgas * TT) / (grav * P * mubar)
            dlnT = lapse_rate_rc(par, RH, cond, cm, fid, P, TT, Tb)
            return jnp.array([dz, dlnT * TT / P])

        def rhs_rad(P, u, cond, fid):
            zz = u[0]
            TT, _ = T_interp(T_nodes, P)
            f_i, _ = mixing_ratios_rc(par, RH, cond, cm, fid, P, TT)
            mubar = jnp.sum(f_i * par.gas_masses)
            grav = (
                const.G_grav * (par.planet_mass / 1.0e3)
                / ((par.planet_radius + zz) / 1.0e2) ** 2 * 1.0e2
            )
            dz = -(const.Rgas * TT) / (grav * P * mubar)
            return jnp.array([dz, 0.0])

        def rhs(P, u, cond, fid, Tb):
            # cond/fid are passed EXPLICITLY (not closed over): each RK
            # substep must integrate with the state updated at the previous
            # substep boundary. A closure over the interval-entry state
            # delayed dry<->condensing switches by up to a whole grid
            # interval (~6 K at a CO2 condensation onset; caught by
            # tests/test_rc_oracle.py's event-located transcription).
            # ``Tb`` pins the latent-heat branch of a convective RK4 piece
            # (kink events at T_triple/T_critical are split, see substep).
            return jnp.where(
                conv_flag, rhs_conv(P, u, cond, fid, Tb),
                rhs_rad(P, u, cond, fid),
            )

        def rk4p(Pa, Pb, u, cond, fid, Tb):
            h = Pb - Pa
            k1 = rhs(Pa, u, cond, fid, Tb)
            k2 = rhs(Pa + 0.5 * h, u + 0.5 * h * k1, cond, fid, Tb)
            k3 = rhs(Pa + 0.5 * h, u + 0.5 * h * k2, cond, fid, Tb)
            k4 = rhs(Pb, u + h * k3, cond, fid, Tb)
            return u + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

        def substep(c, k):
            z, T_run, cond, fid = c
            lp0 = la + (lb - la) * k / K
            lp1 = la + (lb - la) * (k + 1) / K
            p0 = jnp.exp(lp0)
            p1 = jnp.exp(lp1)
            u = jnp.array([z, T_run])

            # ---- piece 1: branch-pinned full substep ----
            T0 = T_run
            u1 = rk4p(p0, p1, u, cond, fid, T0)
            T1 = u1[1]

            if _any_sat:
                # ---- convective in-substep events (the reference's
                # dense-output dop853 roots, rc.f90:434-536, and the
                # latent-heat kinks its adaptive stepping resolves):
                # replicate profile._rk4_event_split on the rc state ----
                def g_sat(P, T):
                    f_i, _ = mixing_ratios_rc(par, RH, cond, cm, fid, P, T,
                                              T0)
                    psat = RH * saturation.sat_pressure(par.sat, T, T0)
                    return f_i * P - psat

                crossed_k = conv_flag & kvalid & (
                    (T0 - kinks) * (T1 - kinks) < 0.0
                )
                denomT = jnp.where(jnp.abs(T0 - T1) > 1e-300, T0 - T1, 1e-300)
                theta_k = jnp.where(crossed_k, (T0 - kinks) / denomT, jnp.inf)
                g0 = g_sat(p0, T0)
                g1 = g_sat(p1, T1)
                newly = (
                    conv_flag & jnp.asarray(par.sat.has_sat) & (~cond)
                    & (~cm.mask) & (g0 < 0.0) & (g1 >= 0.0)
                )
                denomG = jnp.where(jnp.abs(g0 - g1) > 1e-300, g0 - g1, 1e-300)
                theta_m = jnp.where(newly, g0 / denomG, jnp.inf)

                thetas = jnp.concatenate([theta_k, theta_m])
                j = jnp.argmin(thetas)
                has_event = jnp.isfinite(thetas[j]) & (thetas[j] < 1.0)
                theta0 = jnp.clip(
                    jnp.where(has_event, thetas[j], 0.5), 1e-6, 1.0 - 1e-6
                )
                is_kink = j < 2 * ng
                K_sel = jnp.where(
                    is_kink, kinks[jnp.minimum(j, 2 * ng - 1)], 0.0
                )
                j_gas = jnp.where(is_kink, 0, j - 2 * ng)
                r0 = jnp.where(is_kink, T0 - K_sel, g0[j_gas])

                def residual_at(theta):
                    Pc = jnp.exp(lp0 + theta * (lp1 - lp0))
                    uc = rk4p(p0, Pc, u, cond, fid, T0)
                    r = jnp.where(
                        is_kink, uc[1] - K_sel, g_sat(Pc, uc[1])[j_gas]
                    )
                    return uc, r

                def refine(theta_a, r_a):
                    denom = jnp.where(
                        jnp.abs(r0 - r_a) > 1e-300, r0 - r_a, 1e-300
                    )
                    th = theta_a * r0 / denom
                    return jnp.clip(
                        jnp.where(jnp.isfinite(th), th, theta_a),
                        1e-6, 1.0 - 1e-6,
                    )

                _, r_c0 = residual_at(theta0)
                theta1 = refine(theta0, r_c0)
                _, r_c1 = residual_at(theta1)
                theta2 = refine(theta1, r_c1)
                uc, _ = residual_at(theta2)
                Pc = jnp.exp(lp0 + theta2 * (lp1 - lp0))
                # onset: grow the condensing set + repartition the dry pool
                # (mixing ratios at the root under the OLD state, THEN the
                # switch, exactly the reference's order, rc.f90:494-501)
                onset = has_event & (~is_kink)
                cond2 = cond | ((jnp.arange(ng) == j_gas) & onset)
                f_c, _ = mixing_ratios_rc(par, RH, cond, cm, fid, Pc, uc[1],
                                          T0)
                fid_on = update_f_i_dry_rc(cond2, cm, f_c, Pc)
                fid2 = jnp.where(onset, fid_on, fid)
                # piece 2: far-side latent-heat branch / grown set
                u2 = rk4p(Pc, p1, uc, cond2, fid2, T1)
                u_new = jnp.where(has_event, u2, u1)
                cond = jnp.where(has_event, cond2, cond)
                fid = jnp.where(has_event, fid2, fid)
            else:
                u_new = u1

            z_new = u_new[0]
            T_interp_val, slope = T_interp(T_nodes, p1)
            T_new = jnp.where(conv_flag, u_new[1], T_interp_val)
            # state switching at substep boundaries (radiative-side events:
            # saturation onsets against the prescribed T, cold traps)
            cond_new, fid_new = _root_switches(
                par, RH, cond, cm, fid, p1, T_new, slope, conv_flag
            )
            return (z_new, T_new, cond_new, fid_new), None

        (z, T_run, cond, fid), _ = jax.lax.scan(
            substep, (z, T_run, cond, fid), jnp.arange(K)
        )

        # record outputs at the grid point P_b
        f_i, _ = mixing_ratios_rc(par, RH, cond, cm, fid, P_b, T_run)
        lr = lapse_rate_rc(par, RH, cond, cm, fid, P_b, T_run)

        # update the temperature node if this grid point is a layer center of
        # a convective layer
        is_center = node_i >= 0
        upd = conv_flag & is_center
        T_nodes = jnp.where(
            upd,
            T_nodes.at[jnp.maximum(node_i, 0)].set(T_run),
            T_nodes,
        )

        return (z, T_run, cond, fid, T_nodes), (T_run, z, f_i, lr)

    carry0 = (
        jnp.asarray(0.0, P_e.dtype),
        T_surf,
        cond_start,
        fid_start,
        T_nodes0,
    )
    xs = (
        P_e[:-1],
        P_e[1:],
        convecting_with_below[jnp.asarray(li)],
        jnp.asarray(node_out),
    )
    carry, (T_lev, z_lev, f_lev, lr_lev) = jax.lax.scan(interval, carry0, xs)
    T_nodes_final = carry[4]

    # The SURFACE record uses the state from surface classification — BEFORE
    # the radiative cold-trap pre-check: the reference stores lapse_rate(1)
    # and f_i(1,:) at integrate() entry (rc.f90:357-359), and only then runs
    # the pre-check that may demote condensing gases for the integration
    # (rc.f90:416-427). lapse_rate_e[0] feeds lapse_rate_intended[0] in the
    # RCE mask updates, so recording the post-check (drier) state instead
    # was a real parity bug (caught by tests/test_rc_oracle.py).
    f_i_surf, _ = mixing_ratios_rc(par, RH, cond0, cm, f_i_dry0, P_surf, T_surf)
    lr_surf = lapse_rate_rc(par, RH, cond0, cm, f_i_dry0, P_surf, T_surf)

    T_e = jnp.concatenate([jnp.atleast_1d(T_surf), T_lev])
    z_e = jnp.concatenate([jnp.zeros(1, P_e.dtype), z_lev])
    f_i_e = jnp.concatenate([f_i_surf[None, :], f_lev], axis=0)
    lapse_rate_e = jnp.concatenate([jnp.atleast_1d(lr_surf), lr_lev])

    return dict(
        P_e=P_e,
        T_e=T_e,
        z_e=z_e,
        f_i_e=f_i_e,
        lapse_rate_e=lapse_rate_e,
        T=T_nodes_final[1:],
        N_surface=N_surface,
        P_surf=P_surf,
    )
