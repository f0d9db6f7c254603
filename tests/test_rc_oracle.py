"""Loop-literal numpy/scipy oracle for make_profile_rc (VERDICT r4 item 7).

The RT stack has an independent transcription oracle (tests/test_rt_oracle.py);
this does the same for the RC profile — the heart of the RCE solver. Every
function below is a per-gas LOOP transcription of
``/root/reference/src/adiabat/clima_adiabat_rc.f90``:

- surface classification + N_surface          (rc.f90:218-264)
- mixing_ratios / update_f_i_dry              (rc.f90:767-833)
- general_adiabat_lapse_rate (Graham Eq. 1)   (rc.f90:835-891)
- right_hand_side (hydrostatic + adiabat)     (rc.f90:893-931)
- root_fcn (saturation + cold-trap roots)     (rc.f90:697-751)
- integrate(): segment loop over convective/radiative runs, dop853 with
  dense-output root events, switch-and-restart, grid-point recording
  (rc.f90:344-556) — scipy solve_ivp(DOP853, events=...) plays dop853+brent

and the saturation model is transcribed from ``clima_saturationdata.f90``
(three-regime linear latent heat, analytic Clausius-Clapeyron), NOT imported
from the package. Custom-mix species and oceans are exercised by other tests;
this oracle pins the default RCE configuration (dry/condensing switching).
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

from clima_tpu import constants as const
from clima_tpu.adiabat.profile import AdiabatParams
from clima_tpu.adiabat.profile_rc import make_profile_rc_core, CustomMix
from clima_tpu.config import load_species
from clima_tpu.data import write_species_yaml

DRY, CONDENSING = 0, 1  # sp_type enum (custom untested here)
EPS_ROOT = 1.0e-8


# ---------------------------------------------------------------------------
# saturation + heat capacity, transcribed (clima_saturationdata.f90:80-167,
# clima_eqns.f90:82-133)
# ---------------------------------------------------------------------------


def np_integral(A, B, T):
    return -A / T + B * np.log(T)


def np_sat_pressure(g, T):
    """g: per-gas dict of LinearLatentHeat params (or None)."""
    if g is None:
        return np.inf
    if T >= g["T_critical"]:
        tmp = (
            np_integral(g["a_v"], g["b_v"], g["T_critical"])
            - np_integral(g["a_v"], g["b_v"], g["T_ref"])
            + np_integral(g["a_c"], g["b_c"], T)
            - np_integral(g["a_c"], g["b_c"], g["T_critical"])
        )
    elif T > g["T_triple"]:
        tmp = np_integral(g["a_v"], g["b_v"], T) - np_integral(
            g["a_v"], g["b_v"], g["T_ref"]
        )
    else:
        tmp = (
            np_integral(g["a_v"], g["b_v"], g["T_triple"])
            - np_integral(g["a_v"], g["b_v"], g["T_ref"])
            + np_integral(g["a_s"], g["b_s"], T)
            - np_integral(g["a_s"], g["b_s"], g["T_triple"])
        )
    return g["P_ref"] * np.exp((g["mu"] / const.Rgas) * tmp)


def np_sat_pressure_derivative(g, T, h=1.0e-6):
    """Central difference stand-in for the reference's dual-number AD."""
    return (np_sat_pressure(g, T + h) - np_sat_pressure(g, T - h)) / (2 * h)


def np_latent_heat(g, T):
    if T >= g["T_critical"]:
        return g["a_c"] + g["b_c"] * T
    if T > g["T_triple"]:
        return g["a_v"] + g["b_v"] * T
    return g["a_s"] + g["b_s"] * T


def np_heat_capacity(gas, T):
    """Shomate (the synthetic species file's model)."""
    edges, coeffs = gas["cp_edges"], gas["cp_coeffs"]
    if not (edges[0] <= T < edges[-1]):
        raise ValueError("T out of thermo range")
    k = int(np.searchsorted(edges, T, side="right")) - 1
    k = min(k, len(coeffs) - 1)
    a = coeffs[k]
    t = T / 1000.0
    return a[0] + a[1] * t + a[2] * t**2 + a[3] * t**3 + a[4] / t**2


# ---------------------------------------------------------------------------
# rc.f90 core routines, loop for loop
# ---------------------------------------------------------------------------


class RCData:
    """The AdiabatRCProfileData work state (rc.f90:11-75), numpy edition."""

    def __init__(self, gases, masses, RH, planet_mass, planet_radius):
        self.gases = gases  # list of dicts (sat params or None + thermo)
        self.masses = masses
        self.RH = RH
        self.ng = len(gases)
        self.planet_mass = planet_mass
        self.planet_radius = planet_radius
        self.sp_type = np.zeros(self.ng, int)
        self.f_i_dry = np.zeros(self.ng)
        self.in_convecting_region = False
        self.T_nodes = None  # (nz+1,) [surface, layer centers]
        self.node_logP = None


def np_mixing_ratios(d, P, T):
    """rc.f90:786-833 (no custom species)."""
    f_i = np.zeros(d.ng)
    f_moist = 0.0
    for i in range(d.ng):
        if d.sp_type[i] == CONDENSING:
            f_i[i] = min(d.RH[i] * np_sat_pressure(d.gases[i]["sat"], T) / P, 1.0)
            f_moist += f_i[i]
    f_dry = max(1.0 - f_moist, 1.0e-40)
    for i in range(d.ng):
        if d.sp_type[i] == DRY:
            f_i[i] = f_dry * d.f_i_dry[i]
    return f_i, f_dry


def np_update_f_i_dry(d, P, f_i_layer):
    """rc.f90:767-784."""
    P_i = f_i_layer * P
    P_dry = sum(P_i[i] for i in range(d.ng) if d.sp_type[i] == DRY)
    d.f_i_dry = P_i / P_dry


def np_lapse_rate(d, T, P):
    """rc.f90:835-891 (Graham et al. 2021 Eq. 1, no condensate)."""
    f_i, f_dry = np_mixing_ratios(d, P, T)
    Rsi = const.Rgas_si
    cp_dry = 0.0
    L_i = np.zeros(d.ng)
    cp_i = np.zeros(d.ng)
    for i in range(d.ng):
        if d.sp_type[i] == CONDENSING:
            L = np_latent_heat(d.gases[i]["sat"], T)  # erg/g
            L_i[i] = L * d.masses[i] * 1.0e-7  # J/mol
        cp_i[i] = np_heat_capacity(d.gases[i], T)
        if d.sp_type[i] == DRY:
            cp_dry += d.f_i_dry[i] * cp_i[i]
    first = second = 0.0
    for i in range(d.ng):
        if d.sp_type[i] == CONDENSING:
            beta = L_i[i] / (Rsi * T)
            first += f_i[i] * (cp_i[i] - Rsi * beta + Rsi * beta**2)
            second += beta * f_i[i]
    return 1.0 / (
        f_dry * ((cp_dry * f_dry + first) / (Rsi * (f_dry + second))) + second
    )


def np_T_interp(d, P):
    """Linear in log10 P over the current node table (rc.f90:322-342)."""
    lg = np.log10(P)
    xs, ys = d.node_logP, d.T_nodes  # descending logP: [surface, centers...]
    # interpolate on the ascending reversal, clamped
    xa, ya = xs[::-1], ys[::-1]
    lg = min(max(lg, xa[0]), xa[-1])
    k = min(max(int(np.searchsorted(xa, lg, side="right")) - 1, 0), len(xa) - 2)
    t = (lg - xa[k]) / (xa[k + 1] - xa[k])
    val = ya[k] + t * (ya[k + 1] - ya[k])
    slope = (ya[k + 1] - ya[k]) / (xa[k + 1] - xa[k])
    return val, slope


def np_root_fcn(d, P, T):
    """rc.f90:697-751."""
    f_i, _ = np_mixing_ratios(d, P, T)
    P_i = f_i * P
    gout = np.ones(d.ng)
    if (d.sp_type == CONDENSING).any() and not d.in_convecting_region:
        _, dTdlog10P = np_T_interp(d, P)
    for i in range(d.ng):
        sat = d.gases[i]["sat"]
        P_sat = np.inf if sat is None else d.RH[i] * np_sat_pressure(sat, T)
        if d.sp_type[i] == CONDENSING and not d.in_convecting_region:
            dPi_dT = d.RH[i] * np_sat_pressure_derivative(sat, T)
            dTdP = dTdlog10P * (1.0 / (P * np.log(10.0)))
            dPi_dP = dPi_dT * dTdP
            dfi_dP = (1.0 / P) * dPi_dP - P_sat / P**2
            dlog10fi_dP = dfi_dP * (1.0 / (f_i[i] * np.log(10.0)))
            gout[i] = dlog10fi_dP - EPS_ROOT
        elif d.sp_type[i] == DRY and sat is not None:
            gout[i] = P_i[i] / P_sat - (1.0 + EPS_ROOT)
    return gout


def np_rhs(d, P, u):
    """rc.f90:893-931."""
    z = u[0]
    T = u[1] if d.in_convecting_region else np_T_interp(d, P)[0]
    f_i, _ = np_mixing_ratios(d, P, T)
    mubar = float(np.sum(f_i * d.masses))
    grav = const.G_grav * (d.planet_mass / 1.0e3) / (
        (d.planet_radius + z) / 1.0e2
    ) ** 2 * 1.0e2
    du = [-(const.Rgas * T) / (grav * P * mubar)]
    if d.in_convecting_region:
        dlnT = np_lapse_rate(d, T, P)
        du.append(dlnT * (T / P))
    return du


def np_make_profile_rc(gases, masses, RH, planet_mass, planet_radius, P_top,
                       T_surf, T_in, P_i_surf, conv, rtol=1.0e-9, atol=1.0e-12):
    """The full make_profile_rc + integrate (rc.f90:92-556), numpy/scipy.

    Returns dict(P_e, T_layers, z_e, f_i_e, lapse_rate_e, N_surface, P_surf).
    """
    d = RCData(gases, masses, RH, planet_mass, planet_radius)
    ng, nz = d.ng, len(conv)
    ne = 2 * nz + 1
    grav0 = const.G_grav * (planet_mass / 1.0e3) / (planet_radius / 1.0e2) ** 2 * 1.0e2

    # --- surface classification (rc.f90:218-264) ---
    P_i_cur = np.zeros(ng)
    N_surface = np.zeros(ng)
    for i in range(ng):
        sat = gases[i]["sat"]
        P_sat = np.inf if sat is None else RH[i] * np_sat_pressure(sat, T_surf)
        if P_i_surf[i] > P_sat:
            P_i_cur[i] = P_sat
            N_surface[i] = (P_i_surf[i] - P_sat) / (masses[i] * grav0)
            d.sp_type[i] = CONDENSING
        else:
            P_i_cur[i] = P_i_surf[i]
            d.sp_type[i] = DRY
    P_surf = float(np.sum(P_i_cur))
    f_i_cur = P_i_cur / P_surf
    np_update_f_i_dry(d, P_surf, f_i_cur)

    # --- pressure grid (rc.f90:297-305) ---
    P_e = 10.0 ** np.linspace(np.log10(P_surf), np.log10(P_top), ne)
    P_e[0] = P_surf
    P_e[-1] = P_top

    # --- temperature nodes (rc.f90:309-321); conv layers get placeholder ---
    T_layers = np.empty(nz + 1)
    T_layers[0] = T_surf
    T_layers[1:] = np.where(conv, -1.0, T_in)
    node_logP = np.empty(nz + 1)
    node_logP[0] = np.log10(P_surf)
    node_logP[1:] = np.log10(P_e[1::2])  # layer CENTERS (1-based even = P(2i))
    d.node_logP = node_logP
    d.T_nodes = T_layers  # alias: updated in place as integration proceeds

    # --- outputs + surface record (rc.f90:357-360) ---
    z_e = np.zeros(ne)
    f_i_e = np.zeros((ne, ng))
    lr_e = np.zeros(ne)
    lr_e[0] = np_lapse_rate(d, T_surf, P_surf)
    f_i_e[0] = f_i_cur

    j = 1  # 0-based index of the next grid point to record

    while True:
        # segments run CENTER to CENTER: the regime of layer i governs from
        # the center of layer i-1 to the center of layer i (rc.f90:365-412;
        # i = (d%j-1)/2+1 with 1-based d%j, i.e. 0-based layer = j//2)
        i_layer = j // 2
        conv_here = bool(conv[i_layer])
        d.in_convecting_region = conv_here

        # segment top: center of the last layer of this run (Ptop = P(2k),
        # 1-based even = 0-based odd; rc.f90:375-412)
        k = i_layer
        while k < nz and bool(conv[k]) == conv_here:
            k += 1
        k_pt = 2 * k - 1  # 0-based index of the run's last layer center
        Ptop_seg = P_e[k_pt]

        Pn = P_e[j - 1]
        u = [z_e[j - 1], T_layers[i_layer]] if conv_here else [z_e[j - 1]]

        # surface cold-trap pre-check (rc.f90:416-427)
        if j == 1 and not conv_here:
            T0, _ = np_T_interp(d, Pn)
            gout = np_root_fcn(d, Pn, T0)
            for i in range(ng):
                if d.sp_type[i] == CONDENSING and gout[i] <= 0.0:
                    d.sp_type[i] = DRY
            np_update_f_i_dry(d, Pn, f_i_e[0])

        # integrate the segment with switch-and-restart (rc.f90:434-536)
        for _ in range(10000):
            events = []
            for i in range(ng):
                def ev(P, u, i=i):
                    T = u[1] if d.in_convecting_region else np_T_interp(d, P)[0]
                    return np_root_fcn(d, P, T)[i]
                ev.terminal = True
                events.append(ev)

            sol = solve_ivp(
                lambda P, u: np_rhs(d, P, u), (Pn, Ptop_seg), u,
                method="DOP853", rtol=rtol, atol=atol, events=events,
                dense_output=True,
            )
            assert sol.status in (0, 1), sol.message
            P_reach = sol.t[-1]

            # record grid points covered by this sub-integration
            while j < ne and P_e[j] <= Pn and P_e[j] >= P_reach * (1 - 1e-12):
                uu = sol.sol(P_e[j])
                z_e[j] = uu[0]
                T_j = uu[1] if conv_here else np_T_interp(d, P_e[j])[0]
                if conv_here and j % 2 == 1:  # layer center (1-based even)
                    T_layers[(j + 1) // 2] = T_j
                f_i_e[j], _ = np_mixing_ratios(d, P_e[j], T_j)
                lr_e[j] = np_lapse_rate(d, T_j, P_e[j])
                j += 1

            if sol.status == 0:
                break  # reached the segment top

            # a root fired: switch species and restart (rc.f90:452-536)
            which = [i for i in range(ng) if len(sol.t_events[i])]
            P_root = max(sol.t_events[i][0] for i in which)
            ind_root = [i for i in which if sol.t_events[i][0] == P_root][0]
            u_root = list(sol.sol(P_root))
            T_root = u_root[1] if conv_here else np_T_interp(d, P_root)[0]
            f_root, _ = np_mixing_ratios(d, P_root, T_root)
            d.sp_type[ind_root] = (
                CONDENSING if d.sp_type[ind_root] == DRY else DRY
            )
            np_update_f_i_dry(d, P_root, f_root)
            # check other sign-changed components after the switch
            gout = np_root_fcn(d, P_root, T_root)
            switched_other = False
            for i in which:
                if i == ind_root:
                    continue
                if d.sp_type[i] == CONDENSING and gout[i] < 0.0:
                    d.sp_type[i] = DRY
                    switched_other = True
                elif d.sp_type[i] == DRY and gout[i] > 0.0:
                    d.sp_type[i] = CONDENSING
                    switched_other = True
            if switched_other:
                f_root2, _ = np_mixing_ratios(d, P_root, T_root)
                np_update_f_i_dry(d, P_root, f_root2)

            # nudge off the root (rc.f90:522-536)
            Pn = P_root - 8.0 * np.spacing(P_root)
            Pn = max(Pn, Ptop_seg + 8.0 * np.spacing(Ptop_seg))
            u = list(sol.sol(Pn))

        if k_pt >= 2 * nz - 1:
            # reference stops at the top layer's CENTER; the caller
            # extrapolates the top edge's z and never reads its f/lapse
            # (clima_adiabat_solve.f90:47)
            break

    return dict(
        P_e=P_e, T_layers=T_layers.copy(), z_e=z_e, f_i_e=f_i_e,
        lapse_rate_e=lr_e, N_surface=N_surface, P_surf=P_surf,
    )


# ---------------------------------------------------------------------------
# fixtures: species params exported to plain numpy dicts
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def species(tmp_path_factory):
    p = tmp_path_factory.mktemp("sp_rc_oracle") / "species.yaml"
    write_species_yaml(str(p))
    return load_species(str(p))


def export_gases(sp):
    """Flatten the package's stacked species arrays into per-gas dicts."""
    gases = []
    sat = sp.sat
    for i in range(sp.ng):
        g = {}
        if bool(np.asarray(sat.has_sat)[i]):
            g["sat"] = {
                k: float(np.asarray(getattr(sat, k))[i])
                for k in ("mu", "T_ref", "P_ref", "T_triple", "T_critical",
                          "a_v", "b_v", "a_s", "b_s", "a_c", "b_c")
            }
        else:
            g["sat"] = None
        edges = np.asarray(sp.thermo.temps)[i]
        coeffs = np.asarray(sp.thermo.coeffs)[i][:, :7]
        # drop padded (repeated) range edges
        nr = 1 + int(np.sum(np.diff(edges) > 0)) - 1
        g["cp_edges"] = edges[: nr + 1]
        g["cp_coeffs"] = coeffs[:nr]
        gases.append(g)
    return gases


def make_par(sp, nz, P_top, substeps=8):
    return AdiabatParams(
        gas_masses=jnp.asarray(sp.gas_masses),
        thermo=sp.thermo,
        sat=sp.sat,
        nz=nz,
        planet_mass=5.972e27,
        planet_radius=6.371e8,
        P_top=P_top,
        substeps=substeps,
    )


def default_cm(ng):
    return CustomMix(
        log10P=jnp.asarray([-20.0, 20.0]),
        log10mix=jnp.full((2, ng), -60.0),
        mask=jnp.zeros(ng, bool),
    )


# ---------------------------------------------------------------------------
# the tests
# ---------------------------------------------------------------------------


MASKS = {
    "all_radiative": lambda nz: np.zeros(nz, bool),
    "ground_zone": lambda nz: np.arange(nz) < 5,
    "mid_zone": lambda nz: (np.arange(nz) >= 4) & (np.arange(nz) < 9),
    "two_zones": lambda nz: ((np.arange(nz) < 3)
                             | ((np.arange(nz) >= 7) & (np.arange(nz) < 11))),
    "all_convective": lambda nz: np.ones(nz, bool),
}


def consistent_T_in(sp, par, conv, T_in0, P_i, T_surf):
    """Radiative temps made continuous across convective-zone tops.

    The reference locates switches as dense-output SIGN CROSSINGS: a
    discontinuous prescribed-T jump at a zone boundary (radiative layer much
    warmer than the computed zone top) freezes species states without a
    crossing — a solver-transient pathology the package intentionally
    handles by level-triggered switching instead. For the oracle comparison
    we prescribe the near-continuous profiles real RCE iterates look like:
    radiative layers above each convective zone decline gently from the
    computed zone-top temperature (3 passes propagate zone tops upward).
    """
    ng = sp.ng
    T_in = np.asarray(T_in0, float).copy()
    nz = len(conv)
    for _ in range(3):
        got = make_profile_rc_core(
            par, jnp.ones(ng), T_surf, jnp.asarray(T_in), jnp.asarray(P_i),
            jnp.asarray(conv), default_cm(ng),
        )
        T = np.asarray(got["T"])
        P_c = np.asarray(got["P_e"])[1::2]
        new = T_in.copy()
        l = 0
        while l < nz:
            if conv[l]:
                top = l
                while top + 1 < nz and conv[top + 1]:
                    top += 1
                for m in range(top + 1, nz):
                    if conv[m]:
                        break
                    new[m] = T[top] * (P_c[m] / P_c[top]) ** 0.10
                l = top + 1
            else:
                l += 1
        T_in = new
    return T_in


@pytest.mark.parametrize("mask_name", sorted(MASKS))
def test_profile_rc_matches_loop_oracle(species, mask_name):
    """make_profile_rc_core == the rc.f90 transcription on the full column."""
    sp = species
    nz = 14
    P_top = 1.0e2
    conv = MASKS[mask_name](nz)

    ng = sp.ng
    P_i = np.full(ng, 1.0)
    names = sp.gas_names
    P_i[names.index("H2O")] = 270.0e6  # condenses at the surface
    P_i[names.index("CO2")] = 400.0e3
    P_i[names.index("N2")] = 1.0e6

    T_surf = 285.0
    # a radiative T profile with structure (drives cold traps aloft),
    # made continuous across zone tops (see consistent_T_in)
    T_in = np.maximum(np.linspace(280.0, 175.0, nz), 175.0)
    T_in = consistent_T_in(sp, make_par(sp, nz, P_top), conv, T_in, P_i,
                           T_surf)

    gases = export_gases(sp)
    masses = np.asarray(sp.gas_masses)
    RH = np.ones(ng)
    want = np_make_profile_rc(
        gases, masses, RH, 5.972e27, 6.371e8, P_top,
        T_surf, T_in.copy(), P_i, conv,
    )

    par = make_par(sp, nz, P_top)
    got = make_profile_rc_core(
        par, jnp.asarray(RH), T_surf, jnp.asarray(T_in), jnp.asarray(P_i),
        jnp.asarray(conv), default_cm(ng),
    )

    np.testing.assert_allclose(np.asarray(got["P_surf"]), want["P_surf"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got["N_surface"]), want["N_surface"],
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got["P_e"]), want["P_e"], rtol=1e-12)
    # temperatures: fixed-RK4 vs adaptive DOP853 (rtol 1e-9) — the package's
    # substep truncation dominates (cf. test_profile_sweep's 5e-6 bar)
    np.testing.assert_allclose(np.asarray(got["T"]), want["T_layers"][1:],
                               rtol=2e-5)
    # edge arrays: the reference records up to the top layer's CENTER only
    # (index 2nz-1); the caller extrapolates the top edge and never reads
    # its f/lapse (clima_adiabat_solve.f90:47), so compare the recorded span
    e = slice(0, 2 * nz)
    np.testing.assert_allclose(np.asarray(got["z_e"])[e], want["z_e"][e],
                               rtol=2e-5, atol=1.0)
    np.testing.assert_allclose(np.asarray(got["f_i_e"])[e], want["f_i_e"][e],
                               rtol=5e-4, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got["lapse_rate_e"])[e],
                               want["lapse_rate_e"][e], rtol=5e-4, atol=1e-7)


def test_oracle_detects_saturation_switch(species):
    """Control: the oracle itself must place a dry->condensing switch where
    H2O saturates aloft (guards against a trivially-passing oracle)."""
    sp = species
    nz = 14
    conv = np.zeros(nz, bool)
    ng = sp.ng
    P_i = np.full(ng, 1.0)
    P_i[sp.gas_names.index("H2O")] = 5.0e3   # NOT saturated at the surface
    P_i[sp.gas_names.index("N2")] = 1.0e6
    T_in = np.linspace(270.0, 180.0, nz)     # cools fast -> saturates aloft

    gases = export_gases(sp)
    out = np_make_profile_rc(
        gases, np.asarray(sp.gas_masses), np.ones(ng), 5.972e27, 6.371e8,
        1.0e2, 275.0, T_in.copy(), P_i, conv,
    )
    iH2O = sp.gas_names.index("H2O")
    f = out["f_i_e"][:, iH2O]
    # constant mixing ratio low down (dry), then declining (condensing)
    assert f[0] == pytest.approx(f[1], rel=1e-6)
    assert f[-1] < 0.5 * f[0]
