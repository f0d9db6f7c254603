"""Full-RT independent oracle: loop-literal numpy transcription of the
reference's compute_opacity + k_rorr + radiate, asserted against the
vectorized path on the synthetic opacity DB.

This pins the ASSEMBLED SPECTRUM (tau/w0/g per gauss point per bin, band
optical depths, per-bin and integrated fluxes), not just physical
invariants. The transcription mirrors, loop for loop:

- ``OpticalProperties_compute_opacity``
  (/root/reference/src/radtran/clima_radtran_types.f90:574-778)
- ``k_rorr`` (clima_radtran_types.f90:780-888)
- ``interpolate_Xsection`` / ``interpolate_WaterContinuum`` /
  ``interpolate_Particle`` (clima_radtran_types.f90:890-983)
- ``radiate`` (/root/reference/src/radtran/clima_radtran_radiate.f90:7-196)

using the independently-validated numpy two-stream oracles from
tests/test_tridiag_twostream.py for the per-(bin,gauss,zenith) solves.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from clima_tpu import constants as const
from clima_tpu.config import load_settings, load_species
from clima_tpu.data import make_template_dir
from clima_tpu.physics.eqns import planck_fcn, zenith_angles_and_weights
from clima_tpu.radtran import data as data_mod
from clima_tpu.radtran.opacity import compute_opacity
from clima_tpu.radtran.radiate import radiate_ir, radiate_solar, integrate_fluxes

from test_tridiag_twostream import np_two_stream_solar, np_two_stream_ir


# ---------------------------------------------------------------------------
# loop-literal transcription
# ---------------------------------------------------------------------------


def lin1(xg, yg, x):
    """1-D linear interpolation with clamping (finterp semantics)."""
    x = min(max(x, xg[0]), xg[-1])
    i = int(np.searchsorted(xg, x, side="right")) - 1
    i = min(max(i, 0), len(xg) - 2)
    t = (x - xg[i]) / (xg[i + 1] - xg[i])
    return yg[i] + t * (yg[i + 1] - yg[i])


def bilin(xg, yg, Z, x, y):
    """2-D bilinear interpolation with clamping; Z is (len(xg), len(yg))."""
    x = min(max(x, xg[0]), xg[-1])
    y = min(max(y, yg[0]), yg[-1])
    i = min(max(int(np.searchsorted(xg, x, side="right")) - 1, 0), len(xg) - 2)
    j = min(max(int(np.searchsorted(yg, y, side="right")) - 1, 0), len(yg) - 2)
    tx = (x - xg[i]) / (xg[i + 1] - xg[i])
    ty = (y - yg[j]) / (yg[j + 1] - yg[j])
    return (
        Z[i, j] * (1 - tx) * (1 - ty)
        + Z[i + 1, j] * tx * (1 - ty)
        + Z[i, j + 1] * (1 - tx) * ty
        + Z[i + 1, j + 1] * tx * ty
    )


def np_rebin(old_e, vals, new_e):
    """Conservative rebin of piecewise-constant vals (futils rebin)."""
    out = np.zeros(len(new_e) - 1)
    for i in range(len(new_e) - 1):
        a, b = new_e[i], new_e[i + 1]
        acc = 0.0
        for j in range(len(old_e) - 1):
            lo = max(a, old_e[j])
            hi = min(b, old_e[j + 1])
            if hi > lo:
                acc += vals[j] * (hi - lo)
        out[i] = acc / (b - a)
    return out


def oracle_compute_opacity(op, P, T, densities, dz, pdensities=None, radii=None):
    """compute_opacity transcription (types.f90:574-778). Returns TOA-down
    tau (nw, nbin, nz), w0, g (nw, nz), tau_band (nw, nz)."""
    nz = len(T)
    nw = op.nw
    nbin = op.kset.nbin
    log10P = np.log10(P)
    cols = densities * dz[:, None]
    flip = lambda a: a[::-1]

    tau = np.zeros((nw, nbin, nz))
    w0 = np.zeros((nw, nbin, nz))
    g = np.zeros((nw, nz))
    tau_band = np.zeros((nw, nz))

    # pair weights wxy(j + (i-1)*nbin) = wbin(i)*wbin(j) (types_create:211-219)
    wbin = np.asarray(op.kset.wbin)
    wbin_e = np.asarray(op.kset.wbin_e)
    wxy = np.zeros(nbin * nbin)
    for i in range(nbin):
        for j in range(nbin):
            wxy[i * nbin + j] = wbin[i] * wbin[j]

    for l in range(nw):
        # k-distribution interpolation (types.f90:649-662)
        ks = []
        for kt in op.k:
            kk = np.zeros((nz, kt.ngauss))
            for k in range(kt.ngauss):
                for jz in range(nz):
                    TT = min(max(T[jz], kt.temp[0]), kt.temp[-1])
                    lP = min(max(log10P[jz], kt.log10P[0]), kt.log10P[-1])
                    val = bilin(kt.log10P, kt.temp, kt.log10k[k, :, :, l], lP, TT)
                    kk[jz, k] = 10.0**val
            ks.append(kk)

        # xsection interpolation helpers (types.f90:890-917)
        def interp_xs(xs):
            out = np.zeros(nz)
            for jz in range(nz):
                if xs.dim == 0:
                    out[jz] = xs.xs_0d[l]
                else:
                    TT = min(max(T[jz], xs.temp[0]), xs.temp[-1])
                    out[jz] = 10.0 ** lin1(xs.temp, xs.log10_xs[:, l], TT)
            return out

        # Rayleigh (ground-up accumulation, then flip)
        tausg = np.zeros(nz)
        for xs in op.ray:
            j = xs.sp_inds[0]
            for k in range(nz):
                tausg[k] += xs.xs_0d[l] * cols[k, j]
        tausg = flip(tausg)

        # CIA + photolysis/absorption + water continuum
        taua = np.zeros(nz)
        for xs in op.cia:
            v = interp_xs(xs)
            j, jj = xs.sp_inds
            for k in range(nz):
                taua[k] += v[k] * densities[k, j] * densities[k, jj] * dz[k]
        for xs in list(op.pxs) + list(op.axs):
            v = interp_xs(xs)
            j = xs.sp_inds[0]
            for k in range(nz):
                taua[k] += v[k] * cols[k, j]
        if op.cont is not None:
            LH2O = op.cont.LH2O
            for k in range(nz):
                TT = min(max(T[k], op.cont.temp[0]), op.cont.temp[-1])
                xH2O = 10.0 ** lin1(op.cont.temp, op.cont.log10_xs_H2O[:, l], TT)
                xfor = 10.0 ** lin1(op.cont.temp, op.cont.log10_xs_foreign[:, l], TT)
                foreign_col = sum(
                    cols[k, i] for i in range(cols.shape[1]) if i != LH2O
                )
                taua[k] += xH2O * densities[k, LH2O] * cols[k, LH2O]
                taua[k] += xfor * densities[k, LH2O] * foreign_col
        taua = flip(taua)

        # particles (types.f90:736-760)
        taup = np.zeros(nz)
        tausp = np.zeros(nz)
        gt = np.zeros(nz)
        tausp_1_all = []
        if op.part and pdensities is not None:
            for part in op.part:
                j = part.p_ind
                tausp_1 = np.zeros(nz)
                for k in range(nz):
                    rp = min(max(radii[k, j], part.radii[0]), part.radii[-1])
                    w0p = lin1(part.radii, part.w0[:, l], rp)
                    qextp = lin1(part.radii, part.qext[:, l], rp)
                    taup_1 = (
                        qextp * np.pi * radii[k, j] ** 2 * pdensities[k, j] * dz[k]
                    )
                    n = nz - 1 - k
                    taup[n] += taup_1
                    tausp_1[n] = w0p * taup_1
                tausp += tausp_1
                tausp_1_all.append(tausp_1)
        tausc = np.zeros(nz)  # no custom opacity in this test
        tauc = np.zeros(nz)
        if op.part and pdensities is not None:
            for ip, part in enumerate(op.part):
                j = part.p_ind
                for k in range(nz):
                    rp = min(max(radii[k, j], part.radii[0]), part.radii[-1])
                    gtp = lin1(part.radii, part.gt[:, l], rp)
                    n = nz - 1 - k
                    gt[n] += gtp * tausp_1_all[ip][n] / max(
                        const.tau_min, tausp[n] + tausg[n] + tausc[n]
                    )
        gt = np.minimum(gt, const.max_gt)

        # --- k_rorr (types.f90:780-888) ---
        j1 = op.k[0].sp_ind
        tau_k = ks[0] * cols[:, j1][:, None]  # (nz, nbin), ground-up
        for jj in range(1, len(op.k)):
            j2 = op.k[jj].sp_ind
            tau_xy = np.zeros((nz, nbin * nbin))
            for i in range(nbin):
                for j in range(nbin):
                    tau_xy[:, i * nbin + j] = (
                        tau_k[:, i] + ks[jj][:, j] * cols[:, j2]
                    )
            for iz in range(nz):
                inds = np.argsort(tau_xy[iz], kind="stable")  # mrgrnk
                tau_sorted = tau_xy[iz][inds]
                w_sorted = wxy[inds]
                w_e = np.concatenate([[0.0], np.cumsum(w_sorted)])
                tau_k[iz, :] = np_rebin(w_e, tau_sorted, wbin_e)

        for i in range(nbin):
            taua_1 = flip(tau_k[:, i])
            tau_tot = tausg + taua + taup + taua_1 + tauc
            w0_tot = np.zeros(nz)
            for jz in range(nz):
                if tau_tot[jz] <= const.tau_min:
                    w0_tot[jz] = 0.0
                else:
                    w0_tot[jz] = min(
                        const.max_w0,
                        (tausg[jz] + tausp[jz] + tausc[jz]) / tau_tot[jz],
                    )
            tau[l, i, :] = tau_tot
            w0[l, i, :] = w0_tot
            tau_band[l, :] += tau_tot * wbin[i]
        g[l, :] = gt

    return dict(tau=tau, w0=w0, g=g, tau_band=tau_band)


def oracle_radiate(channel, op, opr, emissivity, albedo, has_hard, ir_tau_min,
                   diurnal_fac, photons_sol, zenith_u, zenith_w, T_surface, T):
    """radiate transcription (radiate.f90:7-196). Returns ground-up
    fup_a/fdn_a (nz+1, nw_ch), amean, fup_n/fdn_n."""
    nz = len(T)
    i0, i1 = channel.ind_start, channel.ind_end
    nw_ch = i1 - i0 + 1
    fup_a = np.zeros((nz + 1, nw_ch))
    fdn_a = np.zeros((nz + 1, nw_ch))
    amean_a = np.zeros((nz + 1, nw_ch))
    wbin = np.asarray(op.kset.wbin)
    nbin = op.kset.nbin

    for l in range(i0, i1 + 1):
        ll = l - i0
        if channel.channel_type == "ir":
            avg_freq = 0.5 * (op.freq[l] + op.freq[l + 1])
            bplanck = np.zeros(nz + 1)
            bplanck[nz] = float(planck_fcn(avg_freq, T_surface))
            for j in range(nz):
                bplanck[nz - 1 - j] = float(planck_fcn(avg_freq, T[j]))
        fup2 = np.zeros(nz + 1)
        fdn2 = np.zeros(nz + 1)
        amean2 = np.zeros(nz + 1)
        for ii in range(len(zenith_u)):
            fup1 = np.zeros(nz + 1)
            fdn1 = np.zeros(nz + 1)
            amean1 = np.zeros(nz + 1)
            for i in range(nbin):
                if channel.channel_type == "solar":
                    amean0, _, fup0, fdn0 = np_two_stream_solar(
                        opr["tau"][l, i, :], opr["w0"][l, i, :], opr["g"][l, :],
                        zenith_u[ii], albedo[ll],
                    )
                    amean1 += amean0 * wbin[i]
                else:
                    fup0, fdn0 = np_two_stream_ir(
                        opr["tau"][l, i, :], opr["w0"][l, i, :], opr["g"][l, :],
                        emissivity[ll], has_hard, ir_tau_min, bplanck,
                    )
                fup1 += fup0 * wbin[i]
                fdn1 += fdn0 * wbin[i]
            fup2 += fup1 * zenith_w[ii]
            fdn2 += fdn1 * zenith_w[ii]
            amean2 += amean1 * zenith_w[ii]
        # reverse to ground-up
        fup_a[:, ll] = fup2[::-1]
        fdn_a[:, ll] = fdn2[::-1]
        amean_a[:, ll] = amean2[::-1]

    if channel.channel_type == "solar":
        for ll in range(nw_ch):
            fup_a[:, ll] *= photons_sol[ll] * diurnal_fac
            fdn_a[:, ll] *= photons_sol[ll] * diurnal_fac
            amean_a[:, ll] *= photons_sol[ll] * diurnal_fac
            avg_freq = 0.5 * (channel.freq[ll] + channel.freq[ll + 1])
            avg_wavl = 1.0e9 * const.c_light / avg_freq
            amean_a[:, ll] *= avg_freq / avg_wavl
            amean_a[:, ll] *= (
                avg_wavl / (const.plank * const.c_light * 1.0e16)
                * (channel.wavl[ll + 1] - channel.wavl[ll])
            )

    fup_n = np.zeros(nz + 1)
    fdn_n = np.zeros(nz + 1)
    for ll in range(nw_ch):
        dfreq = channel.freq[ll] - channel.freq[ll + 1]
        fup_n += fup_a[:, ll] * dfreq
        fdn_n += fdn_a[:, ll] * dfreq
    return fup_a, fdn_a, amean_a, fup_n, fdn_n


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("template_oracle")
    t = make_template_dir(str(root), nz=8, n_zenith=2, particles=True)
    s = load_settings(t["settings"])
    sp = load_species(t["species"])
    op = data_mod.load_optical_data(
        t["datadir"], sp.gas_names, sp.particle_names, s.op
    )
    ir = data_mod.load_channel(t["datadir"], "ir", None, op)
    sol = data_mod.load_channel(t["datadir"], "solar", None, op)
    photons = data_mod.read_stellar_flux(t["star"], sol.wavl)

    nz = 8
    rng = np.random.default_rng(7)
    T = np.linspace(285.0, 210.0, nz) * rng.uniform(0.98, 1.02, nz)
    P_bar = np.geomspace(1.0, 1e-4, nz)
    den = P_bar * 1.0e6 / (const.k_boltz * T)
    ng = sp.ng
    mix = np.full((nz, ng), 1e-8)
    mix[:, sp.gas_names.index("H2O")] = 1e-2 * np.geomspace(1, 1e-3, nz)
    mix[:, sp.gas_names.index("CO2")] = 400e-6
    mix[:, sp.gas_names.index("CH4")] = 1.8e-6
    mix[:, sp.gas_names.index("O2")] = 0.21
    mix[:, sp.gas_names.index("N2")] = 1.0 - mix.sum(axis=1)
    densities = mix * den[:, None]
    dz = np.full(nz, 6.0e5)
    np_part = sp.np_
    pdens = np.full((nz, np_part), 10.0) * rng.uniform(0.5, 2.0, (nz, np_part))
    pradii = np.full((nz, np_part), 1.0e-5)

    return dict(op=op, ir=ir, sol=sol, photons=photons, T=T, P=P_bar,
                densities=densities, dz=dz, pdens=pdens, pradii=pradii)


def test_opacity_oracle(setup):
    """Vectorized compute_opacity == loop-literal reference transcription."""
    s = setup
    got = compute_opacity(
        s["op"], jnp.asarray(s["P"]), jnp.asarray(s["T"]),
        jnp.asarray(s["densities"]), jnp.asarray(s["dz"]),
        jnp.asarray(s["pdens"]), jnp.asarray(s["pradii"]),
    )
    want = oracle_compute_opacity(
        s["op"], s["P"], s["T"], s["densities"], s["dz"], s["pdens"], s["pradii"]
    )
    np.testing.assert_allclose(np.asarray(got["tau"]), want["tau"], rtol=1e-9)
    np.testing.assert_allclose(np.asarray(got["w0"]), want["w0"], rtol=1e-9,
                               atol=1e-15)
    np.testing.assert_allclose(np.asarray(got["g"]), want["g"], rtol=1e-9,
                               atol=1e-15)
    np.testing.assert_allclose(np.asarray(got["tau_band"]), want["tau_band"],
                               rtol=1e-9)


def test_radiate_oracle(setup):
    """Vectorized radiate_ir/radiate_solar == per-bin loop transcription."""
    s = setup
    op, ir, sol = s["op"], s["ir"], s["sol"]
    opr = compute_opacity(
        op, jnp.asarray(s["P"]), jnp.asarray(s["T"]),
        jnp.asarray(s["densities"]), jnp.asarray(s["dz"]),
        jnp.asarray(s["pdens"]), jnp.asarray(s["pradii"]),
    )
    opr_np = {k: np.asarray(v) for k, v in opr.items()}
    T_surface = 289.0
    emis = np.full(ir.nw, 0.95)
    alb = np.full(sol.nw, 0.25)
    ang, zw = zenith_angles_and_weights(2)
    zen_u = np.cos(np.asarray(ang) * np.pi / 180.0)
    zw = np.asarray(zw)

    # IR
    got = radiate_ir(
        (ir.ind_start, ir.ind_end), jnp.asarray(op.freq),
        jnp.asarray(op.kset.wbin), opr, jnp.asarray(emis), True, 1e-6,
        T_surface, jnp.asarray(s["T"]),
    )
    fup_n_got, fdn_n_got = integrate_fluxes(
        got["fup_a"], got["fdn_a"],
        jnp.asarray(op.freq[ir.ind_start : ir.ind_end + 2]),
    )
    fup_a, fdn_a, _, fup_n, fdn_n = oracle_radiate(
        ir, op, opr_np, emis, alb, True, 1e-6, 0.5, s["photons"],
        np.array([0.5]), np.array([1.0]), T_surface, s["T"],
    )
    np.testing.assert_allclose(np.asarray(got["fup_a"]), fup_a, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(got["fdn_a"]), fdn_a, rtol=1e-8,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(fup_n_got), fup_n, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(fdn_n_got), fdn_n, rtol=1e-8)

    # solar
    got = radiate_solar(
        (sol.ind_start, sol.ind_end), jnp.asarray(op.freq),
        jnp.asarray(op.wavl), jnp.asarray(op.kset.wbin), opr,
        jnp.asarray(alb), 0.5, jnp.asarray(s["photons"]),
        jnp.asarray(zen_u), jnp.asarray(zw),
    )
    fup_n_got, fdn_n_got = integrate_fluxes(
        got["fup_a"], got["fdn_a"],
        jnp.asarray(op.freq[sol.ind_start : sol.ind_end + 2]),
    )
    fup_a, fdn_a, amean_a, fup_n, fdn_n = oracle_radiate(
        sol, op, opr_np, emis, alb, True, 1e-6, 0.5, s["photons"],
        zen_u, zw, T_surface, s["T"],
    )
    np.testing.assert_allclose(np.asarray(got["fup_a"]), fup_a, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(got["fdn_a"]), fdn_a, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(got["amean"]), amean_a, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(fup_n_got), fup_n, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(fdn_n_got), fdn_n, rtol=1e-8)
