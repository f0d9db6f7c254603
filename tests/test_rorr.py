import numpy as np
import pytest

from clima_tpu.ops.rorr import k_rorr_mix, make_wxy
from clima_tpu.ops.rebin import rebin


def weights_to_bins_np(w):
    return np.concatenate([[0.0], np.cumsum(w)])


def brute_force_rorr(tau_ks, wbin):
    """Direct transcription of k_rorr (clima_radtran_types.f90:815-854)."""
    nk, nz, nbin = tau_ks.shape
    wbin_e = weights_to_bins_np(wbin)
    wxy = np.outer(wbin, wbin).reshape(-1)  # i slow, j fast
    tau_k = tau_ks[0].copy()
    for jj in range(1, nk):
        tau_xy = np.zeros((nz, nbin * nbin))
        for i in range(nbin):
            for j in range(nbin):
                tau_xy[:, j + i * nbin] = tau_k[:, i] + tau_ks[jj][:, j]
        for lay in range(nz):
            inds = np.argsort(tau_xy[lay], kind="stable")
            tau_sorted = tau_xy[lay][inds]
            w_sorted = wxy[inds]
            wxy_e = weights_to_bins_np(w_sorted)
            tau_k[lay] = rebin(wxy_e, tau_sorted, wbin_e)
    return tau_k


@pytest.mark.parametrize("nk", [1, 2, 3])
def test_rorr_vs_bruteforce(nk):
    rng = np.random.default_rng(10 + nk)
    nz, nbin = 9, 8
    w = rng.uniform(0.5, 1.5, nbin)
    wbin = w / w.sum()
    wbin_e = weights_to_bins_np(wbin)
    tau_ks = 10 ** rng.uniform(-6, 1, (nk, nz, nbin))
    tau_ks.sort(axis=-1)  # k-coefficients are sorted within a bin
    expect = brute_force_rorr(tau_ks, wbin)
    got = np.asarray(k_rorr_mix(tau_ks, wbin_e))
    np.testing.assert_allclose(got, expect, rtol=1e-10)


def test_rorr_single_species_identity():
    rng = np.random.default_rng(2)
    tau = 10 ** rng.uniform(-4, 1, (1, 5, 8))
    wbin = np.full(8, 0.125)
    got = np.asarray(k_rorr_mix(tau, weights_to_bins_np(wbin)))
    np.testing.assert_allclose(got, tau[0], rtol=1e-12)


def test_rorr_mean_preserved():
    # RORR preserves the weight-averaged optical depth of the combination
    rng = np.random.default_rng(5)
    nk, nz, nbin = 3, 4, 8
    w = rng.uniform(0.5, 1.5, nbin)
    wbin = w / w.sum()
    tau_ks = 10 ** rng.uniform(-3, 0, (nk, nz, nbin))
    tau_ks.sort(axis=-1)
    got = np.asarray(k_rorr_mix(tau_ks, weights_to_bins_np(wbin)))
    mean_mix = np.sum(got * wbin, axis=-1)
    mean_sum = np.sum(np.sum(tau_ks * wbin, axis=-1), axis=0)
    np.testing.assert_allclose(mean_mix, mean_sum, rtol=1e-10)


def test_make_wxy():
    wbin = np.array([0.25, 0.75])
    np.testing.assert_allclose(
        np.asarray(make_wxy(wbin)), [0.0625, 0.1875, 0.1875, 0.5625], rtol=1e-14
    )


def test_aee_single_species_identity():
    from clima_tpu.ops.rorr import k_aee_mix

    rng = np.random.default_rng(7)
    tau = 10 ** rng.uniform(-4, 1, (1, 5, 8))
    tau.sort(axis=-1)
    wbin = np.full(8, 0.125)
    got = np.asarray(k_aee_mix(tau, wbin))
    np.testing.assert_allclose(got, tau[0], rtol=1e-12)


def test_aee_preserves_band_mean():
    from clima_tpu.ops.rorr import k_aee_mix

    rng = np.random.default_rng(8)
    nk, nz, nbin = 3, 6, 8
    w = rng.uniform(0.5, 1.5, nbin)
    wbin = w / w.sum()
    tau_ks = 10 ** rng.uniform(-3, 0, (nk, nz, nbin))
    tau_ks.sort(axis=-1)
    got = np.asarray(k_aee_mix(tau_ks, wbin))
    np.testing.assert_allclose(
        np.sum(got * wbin, axis=-1),
        np.sum(np.sum(tau_ks * wbin, axis=-1), axis=0),
        rtol=1e-12,
    )
    # major species keeps its spectral structure: subtracting the grey offset
    # recovers the major's k-distribution
    grey = np.sum(tau_ks * wbin, axis=-1)
    for lay in range(nz):
        m = np.argmax(grey[:, lay])
        offset = np.sum(grey[:, lay]) - grey[m, lay]
        np.testing.assert_allclose(got[lay] - offset, tau_ks[m, lay], rtol=1e-10)


def test_aee_end_to_end(tmp_path):
    """AEE-configured Radtran runs and is within ~20% of RORR OLR."""
    from clima_tpu.data import make_template_dir
    from clima_tpu.radtran import Radtran
    from clima_tpu.physics import eqns
    import jax.numpy as jnp
    import os

    t = make_template_dir(str(tmp_path / "tpl"), nz=16, n_zenith=1)
    settings_aee = str(tmp_path / "settings_aee.yaml")
    with open(t["settings"]) as f:
        txt = f.read()
    with open(settings_aee, "w") as f:
        f.write(txt.replace("RandomOverlapResortRebin", "AdaptiveEquivalentExtinction"))

    def make(settings):
        from clima_tpu.config import load_settings, load_species

        sp = load_species(t["species"])
        return Radtran(sp.gas_names, [], load_settings(settings), t["star"],
                       1, 0.25, 16, t["datadir"])

    from clima_tpu.config import load_species

    sp = load_species(t["species"])
    nz = 16
    z, dz = eqns.vertical_grid(0.0, 0.7e7, nz)
    T = np.maximum(288.0 - 6.5e-5 * z, 210.0)
    P, den = [np.asarray(x) for x in eqns.press_and_den(
        jnp.asarray(T), jnp.full(nz, 981.0), 1.013e6, jnp.asarray(dz),
        jnp.full(nz, 28.6))]
    ng = sp.ng
    mix = np.full((nz, ng), 1e-12)
    mix[:, sp.gas_names.index("H2O")] = 1e-2
    mix[:, sp.gas_names.index("CO2")] = 400e-6
    mix[:, sp.gas_names.index("N2")] = 1.0 - 1e-2 - 400e-6
    dens = mix * den[:, None]

    r1 = make(t["settings"])
    r2 = make(settings_aee)
    isr1, olr1 = r1.TOA_fluxes(288.0, T, P / 1e6, dens, dz)
    isr2, olr2 = r2.TOA_fluxes(288.0, T, P / 1e6, dens, dz)
    assert np.isfinite(olr2) and olr2 > 0
    np.testing.assert_allclose(olr2, olr1, rtol=0.2)
    np.testing.assert_allclose(isr2, isr1, rtol=0.2)
