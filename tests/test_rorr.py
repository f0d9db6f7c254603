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
