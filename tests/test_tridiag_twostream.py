import numpy as np
import jax.numpy as jnp
import pytest

from clima_tpu.ops.tridiag import (
    tridiag,
    tridiag_batched_last,
    block2_pcr_components,
    block2_pcr_components_dense,
)
from clima_tpu.ops.twostream import two_stream_solar, two_stream_ir
from clima_tpu.physics.eqns import planck_fcn
from clima_tpu import constants as const


def fortran_tridiag(a, b, c, d):
    """Direct transcription oracle of twostream.f90:297-316 (numpy, serial)."""
    a, b, c, d = [x.copy() for x in (a, b, c, d)]
    n = len(a)
    c[0] = c[0] / b[0]
    d[0] = d[0] / b[0]
    for i in range(1, n - 1):
        c[i] = c[i] / (b[i] - a[i] * c[i - 1])
        d[i] = (d[i] - a[i] * d[i - 1]) / (b[i] - a[i] * c[i - 1])
    d[n - 1] = (d[n - 1] - a[n - 1] * d[n - 2]) / (b[n - 1] - a[n - 1] * c[n - 2])
    for i in range(n - 2, -1, -1):
        d[i] = d[i] - c[i] * d[i + 1]
    return d


def test_tridiag_vs_dense():
    rng = np.random.default_rng(0)
    n = 40
    a = rng.uniform(0.1, 1, n)
    b = rng.uniform(3, 5, n)  # diagonally dominant
    c = rng.uniform(0.1, 1, n)
    d = rng.uniform(-1, 1, n)
    M = np.diag(b) + np.diag(a[1:], -1) + np.diag(c[:-1], 1)
    expect = np.linalg.solve(M, d)
    got = np.asarray(tridiag(a, b, c, d))
    np.testing.assert_allclose(got, expect, rtol=1e-10)
    np.testing.assert_allclose(got, fortran_tridiag(a, b, c, d), rtol=1e-12)


@pytest.mark.parametrize("m", [1, 2, 3, 7, 8, 101])
def test_block2_pcr_structured_vs_dense_vs_thomas(m):
    """ADVICE r2: direct structured-vs-dense block-PCR equality (and both vs
    the Thomas oracle) across block counts incl. m=1 and odd m."""
    rng = np.random.default_rng(42 + m)
    n = 2 * m
    a = rng.uniform(0.1, 1.0, n)
    b = rng.uniform(3.0, 5.0, n) * np.where(rng.uniform(size=n) < 0.5, -1.0, 1.0)
    c = rng.uniform(0.1, 1.0, n)
    d = rng.uniform(-1.0, 1.0, n)
    a[0] = 0.0
    c[-1] = 0.0

    comps = (a[0::2], b[0::2], c[0::2], a[1::2], b[1::2], c[1::2], d[0::2], d[1::2])
    u0_s, u1_s = block2_pcr_components(*comps)
    u0_d, u1_d = block2_pcr_components_dense(*comps)
    np.testing.assert_allclose(np.asarray(u0_s), np.asarray(u0_d), rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(u1_s), np.asarray(u1_d), rtol=1e-12, atol=1e-14)

    x_pcr = np.empty(n)
    x_pcr[0::2] = np.asarray(u0_s)
    x_pcr[1::2] = np.asarray(u1_s)
    x_thomas = fortran_tridiag(a, b, c, d)
    np.testing.assert_allclose(x_pcr, x_thomas, rtol=1e-9, atol=1e-12)


def test_tridiag_batched():
    rng = np.random.default_rng(1)
    B, n = 7, 20
    a = rng.uniform(0.1, 1, (B, n))
    b = rng.uniform(3, 5, (B, n))
    c = rng.uniform(0.1, 1, (B, n))
    d = rng.uniform(-1, 1, (B, n))
    got = np.asarray(tridiag_batched_last(a, b, c, d))
    for i in range(B):
        np.testing.assert_allclose(got[i], fortran_tridiag(a[i], b[i], c[i], d[i]), rtol=1e-11)


# ---------------------------------------------------------------------------
# Two-stream oracles: direct numpy transcriptions of the Fortran reference
# (tests/test_radtran-style validation without the Fortran binary)
# ---------------------------------------------------------------------------


def np_two_stream_solar(tau_in, w0_in, gt_in, u0, Rsfc):
    nz = len(tau_in)
    tau = tau_in * (1 - w0_in * gt_in**2)
    w0 = w0_in * (1 - gt_in**2) / (1 - w0_in * gt_in**2)
    gt = gt_in / (1 + gt_in)
    sq3 = np.sqrt(3.0)
    u1 = 1 / sq3
    gam1 = sq3 * (2 - w0 * (1 + gt)) / 2
    gam2 = sq3 * w0 * (1 - gt) / 2
    gam3 = (1 - sq3 * gt * u0) / 2
    gam4 = 1 - gam3
    lam = np.sqrt(gam1**2 - gam2**2)
    cap = gam2 / (gam1 + lam)
    wrk = np.exp(-lam * tau)
    e1 = 1 + cap * wrk
    e2 = 1 - cap * wrk
    e3 = cap + wrk
    e4 = cap - wrk
    tauc = np.concatenate([[0], np.cumsum(tau)])
    facp = w0 * ((gam1 - 1 / u0) * gam3 + gam4 * gam2)
    facm = w0 * ((gam1 + 1 / u0) * gam4 + gam2 * gam3)
    et0 = np.exp(-tauc[:-1] / u0)
    etb = et0 * np.exp(-tau / u0)
    denom = lam**2 - 1 / u0**2
    direct = np.concatenate([[u0], u0 * etb])
    cp0 = et0 * facp / denom
    cpb = etb * facp / denom
    cm0 = et0 * facm / denom
    cmb = etb * facm / denom
    Ssfc = Rsfc * direct[-1]
    A = np.zeros(2 * nz)
    B = np.zeros(2 * nz)
    D = np.zeros(2 * nz)
    E = np.zeros(2 * nz)
    A[0], B[0], D[0], E[0] = 0, e1[0], -e2[0], -cm0[0]
    for i in range(1, nz):  # Fortran i=1..nz-1 -> 0-based j=i-1
        j = i - 1
        l = 2 * i  # 0-based odd-row position
        A[l] = e2[j] * e3[j] - e4[j] * e1[j]
        B[l] = e1[j] * e1[j + 1] - e3[j] * e3[j + 1]
        D[l] = e3[j] * e4[j + 1] - e1[j] * e2[j + 1]
        E[l] = e3[j] * (cp0[j + 1] - cpb[j]) + e1[j] * (cmb[j] - cm0[j + 1])
        l = 2 * i - 1
        A[l] = e2[j + 1] * e1[j] - e3[j] * e4[j + 1]
        B[l] = e2[j] * e2[j + 1] - e4[j] * e4[j + 1]
        D[l] = e1[j + 1] * e4[j + 1] - e2[j + 1] * e3[j + 1]
        E[l] = e2[j + 1] * (cp0[j + 1] - cpb[j]) - e4[j + 1] * (cm0[j + 1] - cmb[j])
    l = 2 * nz - 1
    A[l] = e1[-1] - Rsfc * e3[-1]
    B[l] = e2[-1] - Rsfc * e4[-1]
    D[l] = 0
    E[l] = Ssfc - cpb[-1] + Rsfc * cmb[-1]
    sol = fortran_tridiag(A, B, D, E)
    y1 = sol[0::2]
    y2 = sol[1::2]
    amean = np.zeros(nz + 1)
    amean[0] = (1 / u1) * (y1[0] * e3[0] - y2[0] * e4[0] + cp0[0]) + direct[0] / u0
    amean[1:] = (1 / u1) * (y1 * (e1 + e3) + y2 * (e2 + e4) + cpb + cmb) + direct[1:] / u0
    fup = np.concatenate([[y1[0] * e3[0] - y2[0] * e4[0] + cp0[0]], y1 * e1 + y2 * e2 + cpb])
    fdn = np.concatenate([[direct[0]], y1 * e3 + y2 * e4 + cmb + direct[1:]])
    srad = (y1[-1] * e3[-1] + y2[-1] * e4[-1] + cmb[-1]) / u1 + np.exp(-tauc[-1] / u0)
    return amean, srad, fup, fdn


def np_two_stream_ir(tau, w0, gt, emissivity, hard, tau_min, bplanck):
    nz = len(tau)
    u1 = 0.5
    norm = 2 * np.pi * u1
    Rsfc = (1 - emissivity) if hard else 0.0
    gam1 = 2 - w0 * (1 + gt)
    gam2 = w0 * (1 - gt)
    lam = np.sqrt(gam1**2 - gam2**2)
    cap = gam2 / (gam1 + lam)
    wrk = np.exp(-lam * tau)
    e1, e2, e3, e4 = 1 + cap * wrk, 1 - cap * wrk, cap + wrk, cap - wrk
    cp0 = np.zeros(nz)
    cpb = np.zeros(nz)
    cm0 = np.zeros(nz)
    cmb = np.zeros(nz)
    for i in range(nz):
        if tau[i] <= tau_min:
            b0n = 0.5 * (bplanck[i] + bplanck[i + 1])
            b1n = 0.0
        else:
            b0n = bplanck[i]
            b1n = (bplanck[i + 1] - b0n) / tau[i]
        ig = 1 / (gam1[i] + gam2[i])
        cp0[i] = norm * (b0n + b1n * ig)
        cpb[i] = norm * (b0n + b1n * (tau[i] + ig))
        cm0[i] = norm * (b0n - b1n * ig)
        cmb[i] = norm * (b0n + b1n * (tau[i] - ig))
    if hard:
        Ssfc = emissivity * np.pi * bplanck[-1]
    else:
        b1b = 0.0 if tau[-1] <= tau_min else (bplanck[-1] - bplanck[-2]) / tau[-1]
        Ssfc = np.pi * (bplanck[-1] + u1 * b1b)
    A = np.zeros(2 * nz)
    B = np.zeros(2 * nz)
    D = np.zeros(2 * nz)
    E = np.zeros(2 * nz)
    A[0], B[0], D[0], E[0] = 0, e1[0], -e2[0], -cm0[0]
    for i in range(1, nz):
        j = i - 1
        l = 2 * i
        A[l] = e2[j] * e3[j] - e4[j] * e1[j]
        B[l] = e1[j] * e1[j + 1] - e3[j] * e3[j + 1]
        D[l] = e3[j] * e4[j + 1] - e1[j] * e2[j + 1]
        E[l] = e3[j] * (cp0[j + 1] - cpb[j]) + e1[j] * (cmb[j] - cm0[j + 1])
        l = 2 * i - 1
        A[l] = e2[j + 1] * e1[j] - e3[j] * e4[j + 1]
        B[l] = e2[j] * e2[j + 1] - e4[j] * e4[j + 1]
        D[l] = e1[j + 1] * e4[j + 1] - e2[j + 1] * e3[j + 1]
        E[l] = e2[j + 1] * (cp0[j + 1] - cpb[j]) - e4[j + 1] * (cm0[j + 1] - cmb[j])
    l = 2 * nz - 1
    A[l] = e1[-1] - Rsfc * e3[-1]
    B[l] = e2[-1] - Rsfc * e4[-1]
    D[l] = 0
    E[l] = Ssfc - cpb[-1] + Rsfc * cmb[-1]
    sol = fortran_tridiag(A, B, D, E)
    y1, y2 = sol[0::2], sol[1::2]
    fup = np.concatenate([[y1[0] * e3[0] - y2[0] * e4[0] + cp0[0]], y1 * e1 + y2 * e2 + cpb])
    fdn = np.concatenate([[0.0], y1 * e3 + y2 * e4 + cmb])
    return fup, fdn


def random_atmosphere(rng, nz):
    tau = rng.uniform(1e-4, 2.0, nz)
    w0 = rng.uniform(0.05, 0.95, nz)
    gt = rng.uniform(0.0, 0.8, nz)
    return tau, w0, gt


def test_two_stream_solar_vs_oracle():
    rng = np.random.default_rng(7)
    nz = 30
    tau, w0, gt = random_atmosphere(rng, nz)
    u0, Rsfc = 0.6, 0.25
    am_o, sr_o, fup_o, fdn_o = np_two_stream_solar(tau, w0, gt, u0, Rsfc)
    am, sr, fup, fdn = [np.asarray(x) for x in two_stream_solar(tau, w0, gt, u0, Rsfc)]
    np.testing.assert_allclose(fup, fup_o, rtol=1e-10)
    np.testing.assert_allclose(fdn, fdn_o, rtol=1e-10)
    np.testing.assert_allclose(am, am_o, rtol=1e-10)
    np.testing.assert_allclose(sr, sr_o, rtol=1e-10)


def test_two_stream_solar_conservation():
    # conservative atmosphere (w0 -> 1) with Rsfc=1 should reflect everything
    nz = 20
    tau = np.full(nz, 0.3)
    w0 = np.full(nz, 0.99999)
    gt = np.full(nz, 0.5)
    _, _, fup, fdn = [np.asarray(x) for x in two_stream_solar(tau, w0, gt, 0.7, 1.0)]
    np.testing.assert_allclose(fup[0], fdn[0], rtol=1e-3)


def test_two_stream_solar_pure_absorption_direct_beam():
    # no scattering: fdn at surface = direct beam attenuation, fup=0 with black surface
    nz = 25
    tau = np.linspace(0.01, 0.1, nz)
    w0 = np.full(nz, 1e-12)
    gt = np.zeros(nz)
    u0 = 0.5
    _, _, fup, fdn = [np.asarray(x) for x in two_stream_solar(tau, w0, gt, u0, 0.0)]
    np.testing.assert_allclose(fdn[-1], u0 * np.exp(-np.sum(tau) / u0), rtol=1e-6)
    np.testing.assert_allclose(fup, 0.0, atol=1e-8)


def test_two_stream_ir_vs_oracle():
    rng = np.random.default_rng(8)
    nz = 30
    tau, w0, gt = random_atmosphere(rng, nz)
    T = np.linspace(200.0, 300.0, nz + 1)
    nu = 2.0e13
    bpl = np.asarray(planck_fcn(nu, jnp.asarray(T)))
    for hard in (True, False):
        fup_o, fdn_o = np_two_stream_ir(tau, w0, gt, 0.9, hard, 1e-6, bpl)
        fup, fdn = [
            np.asarray(x) for x in two_stream_ir(tau, w0, gt, 0.9, hard, 1e-6, bpl)
        ]
        np.testing.assert_allclose(fup, fup_o, rtol=1e-9)
        np.testing.assert_allclose(fdn, fdn_o, rtol=1e-9)


def test_two_stream_ir_isothermal_blackbody():
    # optically thick isothermal atmosphere: OLR -> pi*B(T)
    nz = 60
    tau = np.full(nz, 2.0)
    w0 = np.full(nz, 1e-12)
    gt = np.zeros(nz)
    T = 250.0
    nu = 3.0e13
    bpl = np.full(nz + 1, float(planck_fcn(nu, T)))
    fup, fdn = [np.asarray(x) for x in two_stream_ir(tau, w0, gt, 1.0, True, 1e-6, bpl)]
    np.testing.assert_allclose(fup[0], np.pi * bpl[0], rtol=1e-6)


def test_two_stream_batched_matches_loop():
    rng = np.random.default_rng(9)
    B, nz = 6, 15
    tau = rng.uniform(1e-3, 1.0, (B, nz))
    w0 = rng.uniform(0.1, 0.9, (B, nz))
    gt = rng.uniform(0.0, 0.7, (B, nz))
    u0 = rng.uniform(0.2, 1.0, B)
    Rsfc = rng.uniform(0, 0.5, B)
    am, sr, fup, fdn = [
        np.asarray(x) for x in two_stream_solar(tau, w0, gt, u0, Rsfc)
    ]
    for b in range(B):
        _, _, fup_o, fdn_o = np_two_stream_solar(tau[b], w0[b], gt[b], u0[b], Rsfc[b])
        np.testing.assert_allclose(fup[b], fup_o, rtol=1e-9)
        np.testing.assert_allclose(fdn[b], fdn_o, rtol=1e-9)
