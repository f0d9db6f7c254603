"""Pallas kernel validation (interpret mode on CPU; Mosaic equality is
exercised on real TPU by bench/entry)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import jax.experimental.pallas as pl
from unittest import mock

from clima_tpu.ops.twostream import two_stream_solar, two_stream_ir
from clima_tpu.ops import pallas_twostream as pts
from clima_tpu.ops.pallas_rorr import rorr_mix_pair_pallas, mix_pair_rank_ref
from clima_tpu.ops.rorr import _mix_pair, make_wxy
from clima_tpu.physics.eqns import planck_fcn


@pytest.fixture()
def interpret():
    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig, interpret=True)):
        yield


def _atm(B=24, nz=33, seed=0):
    rng = np.random.default_rng(seed)
    tau = rng.uniform(1e-6, 2.0, (B, nz))
    w0 = rng.uniform(0.02, 0.999, (B, nz))
    gt = rng.uniform(0.0, 0.85, (B, nz))
    return tau, w0, gt


def test_solar_kernel_matches_xla(interpret):
    B, nz = 24, 33
    tau, w0, gt = _atm(B, nz)
    rng = np.random.default_rng(1)
    u0 = rng.uniform(0.2, 1.0, B)
    rs = rng.uniform(0.0, 0.6, B)
    ref = two_stream_solar(jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt),
                           jnp.asarray(u0), jnp.asarray(rs))
    got = pts.two_stream_solar_pallas(
        jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt),
        jnp.asarray(u0), jnp.asarray(rs), block_b=8,
    )
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-10)


def test_solar_multi_kernel_matches_xla(interpret):
    B, nz, nzen = 24, 33, 4
    tau, w0, gt = _atm(B, nz)
    rng = np.random.default_rng(7)
    u0s = rng.uniform(0.2, 1.0, nzen)
    rs = rng.uniform(0.0, 0.6, B)
    from clima_tpu.ops.twostream import two_stream_solar_multi

    ref = two_stream_solar_multi(
        jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt),
        jnp.asarray(u0s), jnp.asarray(rs),
    )
    got = pts.two_stream_solar_multi_pallas(
        jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt),
        jnp.asarray(u0s), jnp.asarray(rs), block_b=8,
    )
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-10)


def test_solar_multi_matches_per_zenith():
    """Shared-matrix multi-RHS solve == independent per-zenith solves."""
    B, nz, nzen = 19, 27, 3
    tau, w0, gt = _atm(B, nz, seed=5)
    rng = np.random.default_rng(6)
    u0s = rng.uniform(0.2, 1.0, nzen)
    rs = rng.uniform(0.0, 0.6, B)
    from clima_tpu.ops.twostream import two_stream_solar_multi

    got = two_stream_solar_multi(
        jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt),
        jnp.asarray(u0s), jnp.asarray(rs),
    )
    for z in range(nzen):
        ref = two_stream_solar(
            jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt),
            jnp.full(B, u0s[z]), jnp.asarray(rs),
        )
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g[z]), np.asarray(r), rtol=1e-10)


def test_block2_pcr_multi_matches_per_rhs():
    from clima_tpu.ops.tridiag import (
        block2_pcr_components,
        block2_pcr_components_multi,
    )

    rng = np.random.default_rng(11)
    m, B, nrhs = 13, 5, 4
    comps = [jnp.asarray(rng.uniform(0.1, 1.0, (B, m))) for _ in range(3)]
    diags = [jnp.asarray(rng.uniform(3.0, 5.0, (B, m))) for _ in range(3)]
    L01, M01, U10 = comps
    M00, M10, M11 = diags
    f0s = jnp.asarray(rng.uniform(-1.0, 1.0, (nrhs, B, m)))
    f1s = jnp.asarray(rng.uniform(-1.0, 1.0, (nrhs, B, m)))
    u0s, u1s = block2_pcr_components_multi(L01, M00, M01, M10, M11, U10, f0s, f1s)
    for r in range(nrhs):
        u0, u1 = block2_pcr_components(L01, M00, M01, M10, M11, U10, f0s[r], f1s[r])
        np.testing.assert_allclose(np.asarray(u0s[r]), np.asarray(u0), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(u1s[r]), np.asarray(u1), rtol=1e-12)


@pytest.mark.parametrize("hard", [True, False])
def test_ir_kernel_matches_xla(interpret, hard):
    B, nz = 16, 21
    tau, w0, gt = _atm(B, nz, seed=2)
    T = np.linspace(290.0, 180.0, nz + 1)
    bpl = np.asarray(planck_fcn(2.0e13, jnp.asarray(T)))[None, :].repeat(B, axis=0)
    emis = np.full(B, 0.95)
    ref = two_stream_ir(jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt),
                        jnp.asarray(emis), hard, 1e-6, jnp.asarray(bpl))
    got = pts.two_stream_ir_pallas(
        jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt), jnp.asarray(emis),
        hard, 1e-6, jnp.asarray(bpl), block_b=8,
    )
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-10)


def test_rorr_kernel_matches_sort_path(interpret):
    rng = np.random.default_rng(3)
    R = 130
    a = np.sort(10 ** rng.uniform(-6, 1, (R, 8)), axis=-1)
    b = np.sort(10 ** rng.uniform(-6, 1, (R, 8)), axis=-1)
    w = rng.uniform(0.5, 1.5, 8)
    wbin = w / w.sum()
    wbin_e = np.concatenate([[0.0], np.cumsum(wbin)])
    wxy = np.asarray(make_wxy(wbin))
    ref = np.asarray(_mix_pair(jnp.asarray(a), jnp.asarray(b), jnp.asarray(wxy),
                               jnp.asarray(wbin_e)))
    got = np.asarray(rorr_mix_pair_pallas(jnp.asarray(a), jnp.asarray(b), wxy,
                                          wbin_e, block_r=64))
    np.testing.assert_allclose(got, ref, rtol=1e-9)


def test_rank_mix_near_tie_collision():
    """f32 multi-species chain at the TPU-validation shapes: stage-2 keys
    are sums of already-REBINNED values, which cluster and produce
    near-ties within npair ulps of each other. Regression for the r5
    additive tie-break fold (ikey_b = ikey + row_index with an unbiased
    compare): the bias is not injective, biased-key collisions handed two
    pairs the same rank window (double-covered stretch + gap in the
    cumulative-weight partition), and a large key straddling a master-bin
    edge mis-binned by O(pair weight) — measured rorr_maxrel 0.118 on the
    TPU parity sweep / 0.087 on this CPU reproduction, vs ~5e-6 for the
    exact stable rank shipped here."""
    from clima_tpu.ops.pallas_rorr import _pair_weights
    from clima_tpu.ops.rorr import k_rorr_mix

    rng = np.random.default_rng(1)
    nk, nw, nzc, nbin = 3, 64, 202, 8
    w = np.polynomial.legendre.leggauss(nbin)[1]
    wbin = (w / 2.0).astype(np.float64)
    wbin_e = np.concatenate([[0.0], np.cumsum(wbin)])
    wbin_e[-1] = 1.0
    wxy = _pair_weights(wbin)
    tau_ks = jnp.asarray(10.0 ** rng.uniform(-6, 2, (nk, nw, nzc, nbin)),
                         jnp.float32)
    mix_x = np.asarray(
        jax.jit(lambda t: k_rorr_mix(t, jnp.asarray(wbin_e)))(tau_ks),
        np.float64,
    )
    rows = tau_ks.reshape(nk, nw * nzc, nbin)

    @jax.jit
    def chain(rows):
        mixed = rows[0]
        for k in range(1, nk):
            mixed = mix_pair_rank_ref(mixed, rows[k], wxy, wbin_e)
        return mixed

    mix_r = np.asarray(chain(rows), np.float64).reshape(nw, nzc, nbin)
    maxrel = np.abs(mix_r - mix_x).max() / np.abs(mix_x).max()
    assert maxrel < 1e-4, f"rank chain deviates from sort path: {maxrel:.3e}"


def test_rank_ref_tie_handling():
    """Equal keys must get distinct rank windows (no weight duplication)."""
    R = 16
    a = np.full((R, 8), 0.25)
    b = np.full((R, 8), 0.5)  # all 64 pair sums identical
    w = np.full(8, 0.125)
    wbin_e = np.concatenate([[0.0], np.cumsum(w)])
    wxy = np.asarray(make_wxy(w))
    got = np.asarray(mix_pair_rank_ref(jnp.asarray(a), jnp.asarray(b),
                                       wxy, wbin_e))
    np.testing.assert_allclose(got, 0.75, rtol=1e-12)


@pytest.mark.parametrize("nbin", [8, 16])
def test_fused_chain_matches_sequential_xla(interpret, nbin):
    """k_rorr_mix_pallas over 3 species == ops.rorr.k_rorr_mix (nbin 8, 16)."""
    from clima_tpu.ops.pallas_rorr import k_rorr_mix_pallas
    from clima_tpu.ops.rorr import k_rorr_mix

    rng = np.random.default_rng(5)
    tau_ks = 10 ** rng.uniform(-6, 1, (3, 7, 11, nbin))
    w = rng.uniform(0.5, 1.5, nbin)
    wbin = w / w.sum()
    wbin_e = np.concatenate([[0.0], np.cumsum(wbin)])
    ref = np.asarray(k_rorr_mix(jnp.asarray(tau_ks), jnp.asarray(wbin_e)))
    got = np.asarray(k_rorr_mix_pallas(jnp.asarray(tau_ks), wbin, wbin_e,
                                       block_l=32))
    np.testing.assert_allclose(got, ref, rtol=1e-9)


def test_solar_multi_weighted_kernel_matches_xla(interpret):
    from clima_tpu.ops.twostream import (
        two_stream_solar_multi_weighted,
    )

    nw, nG, nz = 7, 4, 33  # nw*nG=28 not divisible by block_b -> pad path
    B = nw * nG
    tau, w0, gt = _atm(B, nz, seed=5)
    rng = np.random.default_rng(6)
    u0s = rng.uniform(0.2, 1.0, 3)
    rs = rng.uniform(0.0, 0.6, B)
    zw = rng.uniform(0.1, 0.5, 3)
    x, w = np.polynomial.legendre.leggauss(nG)
    wbin = w / 2.0

    ref = two_stream_solar_multi_weighted(
        jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt), jnp.asarray(u0s),
        jnp.asarray(rs), jnp.asarray(zw), jnp.asarray(wbin),
    )
    got = pts.two_stream_solar_multi_weighted_pallas(
        jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt), jnp.asarray(u0s),
        jnp.asarray(rs), jnp.asarray(zw), jnp.asarray(wbin), block_b=8,
    )
    for r, g in zip(ref, got):
        assert g.shape == (nw, nz + 1)
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-9,
                                   atol=1e-12)


@pytest.mark.parametrize("hard", [True, False])
def test_ir_weighted_kernel_matches_xla(interpret, hard):
    from clima_tpu.ops.twostream import two_stream_ir_weighted

    nw, nG, nz = 5, 8, 21
    B = nw * nG
    tau, w0, gt = _atm(B, nz, seed=7)
    rng = np.random.default_rng(8)
    emis = rng.uniform(0.8, 1.0, B)
    bpl = rng.uniform(1e-2, 1.0, (B, nz + 1))
    x, w = np.polynomial.legendre.leggauss(nG)
    wbin = w / 2.0
    tau_min = 1e-6
    tau[2, 5] = 1e-7  # exercise the thin-layer branch

    ref = two_stream_ir_weighted(
        jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt), jnp.asarray(emis),
        hard, tau_min, jnp.asarray(bpl), jnp.asarray(wbin),
    )
    got = pts.two_stream_ir_weighted_pallas(
        jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt), jnp.asarray(emis),
        hard, tau_min, jnp.asarray(bpl), jnp.asarray(wbin), block_b=16,
    )
    for r, g in zip(ref, got):
        assert g.shape == (nw, nz + 1)
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-9,
                                   atol=1e-12)


def test_weighted_xla_equals_unfused_reduction():
    """The weighted XLA path is exactly the multi solve + einsum contraction
    radiate_solar used to perform (no Pallas involved)."""
    from clima_tpu.ops.twostream import (
        two_stream_solar_multi,
        two_stream_solar_multi_weighted,
    )

    nw, nG, nz = 6, 8, 41
    B = nw * nG
    tau, w0, gt = _atm(B, nz, seed=9)
    rng = np.random.default_rng(10)
    u0s = rng.uniform(0.2, 1.0, 4)
    rs = rng.uniform(0.0, 0.6, B)
    zw = rng.uniform(0.1, 0.5, 4)
    x, w = np.polynomial.legendre.leggauss(nG)
    wbin = w / 2.0

    amean, _, fup, fdn = two_stream_solar_multi(
        jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt),
        jnp.asarray(u0s), jnp.asarray(rs),
    )
    unflat = lambda a: np.asarray(a).reshape(4, nw, nG, nz + 1)
    am_w, fup_w, fdn_w = two_stream_solar_multi_weighted(
        jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt),
        jnp.asarray(u0s), jnp.asarray(rs), jnp.asarray(zw), jnp.asarray(wbin),
    )
    for got, raw in [(am_w, amean), (fup_w, fup), (fdn_w, fdn)]:
        want = np.einsum("zwgk,g,z->wk", unflat(raw), wbin, zw)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)
