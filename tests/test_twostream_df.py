"""df64 two-stream vs float64 oracle (ops/twostream_df.py).

Strategy: run the df64 path on float32 inputs with x64 DISABLED (so every
array really is a float32 pair, as on TPU), and compare against the
independent numpy float64 transcription of the reference algorithm
(tests/test_tridiag_twostream.py) evaluated on the SAME f32-rounded inputs.
The df64 result must match f64 to ~1e-9 relative — while the plain f32 path
on the same inputs carries ~1e-4..1e-6 — demonstrating the precision the
device RCE residual needs on chips without float64 hardware.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_tridiag_twostream import (
    np_two_stream_ir,
    np_two_stream_solar,
    random_atmosphere,
)

pytestmark = pytest.mark.fast


def _val(x):
    return np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)


def _rel(a, b):
    scale = np.maximum(np.abs(b).max(), 1e-30)
    return np.abs(a - b).max() / scale


def _f32_atmo(rng, nz):
    tau, w0, gt = random_atmosphere(rng, nz)
    return (
        tau.astype(np.float32),
        w0.astype(np.float32),
        gt.astype(np.float32),
    )


def test_ir_df_matches_f64_oracle():
    from clima_tpu.ops.twostream import two_stream_ir
    from clima_tpu.ops.twostream_df import two_stream_ir_df

    rng = np.random.default_rng(11)
    nz = 50
    tau, w0, gt = _f32_atmo(rng, nz)
    bplanck = np.linspace(3.0, 9.0, nz + 1).astype(np.float32)
    emis = np.float32(0.92)
    tau_min = 1e-6
    # force a couple of optically-thin layers through the tau_min branch
    tau[3] = 1e-7
    tau[17] = 5e-7

    fup_o, fdn_o = np_two_stream_ir(
        tau.astype(np.float64), w0.astype(np.float64), gt.astype(np.float64),
        float(emis), True, tau_min, bplanck.astype(np.float64),
    )

    with jax.enable_x64(False):
        fup_df, fdn_df = two_stream_ir_df(
            jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt),
            jnp.asarray(emis), True, tau_min, jnp.asarray(bplanck),
        )
        assert fup_df.hi.dtype == jnp.float32
        fup_32, fdn_32 = two_stream_ir(
            jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt),
            jnp.asarray(emis), True, tau_min, jnp.asarray(bplanck),
        )

    err_df = max(_rel(_val(fup_df), fup_o), _rel(_val(fdn_df), fdn_o))
    err_32 = max(
        _rel(np.asarray(fup_32, np.float64), fup_o),
        _rel(np.asarray(fdn_32, np.float64), fdn_o),
    )
    assert err_df < 1e-9
    # and the plain f32 path really is orders of magnitude worse (this is
    # the cancellation the device RCE residual suffers from)
    assert err_32 > 100 * err_df


def test_ir_df_soft_surface_and_batched():
    from clima_tpu.ops.twostream_df import two_stream_ir_df

    rng = np.random.default_rng(12)
    nz, nb = 24, 6
    taus = np.stack([_f32_atmo(rng, nz)[0] for _ in range(nb)])
    w0s = np.stack([_f32_atmo(rng, nz)[1] for _ in range(nb)])
    gts = np.stack([_f32_atmo(rng, nz)[2] for _ in range(nb)])
    bplancks = rng.uniform(2.0, 10.0, (nb, nz + 1)).astype(np.float32)
    tau_min = 1e-6

    with jax.enable_x64(False):
        fup_df, fdn_df = two_stream_ir_df(
            jnp.asarray(taus), jnp.asarray(w0s), jnp.asarray(gts),
            jnp.zeros(nb, jnp.float32), False, tau_min, jnp.asarray(bplancks),
        )
    for b in range(nb):
        fup_o, fdn_o = np_two_stream_ir(
            taus[b].astype(np.float64), w0s[b].astype(np.float64),
            gts[b].astype(np.float64), 0.0, False, tau_min,
            bplancks[b].astype(np.float64),
        )
        assert _rel(_val(fup_df)[b], fup_o) < 1e-9
        assert _rel(_val(fdn_df)[b], fdn_o) < 1e-9


def test_solar_multi_df_matches_f64_oracle():
    from clima_tpu.ops.twostream_df import two_stream_solar_multi_df

    rng = np.random.default_rng(13)
    nz, nb = 40, 4
    taus = np.stack([_f32_atmo(rng, nz)[0] for _ in range(nb)])
    w0s = np.stack([_f32_atmo(rng, nz)[1] for _ in range(nb)])
    gts = np.stack([_f32_atmo(rng, nz)[2] for _ in range(nb)])
    u0s = np.array([0.2, 0.55, 0.9], np.float32)
    Rsfc = np.full(nb, 0.3, np.float32)

    with jax.enable_x64(False):
        fup_df, fdn_df = two_stream_solar_multi_df(
            jnp.asarray(taus), jnp.asarray(w0s), jnp.asarray(gts),
            jnp.asarray(u0s), jnp.asarray(Rsfc),
        )
    assert fup_df.hi.shape == (len(u0s), nb, nz + 1)

    for zi, u0 in enumerate(u0s):
        for b in range(nb):
            _, _, fup_o, fdn_o = np_two_stream_solar(
                taus[b].astype(np.float64), w0s[b].astype(np.float64),
                gts[b].astype(np.float64), float(u0), 0.3,
            )
            assert _rel(_val(fup_df)[zi, b], fup_o) < 1e-8
            assert _rel(_val(fdn_df)[zi, b], fdn_o) < 1e-8


def test_planck_df_matches_f64():
    from clima_tpu.ops.twostream_df import planck_fcn_df
    from clima_tpu.physics.eqns import planck_fcn

    nu = np.logspace(12.3, 14.7, 64)
    T = np.linspace(150.0, 600.0, 64)
    ref = np.asarray(planck_fcn(jnp.asarray(nu), jnp.asarray(T)), np.float64)
    with jax.enable_x64(False):
        out = planck_fcn_df(
            jnp.asarray(nu.astype(np.float32)), jnp.asarray(T.astype(np.float32))
        )
    # f32 input rounding alone is amplified by d ln B / d ln T ~ x = h nu/kT
    # (up to ~160 on this grid): ~x * 6e-8 ~ 1e-5 relative; the df64
    # arithmetic must not add to that (checked tightly below)
    rel = np.abs(_val(out) - ref) / ref
    assert rel.max() < 2e-5
    # arithmetic precision check on exact-in-f32 inputs
    nu32 = np.asarray(nu.astype(np.float32), np.float64)
    T32 = np.asarray(T.astype(np.float32), np.float64)
    ref32 = np.asarray(
        planck_fcn(jnp.asarray(nu32), jnp.asarray(T32)), np.float64
    )
    rel32 = np.abs(_val(out) - ref32) / ref32
    assert rel32.max() < 1e-10
