"""Two-stream radiative transfer in double-float (df64) precision.

Same algorithms as ops.twostream / ops.tridiag (Toon et al. 1989 coefficient
sets, 2x2-block PCR — cites src/radtran/clima_radtran_twostream.f90), with
every arithmetic operation carried in (hi, lo) float32 pairs (ops.df64).
This gives ~1e-12-relative fluxes on TPUs with no float64 hardware — enough
for the device RCE residual to reach the reference tolerance
xtol_rc = 1e-5 (clima_adiabat_solve.f90:620-646), which plain f32 cannot
(the f32 IR two-stream carries ~1e-4 relative error; see CLAUDE.md).

Inputs arrive as plain float32 (from the f32 opacity assembly) and are
promoted exactly (lo = 0): the df64 path computes the SAME mathematical
function of the same f32 inputs, just ~2^24 more accurately. Outputs are DF;
callers collapse to f32 only after the cancellation-prone flux differencing
(radtran.radiate_df).

Cost: a DF op is ~10-20 f32 flops, and this path is pure XLA (no Pallas), so
expect ~1 order of magnitude over the fused f32 kernels — it is the *strict*
mode, used when reference-tolerance equilibria are required on-chip.

Numerical equality with float64 is asserted in tests/test_twostream_df.py
(df64(f32 inputs) vs numpy float64 on the same inputs).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .df64 import (
    DF, to_df, const_df, df_where, df_concatenate, df_sqrt, df_exp, df_expm1,
    df_cumsum, df_flush_tiny, df_map, df_zeros_like,
)
from .. import constants as const

__all__ = [
    "two_stream_ir_df",
    "two_stream_solar_multi_df",
    "block2_pcr_components_df",
    "block2_pcr_components_multi_df",
    "planck_fcn_df",
]

_SQRT3 = 3.0**0.5


def planck_fcn_df(nu, T):
    """Planck function in df64, mW sr^-1 m^-2 Hz^-1 (clima_eqns.f90:64-73).

    Same overflow-safe factorization as physics.eqns.planck_fcn; ``nu``/``T``
    plain arrays or DF.
    """
    nu = to_df(nu)
    T = to_df(T)
    h = const.plank
    c = const.c_light
    kb = const.k_boltz_si
    x = nu * const_df(h / kb) / T
    # factor as 2e3 * ((h*nu)/c) * (nu/c) * nu so every intermediate stays in
    # the f32 normal range (the prefactor 2e3*h/c^2 ~ 1e-51 alone underflows;
    # see physics.eqns.planck_fcn for the same analysis). h itself (6.6e-34)
    # is f32-normal but OUTSIDE the df64 full-precision window (its pair lo
    # and Dekker split parts go subnormal, which XLA flushes to zero — see
    # ops.df64 docstring): carry it scaled by 2^40 and fold 2^-40 into the
    # final constant, both exactly.
    h_s = h * 2.0**40
    pre = (
        ((nu * const_df(h_s)) / const_df(c)) * (nu / const_df(c)) * nu
        * const_df(2.0e3 * 2.0**-40)
    )
    return pre / df_expm1(x)


def _shift_df(x, k, fill):
    """x shifted by k along the last axis; ``fill`` fills vacated slots
    (hi = fill, lo = 0)."""
    pad_hi = jnp.full(x.hi.shape[:-1] + (abs(k),), fill, x.hi.dtype)
    pad_lo = jnp.zeros_like(pad_hi)
    if k > 0:
        return DF(
            jnp.concatenate([x.hi[..., k:], pad_hi], axis=-1),
            jnp.concatenate([x.lo[..., k:], pad_lo], axis=-1),
        )
    return DF(
        jnp.concatenate([pad_hi, x.hi[..., :k]], axis=-1),
        jnp.concatenate([pad_lo, x.lo[..., :k]], axis=-1),
    )



def _barrier(*dfs):
    """Identity optimization barrier over DF values.

    XLA:CPU's recompute-in-consumer fusion duplicates deep DF expression
    diamonds recursively (each DF op reads its operands several times), which
    blows the optimized HLO up exponentially with depth — measured 50x
    runtime and 4x compile on the PCR sweeps before these barriers. A
    barrier after each sweep forces materialization of the carried state,
    bounding duplication to one sweep. On TPU the barrier is effectively
    free (fusions are multi-output there, but the barrier also does no
    harm to them).
    """
    flat = []
    for d in dfs:
        flat.extend((d.hi, d.lo))
    out = jax.lax.optimization_barrier(tuple(flat))
    return tuple(DF(out[2 * i], out[2 * i + 1]) for i in range(len(dfs)))


def block2_pcr_components_df(L01, M00, M01, M10, M11, U10, f0, f1):
    """df64 2x2-block PCR (structured form of ops.tridiag.block2_pcr_components)."""
    m = L01.hi.shape[-1]
    steps = max(1, math.ceil(math.log2(m)))
    one = DF(jnp.ones(()), jnp.zeros(()))
    for s in range(steps):
        k = 1 << s
        inv_det = one / (M00 * M11 - M01 * M10)
        i00 = M11 * inv_det
        i01 = -M01 * inv_det
        i10 = -M10 * inv_det
        i11 = M00 * inv_det

        a0 = L01 * _shift_df(i10, -k, 0.0)
        a1 = L01 * _shift_df(i11, -k, 1.0)
        g0 = U10 * _shift_df(i00, +k, 1.0)
        g1 = U10 * _shift_df(i01, +k, 0.0)

        L01_new = df_flush_tiny(-(a0 * _shift_df(L01, -k, 0.0)))
        U10_new = df_flush_tiny(-(g1 * _shift_df(U10, +k, 0.0)))
        M00 = M00 - a1 * _shift_df(U10, -k, 0.0)
        M11 = M11 - g0 * _shift_df(L01, +k, 0.0)
        f0_new = f0 - a0 * _shift_df(f0, -k, 0.0) - a1 * _shift_df(f1, -k, 0.0)
        f1_new = f1 - g0 * _shift_df(f0, +k, 0.0) - g1 * _shift_df(f1, +k, 0.0)
        L01, U10, f0, f1, M00, M11 = _barrier(
            L01_new, U10_new, f0_new, f1_new, M00, M11
        )

    inv_det = one / (M00 * M11 - M01 * M10)
    u0 = (M11 * f0 - M01 * f1) * inv_det
    u1 = (M00 * f1 - M10 * f0) * inv_det
    return u0, u1


def block2_pcr_components_multi_df(L01, M00, M01, M10, M11, U10, f0s, f1s):
    """df64 multi-RHS block PCR: matrix components ``batch + (m,)``, RHS
    ``(nrhs,) + batch + (m,)`` (shared elimination, per-RHS sweeps)."""
    m = L01.hi.shape[-1]
    steps = max(1, math.ceil(math.log2(m)))
    one = DF(jnp.ones(()), jnp.zeros(()))
    expand = lambda x: DF(x.hi[None], x.lo[None])
    for s in range(steps):
        k = 1 << s
        inv_det = one / (M00 * M11 - M01 * M10)
        i00 = M11 * inv_det
        i01 = -M01 * inv_det
        i10 = -M10 * inv_det
        i11 = M00 * inv_det

        a0 = L01 * _shift_df(i10, -k, 0.0)
        a1 = L01 * _shift_df(i11, -k, 1.0)
        g0 = U10 * _shift_df(i00, +k, 1.0)
        g1 = U10 * _shift_df(i01, +k, 0.0)

        L01_new = df_flush_tiny(-(a0 * _shift_df(L01, -k, 0.0)))
        U10_new = df_flush_tiny(-(g1 * _shift_df(U10, +k, 0.0)))
        M00 = M00 - a1 * _shift_df(U10, -k, 0.0)
        M11 = M11 - g0 * _shift_df(L01, +k, 0.0)
        f0_new = (
            f0s - expand(a0) * _shift_df(f0s, -k, 0.0)
            - expand(a1) * _shift_df(f1s, -k, 0.0)
        )
        f1_new = (
            f1s - expand(g0) * _shift_df(f0s, +k, 0.0)
            - expand(g1) * _shift_df(f1s, +k, 0.0)
        )
        L01, U10, f0s, f1s, M00, M11 = _barrier(
            L01_new, U10_new, f0_new, f1_new, M00, M11
        )

    inv_det = one / (M00 * M11 - M01 * M10)
    u0s = (expand(M11) * f0s - expand(M01) * f1s) * expand(inv_det)
    u1s = (expand(M00) * f1s - expand(M10) * f0s) * expand(inv_det)
    return u0s, u1s


def _es_df(lam, cap_gam, tau):
    # flush transmissions below 1e-15: contribution is ~3 orders under the
    # pair epsilon, and it keeps every downstream product's two_prod
    # internals out of the f32 subnormal range (df64.df_flush_tiny)
    wrk = df_flush_tiny(df_exp(-(lam * tau)))
    e1 = cap_gam * wrk + 1.0
    e2 = -(cap_gam * wrk) + 1.0
    e3 = cap_gam + wrk
    e4 = cap_gam - wrk
    return e1, e2, e3, e4


def _matrix_rows_df(e1, e2, e3, e4, Rsfc):
    """df64 even/odd coefficient rows (mirrors twostream._matrix_rows)."""
    zeros = df_zeros_like(e1[..., :1])
    Rs = df_map(lambda a: a[..., None], to_df(Rsfc))

    A_ev = df_concatenate(
        [zeros, e2[..., :-1] * e3[..., :-1] - e4[..., :-1] * e1[..., :-1]], axis=-1
    )
    B_ev = df_concatenate(
        [e1[..., :1], e1[..., :-1] * e1[..., 1:] - e3[..., :-1] * e3[..., 1:]],
        axis=-1,
    )
    D_ev = df_concatenate(
        [-e2[..., :1], e3[..., :-1] * e4[..., 1:] - e1[..., :-1] * e2[..., 1:]],
        axis=-1,
    )
    A_od = df_concatenate(
        [
            e2[..., 1:] * e1[..., :-1] - e3[..., :-1] * e4[..., 1:],
            e1[..., -1:] - Rs * e3[..., -1:],
        ],
        axis=-1,
    )
    B_od = df_concatenate(
        [
            e2[..., :-1] * e2[..., 1:] - e4[..., :-1] * e4[..., 1:],
            e2[..., -1:] - Rs * e4[..., -1:],
        ],
        axis=-1,
    )
    D_od = df_concatenate(
        [
            e1[..., 1:] * e4[..., 1:] - e2[..., 1:] * e3[..., 1:],
            zeros,
        ],
        axis=-1,
    )
    return A_ev, B_ev, D_ev, A_od, B_od, D_od


def _rhs_rows_df(e1, e2, e3, e4, cp0, cpb, cm0, cmb, Rsfc, Ssfc):
    Rs = df_map(lambda a: a[..., None], to_df(Rsfc))
    E_ev = df_concatenate(
        [
            -cm0[..., :1],
            e3[..., :-1] * (cp0[..., 1:] - cpb[..., :-1])
            + e1[..., :-1] * (cmb[..., :-1] - cm0[..., 1:]),
        ],
        axis=-1,
    )
    E_od = df_concatenate(
        [
            e2[..., 1:] * (cp0[..., 1:] - cpb[..., :-1])
            - e4[..., 1:] * (cm0[..., 1:] - cmb[..., :-1]),
            Ssfc - cpb[..., -1:] + Rs * cmb[..., -1:],
        ],
        axis=-1,
    )
    return E_ev, E_od


def two_stream_ir_df(tau, w0, gt, emissivity, has_hard_surface, tau_min, bplanck):
    """df64 IR hemispheric-mean two-stream (twostream.f90:156-295).

    ``tau``/``w0``/``gt`` plain f32 arrays (..., nz) TOA-down; ``bplanck`` DF
    or plain (..., nz+1). Returns (fup, fdn) as DF (..., nz+1).
    """
    tau = to_df(tau)
    w0 = to_df(w0)
    gt = to_df(gt)
    bplanck = to_df(bplanck)
    emis = to_df(emissivity)

    u1 = 0.5
    norm = 2.0 * const.pi * u1

    if has_hard_surface:
        Rsfc = -emis + 1.0
    else:
        Rsfc = df_zeros_like(emis)

    gam1 = -(w0 * (gt + 1.0)) + 2.0
    gam2 = w0 * (-gt + 1.0)
    lam = df_sqrt(gam1 * gam1 - gam2 * gam2)
    cap_gam = gam2 / (gam1 + lam)
    e1, e2, e3, e4 = _es_df(lam, cap_gam, tau)
    # barrier between the coefficient and row/RHS stages: without it
    # XLA:CPU's recompute-in-consumer fusion re-expands the deep
    # sqrt/div/exp chains of e1..e4 into each of the ~20 row products
    # (measured: >2 min compile and ~100x runtime for the IR kernel)
    e1, e2, e3, e4, gam1, gam2 = _barrier(e1, e2, e3, e4, gam1, gam2)

    b_top = bplanck[..., :-1]
    b_bot = bplanck[..., 1:]
    thin = tau.hi <= tau_min
    b0n = df_where(thin, (b_top + b_bot) * 0.5, b_top)
    safe_tau = df_where(thin, DF(jnp.ones_like(tau.hi)), tau)
    b1n = df_where(thin, df_zeros_like(b_top), (b_bot - b_top) / safe_tau)

    inv_g = DF(jnp.ones_like(gam1.hi)) / (gam1 + gam2)
    cp0 = (b0n + b1n * inv_g) * norm
    cpb = (b0n + b1n * (tau + inv_g)) * norm
    cm0 = (b0n - b1n * inv_g) * norm
    cmb = (b0n + b1n * (tau - inv_g)) * norm
    cp0, cpb, cm0, cmb = _barrier(cp0, cpb, cm0, cmb)

    if has_hard_surface:
        Ssfc = df_map(lambda a: a[..., None], emis) * const.pi * bplanck[..., -1:]
    else:
        thin_bot = tau.hi[..., -1:] <= tau_min
        safe_tb = df_where(thin_bot, DF(jnp.ones_like(tau.hi[..., -1:])), tau[..., -1:])
        b1_bot = df_where(
            thin_bot,
            df_zeros_like(bplanck[..., -1:]),
            (bplanck[..., -1:] - bplanck[..., -2:-1]) / safe_tb,
        )
        Ssfc = (bplanck[..., -1:] + b1_bot * u1) * const.pi

    A_ev, B_ev, D_ev, A_od, B_od, D_od = _matrix_rows_df(e1, e2, e3, e4, Rsfc)
    E_ev, E_od = _rhs_rows_df(e1, e2, e3, e4, cp0, cpb, cm0, cmb, Rsfc, Ssfc)
    y1, y2 = block2_pcr_components_df(
        A_ev, B_ev, D_ev, A_od, B_od, D_od, E_ev, E_od
    )

    fup = df_concatenate(
        [
            y1[..., :1] * e3[..., :1] - y2[..., :1] * e4[..., :1] + cp0[..., :1],
            y1 * e1 + y2 * e2 + cpb,
        ],
        axis=-1,
    )
    fdn = df_concatenate(
        [df_zeros_like(tau[..., :1]), y1 * e3 + y2 * e4 + cmb], axis=-1
    )
    return fup, fdn


def two_stream_solar_multi_df(tau_in, w0_in, gt_in, u0s, Rsfc):
    """df64 multi-zenith solar two-stream (shared-matrix multi-RHS form of
    ops.twostream.two_stream_solar_multi). Returns (fup, fdn) as DF with a
    leading nzen axis; amean/surface radiance are omitted (the RCE residual
    needs fluxes only)."""
    tau_in = to_df(tau_in)
    w0_in = to_df(w0_in)
    gt_in = to_df(gt_in)
    u0s = jnp.asarray(u0s)
    nzen = u0s.shape[0]
    u0 = to_df(u0s.reshape((nzen,) + (1,) * tau_in.hi.ndim))
    one = DF(jnp.ones(()), jnp.zeros(()))

    # delta-Eddington scaling
    denom_sc = -(w0_in * gt_in * gt_in) + 1.0
    tau = tau_in * denom_sc
    w0 = w0_in * (-(gt_in * gt_in) + 1.0) / denom_sc
    gt = gt_in / (gt_in + 1.0)

    Fs_pi = 1.0
    gam1 = (-(w0 * (gt + 1.0)) + 2.0) * (_SQRT3 / 2.0)
    gam2 = w0 * (-gt + 1.0) * (_SQRT3 / 2.0)
    lam = df_sqrt(gam1 * gam1 - gam2 * gam2)
    cap_gam = gam2 / (gam1 + lam)
    e1, e2, e3, e4 = _es_df(lam, cap_gam, tau)
    tauc = df_concatenate(
        [df_zeros_like(tau[..., :1]), df_cumsum(tau, axis=-1)], axis=-1
    )
    # stage barrier (see two_stream_ir_df): stops XLA:CPU re-expanding the
    # deep coefficient chains into every downstream product
    e1, e2, e3, e4, lam, tauc, tau, w0, gt = _barrier(
        e1, e2, e3, e4, lam, tauc, tau, w0, gt
    )

    expand = lambda x: DF(x.hi[None], x.lo[None])
    inv_u0 = one / u0
    gam3 = (-(expand(gt) * u0 * _SQRT3) + 1.0) * 0.5
    gam4 = -gam3 + 1.0
    facp = expand(w0) * ((expand(gam1) - inv_u0) * gam3 + gam4 * expand(gam2)) * Fs_pi
    facm = expand(w0) * ((expand(gam1) + inv_u0) * gam4 + expand(gam2) * gam3) * Fs_pi
    et0 = df_flush_tiny(
        df_exp(-(df_map(lambda a: jnp.expand_dims(a[..., :-1], 0), tauc) * inv_u0))
    )
    etb = df_flush_tiny(et0 * df_exp(-(expand(tau) * inv_u0)))
    denom = expand(lam * lam) - inv_u0 * inv_u0

    direct = df_concatenate(
        [
            u0 * Fs_pi * DF(jnp.ones_like(etb.hi[..., :1])),
            u0 * Fs_pi * etb,
        ],
        axis=-1,
    )
    cp0 = et0 * facp / denom
    cpb = etb * facp / denom
    cm0 = et0 * facm / denom
    cmb = etb * facm / denom
    cp0, cpb, cm0, cmb, direct = _barrier(cp0, cpb, cm0, cmb, direct)

    Rs = df_map(lambda a: a[..., None], to_df(Rsfc))
    Ssfc = expand(Rs) * direct[..., -1:]

    A_ev, B_ev, D_ev, A_od, B_od, D_od = _matrix_rows_df(e1, e2, e3, e4, to_df(Rsfc))
    E_ev, E_od = _rhs_rows_df(
        expand(e1), expand(e2), expand(e3), expand(e4),
        cp0, cpb, cm0, cmb, to_df(Rsfc), Ssfc,
    )
    y1, y2 = block2_pcr_components_multi_df(
        A_ev, B_ev, D_ev, A_od, B_od, D_od, E_ev, E_od
    )

    e1n, e2n, e3n, e4n = expand(e1), expand(e2), expand(e3), expand(e4)
    fup = df_concatenate(
        [
            y1[..., :1] * e3n[..., :1] - y2[..., :1] * e4n[..., :1] + cp0[..., :1],
            y1 * e1n + y2 * e2n + cpb,
        ],
        axis=-1,
    )
    fdn = df_concatenate(
        [direct[..., :1], y1 * e3n + y2 * e4n + cmb + direct[..., 1:]], axis=-1
    )
    return fup, fdn
