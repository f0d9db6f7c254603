"""Cancellation-safe RT edge parts in df64 (f32-pair) precision.

The device RCE residual is a ~1e-5..1e-8-relative cancellation of gross
fluxes (see ``rce._f_total_edges_precise``): the plain-f32 two-stream carries
~1e-4 relative arithmetic error, which floors TPU (no float64 hardware)
convergence at max|F/F0| ~ 6e-3 — far from the reference tolerance
xtol_rc = 1e-5 (``src/adiabat/clima_adiabat_solve.f90:620-646``).

This module provides builders for the two per-channel quantities the RCE
residual actually consumes — the net flux at the bottom physical edge
(``base``) and its exact adjacent-edge deltas (``d``) — computed with the
two-stream solve, Planck sources, spectral weights, and frequency integral
carried entirely in (hi, lo) float32 pairs (:mod:`clima_tpu.ops.df64`,
:mod:`clima_tpu.ops.twostream_df`). Opacities arrive as plain f32 (the df64
path evaluates the same mathematical function of the same f32-assembled
tau/w0/g, just ~2^20 more accurately); all host-precision constants (bin
frequencies, k-weights, stellar fluxes) enter as exact f64 -> pair splits.

Returned ``base``/``d`` are DF values; callers accumulate the edge cumsum in
DF and collapse to plain f32 last (``rce_device``).

Mirrors ``radiate_ir`` / ``radiate_solar`` (clima_radtran_radiate.f90:7-196)
bin/gauss/zenith weighting semantics exactly; validated against the float64
standard path in tests/test_radiate_df.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.df64 import DF, to_df, df_map, df_sum, df_diff, df_concatenate
from ..ops.twostream_df import (
    two_stream_ir_df,
    two_stream_solar_multi_df,
    planck_fcn_df,
)

__all__ = ["from_f64", "build_ir_parts_df", "build_solar_parts_df"]


def from_f64(x):
    """Exact float64 numpy -> DF pair split (for host-precision constants)."""
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def _pow2_scale(m):
    """(s, inv_s): exact powers of two with s*m ~ 1, built from exponent
    bits (exp2 is 1-2 ulp off even at integers — see ops.df64.df_exp).

    Scaling a DF pair by an exact power of two multiplies hi and lo exactly,
    so it neither adds arithmetic error nor perturbs the pair structure.
    """
    ki = jnp.clip(
        jnp.round(jnp.log2(jnp.maximum(m, 1e-37))), -126.0, 126.0
    ).astype(jnp.int32)
    as_f32 = lambda k: jax.lax.bitcast_convert_type(
        (k + 127) << 23, jnp.float32
    )
    return as_f32(-ki), as_f32(ki)


def _edge_parts(net_td, dfreq, n_phys):
    """(base, d) from TOA-down per-bin DF net fluxes (nw, nzr+1).

    base = frequency-integrated net at the bottom physical edge; d[j] =
    integral of the exact adjacent-physical-edge deltas (every other edge of
    the doubled radiative grid). Mirrors ``rce_device._net_edge_parts``.
    """
    net_gu = df_map(lambda a: a[:, ::-1], net_td)
    net_p = df_map(lambda a: a[:, 0::2][:, :n_phys], net_gu)
    base = df_sum(net_p[:, 0] * dfreq, axis=0)
    d = df_sum(df_diff(net_p, axis=1) * df_map(lambda a: a[:, None], dfreq),
               axis=0)
    return base, d


def build_ir_parts_df(channel_slice, freq_np, wbin_np, emis_np,
                      has_hard_surface, ir_tau_min, n_phys):
    """Build ``ir_parts(opr, T_surf, T_r) -> (base, d)`` in df64.

    ``freq_np``: full master frequency grid (numpy f64); ``emis_np``: per-bin
    surface emissivity; ``n_phys``: nz+1 physical edges (ground-up).
    """
    i0, i1 = channel_slice
    freq = np.asarray(freq_np, np.float64)[i0 : i1 + 2]
    avg_freq = from_f64(0.5 * (freq[:-1] + freq[1:]))
    dfreq = from_f64(freq[:-1] - freq[1:])
    wbin = from_f64(wbin_np)
    emis_p = from_f64(emis_np)
    nw = freq.shape[0] - 1
    nG = np.asarray(wbin_np).shape[0]

    def ir_parts(opr, T_surface, T_r):
        tau = opr["tau"][i0 : i1 + 1]  # (nw, G, nzr) plain f32, TOA-down
        w0 = opr["w0"][i0 : i1 + 1]
        g = opr["g"][i0 : i1 + 1]
        nzr = tau.shape[-1]

        T_td = T_r[::-1]
        nu_col = df_map(lambda a: a[:, None], avg_freq)
        bplanck_atm = planck_fcn_df(nu_col, to_df(T_td)[None, :])
        bplanck_surf = planck_fcn_df(
            nu_col, df_map(lambda a: a * jnp.ones((1, 1)), to_df(T_surface))
        )
        bplanck = df_concatenate([bplanck_atm, bplanck_surf], axis=1)

        # Per-bin power-of-two source normalization. Real IR Planck
        # radiances span ~1e-9 down to ~1e-22 mW/m^2/Hz across bins; the IR
        # solve is LINEAR in its source, but carrying ~1e-22 magnitudes
        # through the DF two-stream makes the Dekker split products inside
        # two_prod subnormal (x86: ~100-cycle microcode per op — measured
        # ~100x wall-clock blowup of the full objective on XLA:CPU).
        # Scaling by an exact power of two is error-free, keeps internals
        # O(1), and is inverted on the net fluxes below.
        m = jnp.max(jnp.abs(bplanck.hi), axis=1)  # (nw,)
        s, inv_s = _pow2_scale(m)
        bplanck = df_map(lambda a: a * s[:, None], bplanck)

        flat = lambda x: jnp.broadcast_to(
            x, (nw, nG) + x.shape[2:]
        ).reshape(nw * nG, -1)
        bplanck_f = df_map(
            lambda a: jnp.broadcast_to(a[:, None, :], (nw, nG, nzr + 1)).reshape(
                nw * nG, nzr + 1
            ),
            bplanck,
        )
        emis_f = df_map(
            lambda a: jnp.broadcast_to(a[:, None], (nw, nG)).reshape(nw * nG),
            emis_p,
        )
        fup, fdn = two_stream_ir_df(
            flat(tau), flat(w0), flat(g[:, None, :]), emis_f,
            has_hard_surface, ir_tau_min, bplanck_f,
        )
        net = fdn - fup  # DF (nw*G, nzr+1) TOA-down, in scaled source units
        net = df_map(
            lambda a: a.reshape(nw, nG, nzr + 1) * inv_s[:, None, None], net
        )
        net_w = df_sum(net * df_map(lambda a: a[None, :, None], wbin), axis=1)
        return _edge_parts(net_w, dfreq, n_phys)

    return ir_parts


def build_solar_parts_df(channel_slice, freq_np, wbin_np, albedo_np,
                         diurnal_fac, photons_np, zenith_u_np, zenith_w_np,
                         n_phys, with_toa=False):
    """Build ``solar_parts(opr) -> (base, d)`` in df64.

    ``photons_np``: per-bin stellar flux (already photon-scale-factored,
    numpy f64); zenith angles/weights as in ``radiate_solar``. With
    ``with_toa=True`` the function returns ``(base, d, fup_toa, fdn_toa)``
    where the last two are the frequency-integrated TOA fluxes (plain f32)
    — the inputs of the bond albedo used by the tidally-locked
    heat-redistribution factor (clima_adiabat.f90:1322-1340).
    """
    i0, i1 = channel_slice
    freq = np.asarray(freq_np, np.float64)[i0 : i1 + 2]
    dfreq = from_f64(freq[:-1] - freq[1:])
    wbin = from_f64(wbin_np)
    alb_p = from_f64(albedo_np)
    # per-bin scale folded with the diurnal factor and zenith weights applied
    # per (zenith, bin): scale_zw[z, w] = photons[w] * diurnal * zw[z]
    scale_zw = from_f64(
        np.asarray(photons_np, np.float64)[None, :] * float(diurnal_fac)
        * np.asarray(zenith_w_np, np.float64)[:, None]
    )
    zen_u = np.asarray(zenith_u_np, np.float64)
    u0s = jnp.asarray(zen_u.astype(np.float32))
    nzen = zen_u.shape[0]
    nw = freq.shape[0] - 1
    nG = np.asarray(wbin_np).shape[0]

    def solar_parts(opr):
        tau = opr["tau"][i0 : i1 + 1]
        w0 = opr["w0"][i0 : i1 + 1]
        g = opr["g"][i0 : i1 + 1]
        nzr = tau.shape[-1]

        flat = lambda x: jnp.broadcast_to(
            x, (nw, nG) + x.shape[2:]
        ).reshape(nw * nG, -1)
        alb_f = df_map(
            lambda a: jnp.broadcast_to(a[:, None], (nw, nG)).reshape(nw * nG),
            alb_p,
        )
        fup, fdn = two_stream_solar_multi_df(
            flat(tau), flat(w0), flat(g[:, None, :]), u0s, alb_f,
        )
        net = fdn - fup  # DF (nzen, nw*G, nzr+1)
        net_r = df_map(lambda a: a.reshape(nzen, nw, nG, nzr + 1), net)
        net_g = df_sum(net_r * df_map(lambda a: a[None, None, :, None], wbin),
                       axis=2)  # (nzen, nw, nzr+1)
        net_zw = df_sum(
            net_g * df_map(lambda a: a[:, :, None], scale_zw), axis=0
        )  # (nw, nzr+1)
        parts = _edge_parts(net_zw, dfreq, n_phys)
        if not with_toa:
            return parts

        def toa_int(x):
            # TOA edge (index 0 TOA-down) -> zenith/gauss/frequency integral
            xt = df_map(lambda a: a.reshape(nzen, nw, nG, nzr + 1)[..., 0], x)
            xg = df_sum(xt * df_map(lambda a: a[None, None, :], wbin), axis=2)
            xz = df_sum(xg * scale_zw, axis=0)  # (nw,)
            return df_sum(xz * dfreq, axis=0).astype_sum()

        return parts[0], parts[1], toa_int(fup), toa_int(fdn)

    return solar_parts
