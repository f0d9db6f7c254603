"""Fused Pallas TPU kernels for the two-stream solves.

The XLA path (ops.twostream) materializes the coefficient arrays and every
block-PCR sweep in HBM. These kernels run the ENTIRE per-band computation —
delta-Eddington/hemispheric-mean coefficients, block-PCR elimination, and
flux reconstruction — on a VMEM-resident batch tile, so HBM traffic reduces
to reading (tau, w0, gt[, bplanck]) once and writing the flux edges once
(the speed-of-light pattern from the Pallas guide's double-buffered
pipelines; pl.pallas_call auto-pipelines the batch grid).

The kernel bodies reuse the exact jnp math of ops.twostream (cumsum is
expressed as doubling shifts so Mosaic can lower it); numerical equality
with the XLA path is asserted in tests.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import twostream as ts

__all__ = [
    "two_stream_solar_pallas",
    "two_stream_solar_multi_pallas",
    "two_stream_solar_multi_weighted_pallas",
    "two_stream_ir_pallas",
    "two_stream_ir_weighted_pallas",
]


def _solar_kernel(tau_ref, w0_ref, gt_ref, u0_ref, rs_ref,
                  am_ref, sr_ref, fup_ref, fdn_ref):
    # squeeze via reshape (integer indexing lowers to an unsupported
    # dynamic_slice in Mosaic)
    amean, srad, fup, fdn = ts.two_stream_solar(
        tau_ref[...], w0_ref[...], gt_ref[...],
        jnp.squeeze(u0_ref[...], -1), jnp.squeeze(rs_ref[...], -1),
    )
    am_ref[...] = amean
    sr_ref[...] = srad[..., None]
    fup_ref[...] = fup
    fdn_ref[...] = fdn


def _ir_kernel(tau_ref, w0_ref, gt_ref, emis_ref, bpl_ref, fup_ref, fdn_ref,
               *, has_hard_surface, tau_min):
    fup, fdn = ts.two_stream_ir(
        tau_ref[...], w0_ref[...], gt_ref[...], jnp.squeeze(emis_ref[...], -1),
        has_hard_surface, tau_min, bpl_ref[...],
    )
    fup_ref[...] = fup
    fdn_ref[...] = fdn


def _block(bb, nz):
    spec2 = pl.BlockSpec((bb, nz), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((bb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_e = pl.BlockSpec((bb, nz + 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return spec2, spec1, spec_e


def two_stream_solar_pallas(tau, w0, gt, u0, Rsfc, block_b=128):
    """Solar two-stream on a flattened batch: tau/w0/gt (B, nz); u0/Rsfc (B,).

    Returns (amean, surface_radiance, fup, fdn) matching
    ops.twostream.two_stream_solar on 2-D inputs.
    """
    B, nz = tau.shape
    bb = min(block_b, B)
    grid = (pl.cdiv(B, bb),)
    spec2, spec1, spec_e = _block(bb, nz)
    dt = tau.dtype

    amean, srad, fup, fdn = pl.pallas_call(
        _solar_kernel,
        grid=grid,
        in_specs=[spec2, spec2, spec2, spec1, spec1],
        out_specs=(spec_e, spec1, spec_e, spec_e),
        out_shape=(
            jax.ShapeDtypeStruct((B, nz + 1), dt),
            jax.ShapeDtypeStruct((B, 1), dt),
            jax.ShapeDtypeStruct((B, nz + 1), dt),
            jax.ShapeDtypeStruct((B, nz + 1), dt),
        ),
    )(tau, w0, gt, u0[:, None], Rsfc[:, None])
    return amean, srad[:, 0], fup, fdn


def _solar_multi_kernel(tau_ref, w0_ref, gt_ref, u0s_ref, rs_ref,
                        am_ref, sr_ref, fup_ref, fdn_ref):
    amean, srad, fup, fdn = ts.two_stream_solar_multi(
        tau_ref[...], w0_ref[...], gt_ref[...],
        jnp.squeeze(u0s_ref[...], -1), jnp.squeeze(rs_ref[...], -1),
    )
    am_ref[...] = amean
    sr_ref[...] = srad[..., None]
    fup_ref[...] = fup
    fdn_ref[...] = fdn


def two_stream_solar_multi_pallas(tau, w0, gt, u0s, Rsfc, block_b=64):
    """Multi-zenith solar two-stream: tau/w0/gt (B, nz); u0s (nzen,) shared;
    Rsfc (B,). Returns (amean, surface_radiance, fup, fdn) with a leading
    nzen axis, matching ops.twostream.two_stream_solar_multi.

    One kernel invocation computes all nzen solves on a VMEM-resident batch
    tile: the optical-property reads and the block-PCR matrix elimination are
    shared across zenith angles (only the RHS sweeps repeat), so both HBM
    traffic and VPU work drop by ~nzen vs nzen independent kernel calls.
    ``block_b`` is smaller than the single-zenith kernel's because the
    per-zenith particular solutions multiply VMEM residency by nzen.
    """
    B, nz = tau.shape
    nzen = u0s.shape[0]
    bb = min(block_b, B)
    grid = (pl.cdiv(B, bb),)
    spec2, spec1, spec_e = _block(bb, nz)
    uspec = pl.BlockSpec((nzen, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    zspec2 = pl.BlockSpec((nzen, bb, nz + 1), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    zspec1 = pl.BlockSpec((nzen, bb, 1), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    dt = tau.dtype

    amean, srad, fup, fdn = pl.pallas_call(
        _solar_multi_kernel,
        grid=grid,
        in_specs=[spec2, spec2, spec2, uspec, spec1],
        out_specs=(zspec2, zspec1, zspec2, zspec2),
        out_shape=(
            jax.ShapeDtypeStruct((nzen, B, nz + 1), dt),
            jax.ShapeDtypeStruct((nzen, B, 1), dt),
            jax.ShapeDtypeStruct((nzen, B, nz + 1), dt),
            jax.ShapeDtypeStruct((nzen, B, nz + 1), dt),
        ),
    )(tau, w0, gt, jnp.asarray(u0s, dt)[:, None], Rsfc[:, None])
    return amean, srad[..., 0], fup, fdn


def _pad_rows(arrs, B, bb, pad_vals):
    """Zero-risk row padding to a bb multiple (pad rows form their own
    gauss groups, so they only ever contribute to discarded output rows)."""
    rem = (-B) % bb
    if rem == 0:
        return arrs
    out = []
    for a, v in zip(arrs, pad_vals):
        pad = jnp.full((rem,) + a.shape[1:], v, a.dtype)
        out.append(jnp.concatenate([a, pad], axis=0))
    return out


def _solar_multi_weighted_kernel(tau_ref, w0_ref, gt_ref, u0s_ref, rs_ref,
                                 zw_ref, wb_ref, *out_refs, nG):
    """3 outputs (am, fup, fdn) or 2 (fup, fdn): without the amean refs the
    amean assembly below is dead code that Mosaic eliminates (~15% of the
    kernel's VPU ops — the solar kernel is compute-bound, not HBM-bound)."""
    if len(out_refs) == 3:
        am_ref, fup_ref, fdn_ref = out_refs
    else:
        am_ref = None
        fup_ref, fdn_ref = out_refs
    amean, _, fup, fdn = ts.two_stream_solar_multi(
        tau_ref[...], w0_ref[...], gt_ref[...],
        jnp.squeeze(u0s_ref[...], -1), jnp.squeeze(rs_ref[...], -1),
    )
    # zenith-weight contraction over the leading axis, then the gauss-group
    # reduction as a leading-dim reshape + weighted VPU sum. NOT a matmul:
    # an in-kernel MXU dot at Precision.HIGHEST (needed for exact-f32
    # fluxes) measured 6x slower than the whole unfused kernel; the
    # reshape splits only the sublane axis and the multiply-add is exact
    # f32 on the VPU.
    zw = zw_ref[...][:, :, None]  # (nzen, 1, 1)
    wb = wb_ref[...][None, :, :]  # (1, nG, 1)
    ne = amean.shape[-1]
    k = amean.shape[-2] // nG

    def red(x):
        xz = jnp.sum(x * zw, axis=0)  # (bb, nz+1)
        return jnp.sum(xz.reshape(k, nG, ne) * wb, axis=1)

    if am_ref is not None:
        am_ref[...] = red(amean)
    fup_ref[...] = red(fup)
    fdn_ref[...] = red(fdn)


def two_stream_solar_multi_weighted_pallas(tau, w0, gt, u0s, Rsfc, zw, wbin,
                                           block_b=64, with_amean=True):
    """Weight-fused multi-zenith solar kernel: tau/w0/gt (nw*nG, nz)
    bin-major; u0s/zw (nzen,); wbin (nG,). Returns (am_w, fup_w, fdn_w) of
    shape (nw, nz+1) — the zenith- and gauss-weighted sums.

    vs :func:`two_stream_solar_multi_pallas` + XLA reduction this never
    writes the (nzen, nw*nG, nz+1) x3 intermediates to HBM: output traffic
    drops by nzen*nG (~32x at nzen=4, nG=8), which is what moves the solar
    kernel from ~10% of HBM peak toward the IR kernel's fraction
    (VERDICT r3 item 3; weight semantics of
    clima_radtran_radiate.f90:121-135).
    """
    B, nz = tau.shape
    nG = int(np.shape(wbin)[0]) if hasattr(wbin, "shape") else len(wbin)
    nzen = u0s.shape[0]
    dt = tau.dtype
    bb = min(block_b, max(B, nG))
    bb -= bb % nG  # whole gauss groups per block
    bb = max(bb, nG)
    k = bb // nG
    tau, w0, gt, Rsfc = _pad_rows(
        [tau, w0, gt, jnp.asarray(Rsfc)], B, bb, [1e-3, 0.5, 0.1, 0.0]
    )
    Bp = tau.shape[0]
    nw_pad = Bp // nG
    nw = B // nG
    grid = (Bp // bb,)
    spec2, spec1, _ = _block(bb, nz)
    uspec = pl.BlockSpec((nzen, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((nG, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((k, nz + 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    n_out = 3 if with_amean else 2
    outs = pl.pallas_call(
        functools.partial(_solar_multi_weighted_kernel, nG=nG),
        grid=grid,
        in_specs=[spec2, spec2, spec2, uspec, spec1, uspec, gspec],
        out_specs=(ospec,) * n_out,
        out_shape=tuple(
            jax.ShapeDtypeStruct((nw_pad, nz + 1), dt) for _ in range(n_out)
        ),
    )(tau, w0, gt, jnp.asarray(u0s, dt)[:, None], Rsfc[:, None],
      jnp.asarray(zw, dt)[:, None], jnp.asarray(wbin, dt)[:, None])
    if with_amean:
        return outs[0][:nw], outs[1][:nw], outs[2][:nw]
    return None, outs[0][:nw], outs[1][:nw]


def _ir_weighted_kernel(tau_ref, w0_ref, gt_ref, emis_ref, bpl_ref, wb_ref,
                        fup_ref, fdn_ref, *, has_hard_surface, tau_min, nG):
    fup, fdn = ts.two_stream_ir(
        tau_ref[...], w0_ref[...], gt_ref[...],
        jnp.squeeze(emis_ref[...], -1),
        has_hard_surface, tau_min, bpl_ref[...],
    )
    # gauss reduction via reshape + weighted VPU sum (see the solar kernel:
    # an in-kernel HIGHEST-precision MXU dot was 6x slower than unfused)
    wb = wb_ref[...][None, :, :]  # (1, nG, 1)
    ne = fup.shape[-1]
    k = fup.shape[-2] // nG
    red = lambda x: jnp.sum(x.reshape(k, nG, ne) * wb, axis=1)
    fup_ref[...] = red(fup)
    fdn_ref[...] = red(fdn)


def two_stream_ir_weighted_pallas(tau, w0, gt, emissivity, has_hard_surface,
                                  tau_min, bplanck, wbin, block_b=128):
    """Weight-fused IR kernel: tau/w0/gt (nw*nG, nz) bin-major, bplanck
    (nw*nG, nz+1), wbin (nG,). Returns (fup_w, fdn_w) of shape (nw, nz+1)
    — the gauss-weighted sums (an nG-fold write-traffic cut)."""
    B, nz = tau.shape
    nG = int(np.shape(wbin)[0]) if hasattr(wbin, "shape") else len(wbin)
    dt = tau.dtype
    bb = min(block_b, max(B, nG))
    bb -= bb % nG
    bb = max(bb, nG)
    k = bb // nG
    tau, w0, gt, emissivity, bplanck = _pad_rows(
        [tau, w0, gt, jnp.asarray(emissivity), bplanck], B, bb,
        [1e-3, 0.5, 0.1, 1.0, 1.0],
    )
    Bp = tau.shape[0]
    nw_pad = Bp // nG
    nw = B // nG
    grid = (Bp // bb,)
    spec2, spec1, spec_e = _block(bb, nz)
    gspec = pl.BlockSpec((nG, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((k, nz + 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _ir_weighted_kernel, has_hard_surface=has_hard_surface,
        tau_min=tau_min, nG=nG,
    )
    fup_w, fdn_w = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec2, spec2, spec2, spec1, spec_e, gspec],
        out_specs=(ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct((nw_pad, nz + 1), dt),
            jax.ShapeDtypeStruct((nw_pad, nz + 1), dt),
        ),
    )(tau, w0, gt, emissivity[:, None], bplanck, jnp.asarray(wbin, dt)[:, None])
    return fup_w[:nw], fdn_w[:nw]


def two_stream_ir_pallas(tau, w0, gt, emissivity, has_hard_surface, tau_min,
                         bplanck, block_b=128):
    """IR two-stream on a flattened batch: tau/w0/gt (B, nz); emissivity (B,);
    bplanck (B, nz+1). Returns (fup, fdn)."""
    B, nz = tau.shape
    bb = min(block_b, B)
    grid = (pl.cdiv(B, bb),)
    spec2, spec1, spec_e = _block(bb, nz)
    dt = tau.dtype

    kernel = functools.partial(
        _ir_kernel, has_hard_surface=has_hard_surface, tau_min=tau_min
    )
    fup, fdn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec2, spec2, spec2, spec1, spec_e],
        out_specs=(spec_e, spec_e),
        out_shape=(
            jax.ShapeDtypeStruct((B, nz + 1), dt),
            jax.ShapeDtypeStruct((B, nz + 1), dt),
        ),
    )(tau, w0, gt, emissivity[:, None], bplanck)
    return fup, fdn
