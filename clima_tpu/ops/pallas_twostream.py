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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import twostream as ts

__all__ = [
    "two_stream_solar_pallas",
    "two_stream_solar_multi_pallas",
    "two_stream_ir_pallas",
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
