"""Random-Overlap-Resort-Rebin (RORR) k-distribution mixing, vectorized.

Reference: ``k_rorr`` at ``src/radtran/clima_radtran_types.f90:780-888``. Per
(layer, bin) the reference forms the nbin^2 pairwise sums of the running mixed
k-optical-depth with the next species, sorts them (mrgrnk), accumulates the
sorted pair weights into bin edges, and conservatively rebins back onto the
nbin master weight grid.

TPU-native formulation: the sort is one ``jnp.sort``/``argsort`` over the last
axis of a (nw, nz, nbin^2) tensor and the conservative rebin is expressed
through the cumulative integral (see ops.rebin.rebin_jnp), which lowers to a
batched searchsorted + gather. No loops over layers or bins.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rebin import rebin_jnp

__all__ = ["k_rorr_mix", "make_wxy"]


def make_wxy(wbin):
    """Pair weights wxy[i*nbin+j] = wbin[i]*wbin[j] (types_create.f90:215-219)."""
    wbin = jnp.asarray(wbin)
    return (wbin[:, None] * wbin[None, :]).reshape(-1)


def _mix_pair(tau_mixed, tau_next, wxy, wbin_e):
    """One RORR combine step: mix (..., nbin) with (..., nbin) -> (..., nbin)."""
    nbin = tau_mixed.shape[-1]
    # pairwise sums, i (existing mix) slow axis, j (new species) fast axis
    tau_xy = (tau_mixed[..., :, None] + tau_next[..., None, :]).reshape(
        tau_mixed.shape[:-1] + (nbin * nbin,)
    )
    order = jnp.argsort(tau_xy, axis=-1)
    tau_sorted = jnp.take_along_axis(tau_xy, order, axis=-1)
    w_sorted = jnp.take_along_axis(
        jnp.broadcast_to(wxy, tau_xy.shape), order, axis=-1
    )
    # weights -> bin edges (weights_to_bins, clima_eqns.f90:43-54)
    zeros = jnp.zeros_like(w_sorted[..., :1])
    wxy_e = jnp.concatenate([zeros, jnp.cumsum(w_sorted, axis=-1)], axis=-1)
    return rebin_jnp(wxy_e, tau_sorted, wbin_e)


def k_rorr_mix(tau_ks, wbin_e):
    """Mix per-species k-term optical depths into one k-distribution.

    ``tau_ks``: (nk, ..., nbin) optical depth of each k-species at each gauss
    point (already multiplied by the species column). ``wbin_e``: (nbin+1)
    master weight edges. Returns the mixed (..., nbin).
    """
    nk = tau_ks.shape[0]
    wbin = jnp.diff(wbin_e)
    wxy = make_wxy(wbin)
    mixed = tau_ks[0]
    for i in range(1, nk):  # nk is small and static: unrolled
        mixed = _mix_pair(mixed, tau_ks[i], wxy, wbin_e)
    return mixed
