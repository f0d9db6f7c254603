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

__all__ = ["k_rorr_mix", "k_aee_mix", "make_wxy"]


def make_wxy(wbin):
    """Pair weights wxy[i*nbin+j] = wbin[i]*wbin[j] (types_create.f90:215-219)."""
    wbin = jnp.asarray(wbin)
    return (wbin[:, None] * wbin[None, :]).reshape(-1)


def _mix_pair(tau_mixed, tau_next, wxy, wbin_e):
    """One RORR combine step: mix (..., nbin) with (..., nbin) -> (..., nbin).

    TPU-native formulation: a variadic ``lax.sort`` carries the pair weights
    along with the keys (no argsort + gather), and the conservative rebin
    onto the fixed master weight edges is evaluated as
    ``F(e) = sum_k tau_k * clip(e - lower_k, 0, w_k)`` at each static edge —
    pure clipped reductions, no searchsorted/gather anywhere.
    """
    nbin = tau_mixed.shape[-1]
    # pairwise sums, i (existing mix) slow axis, j (new species) fast axis
    tau_xy = (tau_mixed[..., :, None] + tau_next[..., None, :]).reshape(
        tau_mixed.shape[:-1] + (nbin * nbin,)
    )
    w_b = jnp.broadcast_to(wxy, tau_xy.shape)
    tau_sorted, w_sorted = jax.lax.sort((tau_xy, w_b), dimension=-1, num_keys=1)

    # cumulative lower edge of each sorted source bin
    cs = jnp.cumsum(w_sorted, axis=-1)
    lower = cs - w_sorted

    # cumulative integral F(e) of the piecewise-constant tau over weight
    # space, evaluated at the nbin+1 master edges
    Fs = [
        jnp.sum(tau_sorted * jnp.clip(wbin_e[j] - lower, 0.0, w_sorted), axis=-1)
        for j in range(wbin_e.shape[0])
    ]
    F = jnp.stack(Fs, axis=-1)  # (..., nbin+1)
    return jnp.diff(F, axis=-1) / jnp.diff(wbin_e)


def k_aee_mix(tau_ks, wbin):
    """Adaptive-equivalent-extinction mixing of k-species optical depths.

    The reference declares this k-method but leaves it unimplemented
    (``clima_radtran_types.f90:80-82``, errors at ``:761-763``); this is a
    working implementation following the equivalent-extinction approach
    (Amundsen et al. 2017): per (bin, layer), the species with the largest
    band-mean (grey) optical depth keeps its full k-distribution and all
    other species contribute their grey optical depth. Entirely
    sort/gather-free — a fast alternative to RORR.

    ``tau_ks``: (nk, ..., nbin); ``wbin``: (nbin,). Returns (..., nbin).
    The weighted band mean is preserved exactly (as it is under RORR).
    """
    wbin = jnp.asarray(wbin)
    tau_grey = jnp.sum(tau_ks * wbin, axis=-1)  # (nk, ...)
    total_grey = jnp.sum(tau_grey, axis=0)  # (...)
    nk = tau_ks.shape[0]
    idx_major = jnp.argmax(tau_grey, axis=0)  # (...)
    one_hot = (
        jnp.arange(nk).reshape((nk,) + (1,) * idx_major.ndim) == idx_major[None]
    )
    tau_major = jnp.sum(jnp.where(one_hot[..., None], tau_ks, 0.0), axis=0)
    grey_major = jnp.sum(jnp.where(one_hot, tau_grey, 0.0), axis=0)
    return tau_major + (total_grey - grey_major)[..., None]


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
