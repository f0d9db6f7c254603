"""Fused Pallas kernel for RORR k-mixing — rank-based, sort-free.

The XLA RORR path spends most of the opacity budget in the variadic
``lax.sort`` over the nbin^2 pairwise optical depths (measured ~170 ms of a
~215 ms full radiate at the flagship batch on v5e). This kernel removes the
sort entirely: the conservative rebin (k_rorr, clima_radtran_types.f90:
780-888) only needs each pair's *lower cumulative-weight edge* in the sorted
order, which is its weighted rank

    lower[p] = sum_k wxy[k] * [key_k < key_p  or  (key_k == key_p and k < p)]

(the index tie-break reproduces the reference's stable mrgrnk ordering; with
ties, any consistent assignment of distinct rank windows yields the same
rebinned spectrum, but each pair must get a *distinct* window — see the
all-equal-keys test). The rebin is then direct overlap sums in the original
pair order — no sorted array is ever formed.

Layout: the pair axis (nbin^2) runs along *sublanes* and the flattened batch
along lanes, so every vector op is full-width; all (nbin^2, L) intermediates
live in VMEM; and the whole multi-species mix chain runs in one kernel with
the running mix staying on-chip. Kernel-variant history (all measured on
v5e): bitonic network on (R, 64) lanes — 310 ms, bitonic on transposed
sublanes — 136 ms / 330 s compile, rank-based transposed — 119 ms / 12 s
compile, vs 170-210 ms for the XLA sort path.

Inside the kernel: no jnp.where on booleans (Mosaic can't truncate i8->i1;
use ==/XNOR), no negative pltpu.roll shifts, no reshapes that merge the
lane axis, array constants passed as inputs (wxy) or Python floats
(wbin edges).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["k_rorr_mix_pallas", "k_rorr_mix_pallas_t",
           "rorr_mix_pair_pallas", "mix_pair_rank_ref"]


def _mix_one_rank(a, b, wxy_col, wbin_e_c, nbin):
    """One RORR pair-mix on the transposed layout: (nbin, L) x (nbin, L).

    ``wxy_col``: (nbin^2, 1) pair weights with wxy[p] = wbin[p % nbin] *
    wbin[p // nbin] (matching the tile/select pair construction below).
    ``wbin_e_c``: tuple of nbin+1 Python floats (master weight edges).
    Pure jnp — runs identically inside the kernel and as an XLA/interpret
    oracle.
    """
    npair = nbin * nbin
    L = a.shape[1]
    sub_col = jax.lax.broadcasted_iota(jnp.int32, (npair, 1), 0)
    hi = sub_col // nbin
    # keys[p] = a[p % nbin] + b[p // nbin]; with the wxy ordering above each
    # of the nbin^2 (a_i, b_j) pairs appears once with weight wbin_i*wbin_j
    A = pltpu.repeat(a, nbin, 0)
    B = jnp.zeros((npair, L), dtype=a.dtype)
    for i in range(nbin):
        B = jnp.where(hi == i, b[i : i + 1, :], B)
    keys = A + B
    w = jnp.broadcast_to(wxy_col, (npair, L))

    # Rank via ONE integer compare per (k, p) instead of the 3-compare float
    # tie-break: optical-depth keys are non-negative finite floats, for which
    # the bit pattern (as a signed int) is order-isomorphic to the float
    # value, and the stable-sort tie-break
    #     [key_k < key_p] | ([key_k == key_p] & [k < p])
    # is exactly [ikey_k < ikey_p + (p > k)] in integer arithmetic (the +1
    # turns '<' into '<=' for the rows that win ties by index). The per-k
    # select target is cheap: (sub_col > k) is a compile-time-constant mask
    # (static iota vs static k). Measured on v5e at the flagship batch:
    # 32.9 -> 30.5 ms for the 3-species chain.
    #
    # DO NOT fold the tie-break into the keys as ikey_b = ikey + row_index
    # with an unbiased compare (the r5 "26 ms" variant): the bias is not
    # injective — two keys whose bit patterns differ by less than npair can
    # COLLIDE after biasing (ikey_i + i == ikey_j + j), giving both pairs
    # the same rank window. Overlapping windows double-count one stretch of
    # cumulative weight and leave another uncovered, an O(pair-weight)
    # error in the rebinned spectrum, NOT an ulp-scale one: measured
    # rorr_maxrel 0.118 on the TPU parity sweep (~29 expected collisions at
    # those shapes) vs 5e-6 for this exact variant (TPU_VALIDATION_r04).
    # tests/test_pallas_rorr.py::test_rank_mix_near_tie_collision pins the
    # adversarial case.
    # A sublane-rotation variant (compare against circularly rolled rows to
    # avoid the per-k row broadcast) measured WORSE (34.1 ms): Mosaic
    # sublane rolls/concats cost more than the row broadcast they replace.
    idt = jnp.int32 if keys.dtype == jnp.float32 else jnp.int64
    ikeys = jax.lax.bitcast_convert_type(keys, idt)
    ikeys_p1 = ikeys + 1
    zero = jnp.zeros((), a.dtype)
    lower = jnp.zeros((npair, L), dtype=a.dtype)
    for k in range(npair):
        ikk = ikeys[k : k + 1, :]
        wk = wxy_col[k, 0]
        tgt = jnp.where(sub_col > k, ikeys_p1, ikeys)
        lower = lower + jnp.where(ikk < tgt, wk, zero)
    upper = lower + w

    cols = []
    for jj in range(nbin):
        e_lo = wbin_e_c[jj]
        e_hi = wbin_e_c[jj + 1]
        ov = jnp.clip(jnp.minimum(upper, e_hi) - jnp.maximum(lower, e_lo), 0.0, None)
        cols.append(jnp.sum(keys * ov, axis=0, keepdims=True) * (1.0 / (e_hi - e_lo)))
    return jnp.concatenate(cols, axis=0)  # (nbin, L)


def mix_pair_rank_ref(a_rows, b_rows, wxy, wbin_e):
    """Row-layout oracle: (R, nbin) x (R, nbin) -> (R, nbin), pure jnp.

    ``wxy``/``wbin_e`` concrete 1-D arrays. Mirrors the kernel body exactly
    (same tie-break), for interpret-mode / CPU equality tests.
    """
    nbin = a_rows.shape[-1]
    wbin_e_c = tuple(float(x) for x in np.asarray(wbin_e))
    wxy_col = jnp.asarray(np.asarray(wxy), dtype=a_rows.dtype)[:, None]
    out_T = _mix_one_rank(a_rows.T, b_rows.T, wxy_col, wbin_e_c, nbin)
    return out_T.T


def _kernel_factory(nbin, wbin_e_c, n_steps):
    def kernel(*refs):
        out_ref = refs[-1]
        wxy_col = refs[-2][...]
        mixed = refs[0][...]
        for b_ref in refs[1 : n_steps + 1]:
            mixed = _mix_one_rank(mixed, b_ref[...], wxy_col, wbin_e_c, nbin)
        out_ref[...] = mixed

    return kernel


def _pair_weights(wbin):
    """wxy[p] = wbin[p % nbin] * wbin[p // nbin] (types_create.f90:215-219 up
    to ordering; the rebin is permutation-invariant given correct pairing)."""
    wbin = np.asarray(wbin)
    return np.outer(wbin, wbin).reshape(-1)  # symmetric: order-free


def k_rorr_mix_pallas_t(tau_ks_t, wbin, wbin_e, block_l=1024,
                        interpret=False):
    """RORR mix on the kernel's NATIVE layout: ``tau_ks_t`` (nk, nbin, R)
    with the flattened batch R on lanes. Returns (nbin, R).

    Callers that assemble opacities with the gauss axis already on sublanes
    (radtran.opacity emits k-coefficients as (G, W, nz) straight from the
    interpolation matmul) avoid the two whole-tensor minor-axis relayouts
    ``k_rorr_mix_pallas`` pays to transpose (..., nbin) in and out.
    """
    nk, nbin, R = tau_ks_t.shape
    dt = tau_ks_t.dtype
    wbin_e_c = tuple(float(x) for x in np.asarray(wbin_e))
    wxy_col = jnp.asarray(_pair_weights(wbin), dtype=dt)[:, None]
    npair = nbin * nbin
    lb = min(block_l, R)

    spec = pl.BlockSpec((nbin, lb), lambda i: (0, i), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((npair, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    kwargs = {"interpret": True} if interpret else {}
    return pl.pallas_call(
        _kernel_factory(nbin, wbin_e_c, nk - 1),
        grid=(pl.cdiv(R, lb),),
        in_specs=[spec] * nk + [wspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nbin, R), dt),
        **kwargs,
    )(*[tau_ks_t[i] for i in range(nk)], wxy_col)


def k_rorr_mix_pallas(tau_ks, wbin, wbin_e, block_l=1024, interpret=False):
    """RORR-mix per-species k-term optical depths in one fused kernel.

    ``tau_ks``: (nk, ..., nbin) traced; ``wbin``/``wbin_e`` concrete numpy.
    Drop-in equivalent of ops.rorr.k_rorr_mix. The intermediate mixed
    distribution between species never leaves VMEM.
    """
    nk = tau_ks.shape[0]
    nbin = tau_ks.shape[-1]
    out_shape = tau_ks.shape[1:]

    tau_T = tau_ks.reshape(nk, -1, nbin)
    tau_T = jnp.swapaxes(tau_T, 1, 2)  # (nk, nbin, R)
    out_T = k_rorr_mix_pallas_t(tau_T, wbin, wbin_e, block_l=block_l,
                                interpret=interpret)
    return jnp.swapaxes(out_T, 0, 1).reshape(out_shape)


def rorr_mix_pair_pallas(tau_mixed, tau_next, wxy, wbin_e, block_r=1024,
                         interpret=False):
    """One RORR combine step on a flat row batch: (R, nbin) x (R, nbin).

    ``wxy``/``wbin_e`` must be concrete (host numpy). Kept for tests and
    incremental use; k_rorr_mix_pallas fuses the whole species chain.
    """
    stacked = jnp.stack([tau_mixed, tau_next], axis=0)  # (2, R, nbin)
    nbin = tau_mixed.shape[-1]
    # recover wbin from wxy row sums (wxy = outer(wbin, wbin))
    wxy_m = np.asarray(wxy).reshape(nbin, nbin)
    wbin = wxy_m.sum(axis=1) / wxy_m.sum() ** 0.5
    return k_rorr_mix_pallas(stacked, wbin, wbin_e, block_l=block_r,
                             interpret=interpret)
