"""Fused Pallas kernel for one RORR k-mixing step.

The XLA RORR path spends most of the opacity budget in ``lax.sort`` over the
64 pairwise optical depths (measured ~167 ms of a ~260 ms radiate call at
the flagship batch). This kernel runs the whole mix step on a VMEM-resident
row tile: pairwise-sum formation, a 64-lane bitonic sort network
(compare-exchange via lane rolls — ties are harmless because equal keys make
their weights interchangeable in the conservative rebin), a doubling-shift
cumulative sum, and the clipped-reduction rebin onto the static master
weight edges.

Numerical equality with ops.rorr._mix_pair is asserted in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rorr_mix_pair_pallas", "mix_pair_bitonic_ref"]

NBIN = 8
NPAIR = NBIN * NBIN


def _bitonic_sort_with_payload(keys, payload):
    """Bitonic sort of (R, 64) keys carrying payload, via lane rolls."""
    n = keys.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, keys.shape, dimension=keys.ndim - 1)
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            up_k = jnp.roll(keys, -j, axis=-1)
            dn_k = jnp.roll(keys, j, axis=-1)
            up_p = jnp.roll(payload, -j, axis=-1)
            dn_p = jnp.roll(payload, j, axis=-1)
            use_up = (lane & j) == 0
            pk = jnp.where(use_up, up_k, dn_k)
            pp = jnp.where(use_up, up_p, dn_p)
            ascending = (lane & k) == 0
            keep_small = use_up == ascending
            # lexicographic (key, lane) ordering: without the tie-break, equal
            # keys make BOTH partners keep the same payload (one weight
            # duplicated, one lost) — float32 sums tie often enough to skew
            # even the band mean by percent.
            self_first = (keys < pk) | ((keys == pk) & use_up)
            take_self = jnp.where(keep_small, self_first, ~self_first)
            keys = jnp.where(take_self, keys, pk)
            payload = jnp.where(take_self, payload, pp)
            j //= 2
        k *= 2
    return keys, payload


def _cumsum_lanes(x):
    n = x.shape[-1]
    k = 1
    while k < n:
        shifted = jnp.roll(x, k, axis=-1)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=x.ndim - 1)
        x = x + jnp.where(lane >= k, shifted, 0.0)
        k *= 2
    return x


def mix_pair_bitonic_ref(tau_mixed, tau_next, wxy_row, wbin_e):
    """Pure-jnp version of the kernel body (shared by the Pallas kernel and
    used as its oracle). Inputs (R, 8); ``wxy_row`` (1, 64) traced array;
    ``wbin_e`` a tuple of python floats (array constants cannot be captured
    inside Pallas kernels)."""
    R = tau_mixed.shape[0]
    a = jnp.broadcast_to(tau_mixed[:, :, None], (R, NBIN, NBIN)).reshape(R, NPAIR)
    b = jnp.broadcast_to(tau_next[:, None, :], (R, NBIN, NBIN)).reshape(R, NPAIR)
    tau_xy = a + b
    w = jnp.broadcast_to(wxy_row, tau_xy.shape)
    tau_s, w_s = _bitonic_sort_with_payload(tau_xy, w)
    cs = _cumsum_lanes(w_s)
    lower = cs - w_s
    upper = cs
    # direct overlap sums per target bin (NOT cumulative-F differences, which
    # cancel catastrophically in float32)
    cols = []
    for jj in range(NBIN):
        e_lo = float(wbin_e[jj])
        e_hi = float(wbin_e[jj + 1])
        overlap = jnp.clip(
            jnp.minimum(upper, e_hi) - jnp.maximum(lower, e_lo), 0.0, None
        )
        cols.append(jnp.sum(tau_s * overlap, axis=-1) * (1.0 / (e_hi - e_lo)))
    return jnp.stack(cols, axis=-1)  # (R, 8)


def k_rorr_mix_pallas(tau_ks, wbin, wbin_e):
    """RORR mixing over all k-species via the fused kernel.

    ``tau_ks``: (nk, ..., 8) traced; ``wbin``/``wbin_e`` concrete numpy.
    Drop-in equivalent of ops.rorr.k_rorr_mix on TPU.
    """
    import numpy as np

    nk = tau_ks.shape[0]
    out_shape = tau_ks.shape[1:]
    wxy = np.outer(np.asarray(wbin), np.asarray(wbin)).reshape(-1)
    mixed = tau_ks[0].reshape(-1, NBIN)
    for i in range(1, nk):
        mixed = rorr_mix_pair_pallas(
            mixed, tau_ks[i].reshape(-1, NBIN), wxy, wbin_e
        )
    return mixed.reshape(out_shape)


def rorr_mix_pair_pallas(tau_mixed, tau_next, wxy, wbin_e, block_r=512):
    """One RORR combine step on a flat row batch: (R, 8) x (R, 8) -> (R, 8).

    ``wxy``/``wbin_e`` must be concrete (host numpy) — they are baked into
    the kernel as constants.
    """
    import numpy as np

    R = tau_mixed.shape[0]
    rb = min(block_r, R)
    grid = (pl.cdiv(R, rb),)
    dt = tau_mixed.dtype
    wbin_e_c = tuple(float(x) for x in np.asarray(wbin_e))
    wxy_arr = jnp.asarray(np.asarray(wxy), dtype=tau_mixed.dtype)[None, :]

    def kernel(a_ref, b_ref, wxy_ref, out_ref):
        out_ref[...] = mix_pair_bitonic_ref(
            a_ref[...], b_ref[...], wxy_ref[...], wbin_e_c
        )

    spec = pl.BlockSpec((rb, NBIN), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((1, NPAIR), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, wspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((R, NBIN), dt),
    )(tau_mixed, tau_next, wxy_arr)
