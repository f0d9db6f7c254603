"""Batched tridiagonal (Thomas) solves.

The reference solves one 2*nz tridiagonal system per (wavelength bin, gauss
point, zenith angle) serially (``src/radtran/clima_radtran_twostream.f90:
297-316``). Here the recurrence runs once over n via ``lax.scan`` while the
whole (bins x gauss x zenith x columns) batch rides the vector lanes — the
TPU-native layout (sequential axis leading, huge batch trailing).

A fused Pallas kernel version of the full two-stream solve lives in
``clima_tpu.ops.pallas_kernels``; this module is the portable reference path
and the numerical oracle for it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["tridiag", "tridiag_batched_last"]


def tridiag(a, b, c, d):
    """Solve tridiagonal systems along axis 0 with batch dims trailing.

    ``a``: sub-diagonal (n, ...), a[0] unused.
    ``b``: diagonal (n, ...).
    ``c``: super-diagonal (n, ...), c[n-1] unused.
    ``d``: right-hand side (n, ...).

    Matches the in-place elimination of the reference ``tridiag``
    (clima_radtran_twostream.f90:297-316) including its (benign) use of the
    c-recurrence at the final row.
    """
    n = a.shape[0]

    # forward elimination: carry (c', d')
    def fwd(carry, x):
        cp_prev, dp_prev = carry
        ai, bi, ci, di = x
        denom = bi - ai * cp_prev
        cp = ci / denom
        dp = (di - ai * dp_prev) / denom
        return (cp, dp), (cp, dp)

    c0 = c[0] / b[0]
    d0 = d[0] / b[0]
    (_, _), (cps, dps) = jax.lax.scan(
        fwd, (c0, d0), (a[1:], b[1:], c[1:], d[1:])
    )
    cp = jnp.concatenate([c0[None], cps], axis=0)
    dp = jnp.concatenate([d0[None], dps], axis=0)

    # back substitution
    def bwd(carry, x):
        cpi, dpi = x
        xi = dpi - cpi * carry
        return xi, xi

    xn = dp[n - 1]
    _, xs = jax.lax.scan(bwd, xn, (cp[: n - 1], dp[: n - 1]), reverse=True)
    return jnp.concatenate([xs, xn[None]], axis=0)


def tridiag_batched_last(a, b, c, d):
    """Solve tridiagonal systems along the LAST axis (batch dims leading)."""
    mv = lambda x: jnp.moveaxis(x, -1, 0)
    sol = tridiag(mv(a), mv(b), mv(c), mv(d))
    return jnp.moveaxis(sol, 0, -1)
