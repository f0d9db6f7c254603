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


def tridiag_pcr(a, b, c, d):
    """Parallel cyclic reduction along the LAST axis (batch dims leading).

    TPU-native alternative to the sequential Thomas scan: ceil(log2 n) fully
    vectorized elimination sweeps instead of 2n dependent steps. Each sweep is
    whole-tensor elementwise math + shifts, which XLA fuses into a handful of
    large VPU kernels — the sequential-latency bottleneck of ``tridiag``
    disappears while total work only grows by the log factor. Numerically
    stable for the diffusion-type (diagonally dominant) systems the two-stream
    solver produces; validated against the Thomas oracle in tests.
    """
    import math

    n = a.shape[-1]
    steps = max(1, math.ceil(math.log2(n)))
    # first sub/super entries are "unused" in the Thomas convention; PCR needs
    # them to be exactly zero
    a = jnp.asarray(a).at[..., 0].set(0.0)
    c = jnp.asarray(c).at[..., -1].set(0.0)
    b = jnp.asarray(b)
    d = jnp.asarray(d)

    def shift(x, k, fill=0.0):
        """x[..., i+k] with out-of-range entries set to fill."""
        if k == 0:
            return x
        pad = jnp.full(x.shape[:-1] + (abs(k),), fill, x.dtype)
        if k > 0:
            return jnp.concatenate([x[..., k:], pad], axis=-1)
        return jnp.concatenate([pad, x[..., :k]], axis=-1)

    for s in range(steps):
        k = 1 << s
        # neighbors from the PRE-update system
        a_m, a_p = shift(a, -k, 0.0), shift(a, +k, 0.0)
        c_m, c_p = shift(c, -k, 0.0), shift(c, +k, 0.0)
        b_m, b_p = shift(b, -k, 1.0), shift(b, +k, 1.0)
        d_m, d_p = shift(d, -k, 0.0), shift(d, +k, 0.0)
        alpha = a / b_m
        gamma = c / b_p
        a_new = -alpha * a_m
        c_new = -gamma * c_p
        b_new = b - alpha * c_m - gamma * a_p
        d_new = d - alpha * d_m - gamma * d_p
        a, b, c, d = a_new, b_new, c_new, d_new

    return d / b


def tridiag_block2_pcr(a, b, c, d):
    """Block parallel cyclic reduction for even-size tridiagonal systems.

    The two-stream system (size 2*nz) has a natural 2x2-block tridiagonal
    structure over layers. Scalar PCR is unstable on it: the even-row
    diagonal e2*e2' - e4*e4' vanishes for optically thin layers, so scalar
    pivots hit ~0. The 2x2 BLOCKS stay well conditioned (their determinants
    are products of the e-coefficients), so block PCR — ceil(log2(nz))
    vectorized sweeps of batched 2x2 algebra — is both TPU-parallel and
    robust. Validated against the Thomas oracle on thin-layer systems.

    Same calling convention as :func:`tridiag_batched_last` (solve along the
    LAST axis, batch dims leading); n must be even.
    """
    import math

    a = jnp.asarray(a)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    d = jnp.asarray(d)
    # broadcast to a common batch (callers may have partially-broadcast bands)
    shape = jnp.broadcast_shapes(a.shape, b.shape, c.shape, d.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    c = jnp.broadcast_to(c, shape)
    d = jnp.broadcast_to(d, shape)
    n = a.shape[-1]
    assert n % 2 == 0, "tridiag_block2_pcr requires even system size"
    m = n // 2
    batch = a.shape[:-1]
    dt = b.dtype

    a = a.at[..., 0].set(0.0)
    c = c.at[..., -1].set(0.0)

    # Block row k (rows 2k, 2k+1; unknowns u_k = (x_{2k}, x_{2k+1})):
    #   L_k u_{k-1} + M_k u_k + U_k u_{k+1} = f_k
    # L_k = [[0, a_{2k}], [0, 0]],  U_k = [[0, 0], [c_{2k+1}, 0]]
    # M_k = [[b_{2k}, c_{2k}], [a_{2k+1}, b_{2k+1}]]
    zeros = jnp.zeros(batch + (m,), dt)
    L = jnp.stack(
        [jnp.stack([zeros, a[..., 0::2]], -1), jnp.stack([zeros, zeros], -1)], -2
    )  # (..., m, 2, 2)
    U = jnp.stack(
        [jnp.stack([zeros, zeros], -1), jnp.stack([c[..., 1::2], zeros], -1)], -2
    )
    M = jnp.stack(
        [
            jnp.stack([b[..., 0::2], c[..., 0::2]], -1),
            jnp.stack([a[..., 1::2], b[..., 1::2]], -1),
        ],
        -2,
    )
    f = jnp.stack([d[..., 0::2], d[..., 1::2]], -1)  # (..., m, 2)

    eye = jnp.broadcast_to(jnp.eye(2, dtype=dt), batch + (m, 2, 2))

    def shift_blocks(x, k, fill):
        pad = jnp.broadcast_to(fill, x.shape[:-3] + (abs(k),) + x.shape[-2:])
        if k > 0:
            return jnp.concatenate([x[..., k:, :, :], pad], axis=-3)
        return jnp.concatenate([pad, x[..., :k, :, :]], axis=-3)

    def shift_vec(x, k):
        pad = jnp.zeros(x.shape[:-2] + (abs(k), x.shape[-1]), dt)
        if k > 0:
            return jnp.concatenate([x[..., k:, :], pad], axis=-2)
        return jnp.concatenate([pad, x[..., :k, :], ], axis=-2)

    def inv2(Mx):
        det = Mx[..., 0, 0] * Mx[..., 1, 1] - Mx[..., 0, 1] * Mx[..., 1, 0]
        inv_det = 1.0 / det
        out = jnp.stack(
            [
                jnp.stack([Mx[..., 1, 1], -Mx[..., 0, 1]], -1),
                jnp.stack([-Mx[..., 1, 0], Mx[..., 0, 0]], -1),
            ],
            -2,
        )
        return out * inv_det[..., None, None]

    mm = lambda A, B: jnp.einsum("...ij,...jk->...ik", A, B)
    mv = lambda A, v: jnp.einsum("...ij,...j->...i", A, v)

    steps = max(1, math.ceil(math.log2(m)))
    Z2 = jnp.zeros((1, 2, 2), dt)
    I2 = jnp.eye(2, dtype=dt)[None]
    for s in range(steps):
        k = 1 << s
        L_m = shift_blocks(L, -k, Z2)
        U_m = shift_blocks(U, -k, Z2)
        M_m = shift_blocks(M, -k, I2)
        f_m = shift_vec(f, -k)
        L_p = shift_blocks(L, +k, Z2)
        U_p = shift_blocks(U, +k, Z2)
        M_p = shift_blocks(M, +k, I2)
        f_p = shift_vec(f, +k)

        alpha = mm(L, inv2(M_m))
        gamma = mm(U, inv2(M_p))
        L_new = -mm(alpha, L_m)
        U_new = -mm(gamma, U_p)
        M_new = M - mm(alpha, U_m) - mm(gamma, L_p)
        f_new = f - mv(alpha, f_m) - mv(gamma, f_p)
        L, M, U, f = L_new, M_new, U_new, f_new

    u = mv(inv2(M), f)  # (..., m, 2)
    return u.reshape(batch + (n,))
