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

__all__ = [
    "tridiag",
    "tridiag_batched_last",
    "tridiag_pcr",
    "tridiag_block2_pcr",
    "block2_pcr_components",
    "block2_pcr_components_multi",
    "block2_pcr_components_dense",
]


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

    u0, u1 = block2_pcr_components(
        a[..., 0::2], b[..., 0::2], c[..., 0::2],
        a[..., 1::2], b[..., 1::2], c[..., 1::2],
        d[..., 0::2], d[..., 1::2],
    )
    return jnp.stack([u0, u1], axis=-1).reshape(batch + (n,))


def block2_pcr_components(L01, M00, M01, M10, M11, U10, f0, f1):
    """2x2-block PCR on pre-split block components (the fast path).

    Block row k (rows 2k, 2k+1; unknowns u_k = (x_{2k}, x_{2k+1})):
      L_k u_{k-1} + M_k u_k + U_k u_{k+1} = f_k
    with L_k = [[0, L01_k], [0, 0]], U_k = [[0, 0], [U10_k, 0]],
    M_k = [[M00, M01], [M10, M11]]_k. All inputs (..., m).

    The two-stream assembly produces exactly these arrays (even/odd row
    coefficient sets), so callers avoid the interleave + strided re-slicing
    of the scalar tridiagonal form entirely. Components are SEPARATE arrays:
    a trailing (2, 2) axis would be padded to full (8, 128) TPU tiles (64x
    memory blow-up, observed as a compile-time HBM OOM).

    This is the structure-exploiting implementation: one PCR sweep preserves
    the sparsity of L and U exactly —

      alpha = L @ inv(M_m) = [[a0, a1], [0, 0]]          (L has one row)
      gamma = U @ inv(M_p) = [[0, 0], [g0, g1]]          (U has one row)
      L'    = -alpha @ L_m = [[0, -a0*L01_m], [0, 0]]    (still one scalar)
      U'    = -gamma @ U_p = [[0, 0], [-g1*U10_p, 0]]    (still one scalar)
      M'    = M - alpha @ U_m - gamma @ L_p              (only M00 and M11
                                                          change; M01/M10 are
                                                          loop INVARIANTS)

    so each sweep is ~26 elementwise ops on 8 carried arrays instead of the
    ~104 ops / 14 arrays of the dense 2x2 formulation — the dominant cost of
    the fused Pallas two-stream kernels. ``inv(M)`` is computed once per
    sweep and shifted (inv commutes with the lane shift; identity fill).
    The dense-algebra original is kept as :func:`block2_pcr_components_dense`
    (the oracle for this path; equality asserted in tests).
    """
    import math

    m = L01.shape[-1]
    dt = M00.dtype
    batch = jnp.broadcast_shapes(
        *(x.shape[:-1] for x in (L01, M00, M01, M10, M11, U10, f0, f1))
    )
    bcast = lambda x: jnp.broadcast_to(jnp.asarray(x, dt), batch + (m,))
    L01, M00, M01, M10, M11, U10, f0, f1 = map(
        bcast, (L01, M00, M01, M10, M11, U10, f0, f1)
    )

    def shift(x, k, fill):
        pad = jnp.full(x.shape[:-1] + (abs(k),), fill, dt)
        if k > 0:
            return jnp.concatenate([x[..., k:], pad], axis=-1)
        return jnp.concatenate([pad, x[..., :k]], axis=-1)

    steps = max(1, math.ceil(math.log2(m)))
    for s in range(steps):
        k = 1 << s
        inv_det = 1.0 / (M00 * M11 - M01 * M10)
        i00 = M11 * inv_det
        i01 = -M01 * inv_det
        i10 = -M10 * inv_det
        i11 = M00 * inv_det

        # alpha couples to block k-1 (needs inv(M_{k-1}) row 2), gamma to
        # block k+1 (needs inv(M_{k+1}) row 1); identity fill off the ends
        a0 = L01 * shift(i10, -k, 0.0)
        a1 = L01 * shift(i11, -k, 1.0)
        g0 = U10 * shift(i00, +k, 1.0)
        g1 = U10 * shift(i01, +k, 0.0)

        L01_new = -a0 * shift(L01, -k, 0.0)
        U10_new = -g1 * shift(U10, +k, 0.0)
        M00 = M00 - a1 * shift(U10, -k, 0.0)
        M11 = M11 - g0 * shift(L01, +k, 0.0)
        f0_new = f0 - a0 * shift(f0, -k, 0.0) - a1 * shift(f1, -k, 0.0)
        f1_new = f1 - g0 * shift(f0, +k, 0.0) - g1 * shift(f1, +k, 0.0)
        L01, U10, f0, f1 = L01_new, U10_new, f0_new, f1_new

    inv_det = 1.0 / (M00 * M11 - M01 * M10)
    u0 = (M11 * f0 - M01 * f1) * inv_det
    u1 = (M00 * f1 - M10 * f0) * inv_det
    return u0, u1


def block2_pcr_components_multi(L01, M00, M01, M10, M11, U10, f0s, f1s):
    """2x2-block PCR with a SHARED matrix and multiple right-hand sides.

    Same block structure as :func:`block2_pcr_components`, but ``f0s``/``f1s``
    carry a leading RHS axis: shape ``(nrhs,) + batch + (m,)`` against matrix
    components of shape ``batch + (m,)``. Each PCR sweep computes the matrix
    elimination factors (alpha/gamma and the M00/M11/L01/U10 updates) ONCE and
    applies them to every RHS — this is what makes the multi-zenith solar
    two-stream cheap: the Toon system matrix depends only on (tau, w0, g,
    Rsfc), so all zenith angles share one elimination (the per-sweep cost is
    ~14 shared ops + ~12 per RHS instead of ~26 per RHS).

    Returns ``(u0s, u1s)``, each ``(nrhs,) + batch + (m,)``. Equality with a
    per-RHS :func:`block2_pcr_components` loop is asserted in tests.
    """
    import math

    m = L01.shape[-1]
    dt = M00.dtype
    nrhs = f0s.shape[0]
    batch = jnp.broadcast_shapes(
        *(x.shape[:-1] for x in (L01, M00, M01, M10, M11, U10)),
        f0s.shape[1:-1],
        f1s.shape[1:-1],
    )
    bcast = lambda x: jnp.broadcast_to(jnp.asarray(x, dt), batch + (m,))
    L01, M00, M01, M10, M11, U10 = map(bcast, (L01, M00, M01, M10, M11, U10))
    bcast_f = lambda x: jnp.broadcast_to(jnp.asarray(x, dt), (nrhs,) + batch + (m,))
    f0s, f1s = bcast_f(f0s), bcast_f(f1s)

    def shift(x, k, fill):
        pad = jnp.full(x.shape[:-1] + (abs(k),), fill, dt)
        if k > 0:
            return jnp.concatenate([x[..., k:], pad], axis=-1)
        return jnp.concatenate([pad, x[..., :k]], axis=-1)

    steps = max(1, math.ceil(math.log2(m)))
    for s in range(steps):
        k = 1 << s
        inv_det = 1.0 / (M00 * M11 - M01 * M10)
        i00 = M11 * inv_det
        i01 = -M01 * inv_det
        i10 = -M10 * inv_det
        i11 = M00 * inv_det

        a0 = L01 * shift(i10, -k, 0.0)
        a1 = L01 * shift(i11, -k, 1.0)
        g0 = U10 * shift(i00, +k, 1.0)
        g1 = U10 * shift(i01, +k, 0.0)

        L01_new = -a0 * shift(L01, -k, 0.0)
        U10_new = -g1 * shift(U10, +k, 0.0)
        M00 = M00 - a1 * shift(U10, -k, 0.0)
        M11 = M11 - g0 * shift(L01, +k, 0.0)
        f0_new = f0s - a0[None] * shift(f0s, -k, 0.0) - a1[None] * shift(f1s, -k, 0.0)
        f1_new = f1s - g0[None] * shift(f0s, +k, 0.0) - g1[None] * shift(f1s, +k, 0.0)
        L01, U10, f0s, f1s = L01_new, U10_new, f0_new, f1_new

    inv_det = 1.0 / (M00 * M11 - M01 * M10)
    u0s = (M11[None] * f0s - M01[None] * f1s) * inv_det[None]
    u1s = (M00[None] * f1s - M10[None] * f0s) * inv_det[None]
    return u0s, u1s


def block2_pcr_components_dense(L01, M00, M01, M10, M11, U10, f0, f1):
    """Dense 2x2-block PCR (the original formulation; oracle for the
    structured :func:`block2_pcr_components`)."""
    import math

    m = L01.shape[-1]
    dt = M00.dtype
    batch = jnp.broadcast_shapes(
        *(x.shape[:-1] for x in (L01, M00, M01, M10, M11, U10, f0, f1))
    )
    bcast = lambda x: jnp.broadcast_to(x, batch + (m,))
    zeros = jnp.zeros(batch + (m,), dt)

    L = (zeros, bcast(L01), zeros, zeros)  # (l00, l01, l10, l11)
    U = (zeros, zeros, bcast(U10), zeros)
    M = (bcast(M00), bcast(M01), bcast(M10), bcast(M11))
    f = (bcast(f0), bcast(f1))

    def shift_t(t, k, fills):
        """Shift each component of tuple t by k along the last axis."""
        out = []
        for x, fill in zip(t, fills):
            pad = jnp.full(x.shape[:-1] + (abs(k),), fill, dt)
            if k > 0:
                out.append(jnp.concatenate([x[..., k:], pad], axis=-1))
            else:
                out.append(jnp.concatenate([pad, x[..., :k]], axis=-1))
        return tuple(out)

    ZF = (0.0, 0.0, 0.0, 0.0)
    IF = (1.0, 0.0, 0.0, 1.0)  # identity fill for M

    def inv2(Mx):
        m00, m01, m10, m11 = Mx
        inv_det = 1.0 / (m00 * m11 - m01 * m10)
        return (m11 * inv_det, -m01 * inv_det, -m10 * inv_det, m00 * inv_det)

    def mm(A, B):
        a00, a01, a10, a11 = A
        b00, b01, b10, b11 = B
        return (
            a00 * b00 + a01 * b10,
            a00 * b01 + a01 * b11,
            a10 * b00 + a11 * b10,
            a10 * b01 + a11 * b11,
        )

    def mv(A, v):
        a00, a01, a10, a11 = A
        v0, v1 = v
        return (a00 * v0 + a01 * v1, a10 * v0 + a11 * v1)

    def msub(A, B, C):
        return tuple(x - y - z for x, y, z in zip(A, B, C))

    def neg(A):
        return tuple(-x for x in A)

    steps = max(1, math.ceil(math.log2(m)))
    for s in range(steps):
        k = 1 << s
        L_m = shift_t(L, -k, ZF)
        U_m = shift_t(U, -k, ZF)
        M_m = shift_t(M, -k, IF)
        f_m = shift_t(f, -k, (0.0, 0.0))
        L_p = shift_t(L, +k, ZF)
        U_p = shift_t(U, +k, ZF)
        M_p = shift_t(M, +k, IF)
        f_p = shift_t(f, +k, (0.0, 0.0))

        alpha = mm(L, inv2(M_m))
        gamma = mm(U, inv2(M_p))
        L_new = neg(mm(alpha, L_m))
        U_new = neg(mm(gamma, U_p))
        M_new = msub(M, mm(alpha, U_m), mm(gamma, L_p))
        af = mv(alpha, f_m)
        gf = mv(gamma, f_p)
        f_new = (f[0] - af[0] - gf[0], f[1] - af[1] - gf[1])
        L, M, U, f = L_new, M_new, U_new, f_new

    return mv(inv2(M), f)  # (u0, u1), each (..., m)
