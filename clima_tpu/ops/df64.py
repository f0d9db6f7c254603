"""Double-float ("df64") arithmetic: ~49-bit precision from float32 pairs.

TPU v5e has no float64 hardware, which leaves the device-side RCE residual
with a float32 noise floor: the energy-balance residual is a ~1e-8-relative
cancellation of gross fluxes, and the f32 IR two-stream alone carries ~1e-4
relative error, so Newton stalls near max|F/F0| ~ 6e-3 — far from the
reference tolerance xtol_rc = 1e-5 (clima_adiabat_solve.f90:620-646).

This module implements the classical double-double construction on float32
pairs (hi, lo) with |lo| <= ulp(hi)/2, giving ~2*24-4 ~ 44-49 effective
mantissa bits — enough to evaluate fluxes to ~1e-12 relative and recover the
reference tolerance on chips without f64 (see ops.twostream_df).

Building blocks are the error-free transforms:

* ``two_sum`` (Knuth 1969, 6 flops): s = fl(a+b), err exactly a+b-s.
* ``two_prod`` via Dekker splitting (Dekker 1971): split each factor at
  2^12 (f32 has a 24-bit significand), so the partial products are exact.
  No FMA is required — and none may be introduced: XLA preserves IEEE
  semantics per HLO op and does not contract mul+add across ops, which is
  what makes these transforms valid under jit.

All functions are elementwise, shape-polymorphic, and jit/vmap-safe. ``DF``
is a registered pytree, so DF values flow through lax control flow.

Precision notes: operations are the "sloppy" double-double variants
(relative error ~2^-44 per op, a few ulps of the pair format); ``exp``
uses ln2 argument reduction + a degree-12 Taylor kernel (~2^-45);
``sqrt`` is one Newton refinement of the f32 estimate (~2^-46). Validated
against numpy float64 in tests/test_df64.py.

MAGNITUDE WINDOW: full pair precision requires |value| within roughly
[1e-26, 1e26]. XLA (CPU and TPU) flushes f32 subnormals to zero, and the
error-free transforms rely on exactly representing quantities ~|v| * 2^-36
(the Dekker split of the pair's lo): once those go subnormal (|v| below
~2^-90) precision silently degrades toward plain f32. Exact zeros are fine.
Rescale out-of-window constants by powers of two (exact) — see
``twostream_df.planck_fcn_df`` for the pattern.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["DF", "to_df", "df_where", "df_concatenate", "two_sum", "two_prod"]

_SPLIT = 4097.0  # 2^12 + 1 (Dekker split constant for float32)


def _seal(hi, lo):
    """Barrier a freshly computed (hi, lo) pair on the CPU backend.

    XLA:CPU's recompute-in-consumer fusion duplicates a value's defining
    subgraph into EVERY consumer; DF arithmetic reads each operand several
    times, so deep DF expressions blow up exponentially (measured: a two-
    stream solve at (64, 26) took 49 s on CPU and 158k optimized-HLO lines,
    vs milliseconds expected). An optimization_barrier after every DF op
    pins each pair to be computed once — near-eager runtime, linear compile.
    TPU's fusion is multi-output and handles the graphs fine (df64 IR
    two-stream measured 4.1x plain f32 there), so the barrier is skipped to
    preserve cross-op fusion.
    """
    if jax.default_backend() == "cpu":
        return jax.lax.optimization_barrier((hi, lo))
    return hi, lo


def two_sum(a, b):
    """Error-free sum: returns (s, e) with s = fl(a+b) and s + e == a + b."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free sum assuming |a| >= |b|."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    t = _SPLIT * a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Error-free product: (p, e) with p = fl(a*b) and p + e == a*b."""
    p = a * b
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


@jax.tree_util.register_pytree_node_class
class DF:
    """A double-float number: value = hi + lo, elementwise over arrays.

    Supports +, -, *, /, ** (int), unary -, and comparisons (on the pair,
    exact through the hi/lo ordering invariant). Mixed DF/array operands
    promote the plain array to DF with lo = 0.
    """

    __slots__ = ("hi", "lo")
    __array_priority__ = 100  # so jnp_array * DF defers to DF.__rmul__

    def __init__(self, hi, lo=None):
        self.hi = hi
        self.lo = jnp.zeros_like(hi) if lo is None else lo

    def tree_flatten(self):
        return (self.hi, self.lo), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- shape plumbing ------------------------------------------------
    @property
    def shape(self):
        return jnp.shape(self.hi)

    @property
    def ndim(self):
        return jnp.ndim(self.hi)

    @property
    def dtype(self):
        return jnp.asarray(self.hi).dtype

    def __getitem__(self, idx):
        return DF(self.hi[idx], self.lo[idx])

    def astype_sum(self, dtype=None):
        """Collapse to a plain array (hi + lo), optionally cast."""
        out = self.hi + self.lo
        return out if dtype is None else out.astype(dtype)

    # -- arithmetic ----------------------------------------------------
    def __add__(self, other):
        o = to_df(other)
        s, e = two_sum(self.hi, o.hi)
        e = e + (self.lo + o.lo)
        hi, lo = fast_two_sum(s, e)
        return DF(*_seal(hi, lo))

    __radd__ = __add__

    def __neg__(self):
        return DF(-self.hi, -self.lo)

    def __sub__(self, other):
        return self + (-to_df(other))

    def __rsub__(self, other):
        return to_df(other) + (-self)

    def __mul__(self, other):
        o = to_df(other)
        p, e = two_prod(self.hi, o.hi)
        e = e + (self.hi * o.lo + self.lo * o.hi)
        hi, lo = fast_two_sum(p, e)
        return DF(*_seal(hi, lo))

    __rmul__ = __mul__

    def __truediv__(self, other):
        o = to_df(other)
        q1 = self.hi / o.hi
        r = self - o * q1
        q2 = r.hi / o.hi
        r = r - o * q2
        q3 = r.hi / o.hi
        hi, lo = fast_two_sum(q1, q2)
        return DF(*_seal(hi, lo)) + q3

    def __rtruediv__(self, other):
        return to_df(other) / self

    def __pow__(self, n):
        if not isinstance(n, int):
            raise TypeError("DF ** only supports integer exponents")
        if n == 2:
            return self * self
        out = DF(jnp.ones_like(self.hi))
        base, k = self, abs(n)
        while k:
            if k & 1:
                out = out * base
            base = base * base
            k >>= 1
        return out if n >= 0 else DF(jnp.ones_like(self.hi)) / out

    # -- comparisons (hi then lo; valid through the ordering invariant) --
    def _cmp(self, other, op):
        o = to_df(other)
        return op((self.hi, self.lo), (o.hi, o.lo))

    def __lt__(self, other):
        o = to_df(other)
        return (self.hi < o.hi) | ((self.hi == o.hi) & (self.lo < o.lo))

    def __le__(self, other):
        o = to_df(other)
        return (self.hi < o.hi) | ((self.hi == o.hi) & (self.lo <= o.lo))

    def __gt__(self, other):
        return to_df(other) < self

    def __ge__(self, other):
        return to_df(other) <= self


def to_df(x):
    """Promote a plain array / scalar / DF to DF.

    Python floats (and numpy f64 scalars) are split EXACTLY into an
    (f32 hi, f32 lo) pair — critical for constants like pi: rounding them to
    a single f32 would cap every downstream product at ~3e-8 relative.
    """
    if isinstance(x, DF):
        return x
    if isinstance(x, (float, int)) or (
        isinstance(x, (np.floating, np.integer)) and not isinstance(x, np.float32)
    ):
        v = float(x)
        hi = np.float32(v)
        lo = np.float32(v - float(hi))
        return DF(jnp.float32(hi), jnp.float32(lo))
    x = jnp.asarray(x)
    if x.dtype == jnp.float64:
        # exact f64 -> (f32 hi, f32 lo) decomposition (for constants on CPU)
        hi = x.astype(jnp.float32)
        lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
        return DF(hi, lo)
    return DF(x, jnp.zeros_like(x))


def const_df(value, like=None):
    """A DF constant from a Python float, split exactly: hi = f32(value),
    lo = f32(value - hi). ``like`` broadcasts to an array's shape."""
    hi = np.float32(value)
    lo = np.float32(value - float(hi))
    if like is not None:
        ones = jnp.ones_like(like.hi if isinstance(like, DF) else like)
        return DF(ones * hi, ones * lo)
    return DF(jnp.float32(hi), jnp.float32(lo))


# ---------------------------------------------------------------------------
# elementwise math
# ---------------------------------------------------------------------------


def df_sqrt(x):
    """sqrt for DF via one Newton step on the f32 estimate:
    y = y0 + (x - y0^2) / (2 y0)."""
    x = to_df(x)
    y0 = jnp.sqrt(jnp.maximum(x.hi, 0.0))
    y0_df = DF(y0)
    num = x - y0_df * y0_df
    safe = jnp.where(y0 > 0.0, y0, 1.0)
    corr = num / DF(2.0 * safe)
    out = y0_df + corr
    return df_where(y0 > 0.0, out, DF(jnp.zeros_like(y0)))


def df_exp(x):
    """exp for DF: k = round(x/ln2), exp(x) = 2^k * expm1-style Taylor(r).

    |r| <= ln2/2; a degree-12 Taylor series leaves relative error
    ~ r^13/13! < 2e-15, below the pair precision. 2^k is exact in f32 for
    the flux-relevant range; the extreme tails (|x| > 80) clamp to
    0 / +inf exactly as f32 exp does.
    """
    x = to_df(x)
    ln2 = np.float64(0.693147180559945309417232121458176568)
    ln2_hi = np.float32(ln2)
    ln2_lo = np.float32(ln2 - np.float64(ln2_hi))
    inv_ln2 = np.float32(1.0 / ln2)

    k = jnp.round(x.hi * inv_ln2)
    r = x - DF(k) * DF(jnp.full_like(x.hi, ln2_hi), jnp.full_like(x.hi, ln2_lo))

    # Taylor: sum_{n=0..12} r^n / n!
    acc = DF(jnp.full_like(x.hi, 1.0 / 479001600.0))  # 1/12!
    for n in range(11, -1, -1):
        inv_fact = np.float64(1.0)
        for m in range(2, n + 1):
            inv_fact /= m
        c_hi = np.float32(inv_fact)
        c_lo = np.float32(inv_fact - np.float64(c_hi))
        acc = acc * r + DF(jnp.full_like(x.hi, c_hi), jnp.full_like(x.hi, c_lo))

    # scale by 2^k EXACTLY: exp2 (a polynomial approximation) is 1-2 ulp off
    # even at integer arguments, which alone caps the result at f32 accuracy.
    # Build the power of two from exponent bits instead (exact, and lowers to
    # shift+bitcast on TPU). k is clamped to the normal range; the tails are
    # overwritten by the under/overflow clamps below.
    ki = jnp.clip(k, -126.0, 127.0).astype(jnp.int32)
    two_k = jax.lax.bitcast_convert_type(
        (ki + 127) << 23, jnp.float32
    )
    out = DF(acc.hi * two_k, acc.lo * two_k)
    # clamp extreme arguments (underflow to 0, overflow to inf) like f32 exp
    under = x.hi < -87.0
    over = x.hi > 88.0
    out = df_where(under, DF(jnp.zeros_like(x.hi)), out)
    out = df_where(over, DF(jnp.full_like(x.hi, jnp.inf)), out)
    return out


def df_expm1(x):
    """expm1 for DF (accurate near 0): Taylor for |x| < 0.5, else exp - 1."""
    x = to_df(x)
    small = jnp.abs(x.hi) < 0.5
    # Taylor: x * sum_{n=0..11} x^n/(n+1)!
    acc = DF(jnp.zeros_like(x.hi))
    for n in range(12, 0, -1):
        inv_fact = np.float64(1.0)
        for m in range(2, n + 1):
            inv_fact /= m
        c_hi = np.float32(inv_fact)
        c_lo = np.float32(inv_fact - np.float64(c_hi))
        acc = acc * x + DF(jnp.full_like(x.hi, c_hi), jnp.full_like(x.hi, c_lo))
    taylor = x * acc
    big = df_exp(x) - 1.0
    return df_where(small, taylor, big)


# ---------------------------------------------------------------------------
# array plumbing
# ---------------------------------------------------------------------------


def df_where(cond, a, b):
    a, b = to_df(a), to_df(b)
    return DF(jnp.where(cond, a.hi, b.hi), jnp.where(cond, a.lo, b.lo))


def _lift2(fn):
    @functools.wraps(fn)
    def wrapper(xs, *args, **kwargs):
        xs = [to_df(x) for x in xs]
        return DF(
            fn([x.hi for x in xs], *args, **kwargs),
            fn([x.lo for x in xs], *args, **kwargs),
        )

    return wrapper


df_concatenate = _lift2(jnp.concatenate)


def df_map(fn, x, *args, **kwargs):
    """Apply a shape-only jnp op (transpose, reshape, broadcast_to, flip,
    expand_dims...) to both components."""
    x = to_df(x)
    return DF(fn(x.hi, *args, **kwargs), fn(x.lo, *args, **kwargs))


def df_zeros_like(x):
    x = to_df(x)
    return DF(jnp.zeros_like(x.hi), jnp.zeros_like(x.lo))


def df_ones_like(x):
    x = to_df(x)
    return DF(jnp.ones_like(x.hi), jnp.zeros_like(x.lo))


def df_sum(x, axis=None, keepdims=False):
    """Sum a DF array along an axis with compensated pair accumulation.

    Pairwise: fold elements with the DF __add__ (each fold is a compensated
    two_sum chain), via a simple log2 tree to keep error growth ~log n.
    """
    x = to_df(x)
    if axis is None:
        flat = DF(x.hi.reshape(-1), x.lo.reshape(-1))
        return df_sum(flat, axis=0)
    axis = axis % x.hi.ndim

    def move(a):
        return jnp.moveaxis(a, axis, 0)

    hi, lo = move(x.hi), move(x.lo)
    cur = DF(hi, lo)
    n = cur.hi.shape[0]
    while n > 1:
        half = n // 2
        head = DF(cur.hi[: 2 * half : 2], cur.lo[: 2 * half : 2])
        tail = DF(cur.hi[1 : 2 * half : 2], cur.lo[1 : 2 * half : 2])
        merged = head + tail
        if n % 2:
            merged = df_concatenate([merged, DF(cur.hi[-1:], cur.lo[-1:])], axis=0)
        cur = merged
        n = cur.hi.shape[0]
    out = DF(cur.hi[0], cur.lo[0])
    if keepdims:
        out = df_map(lambda a: jnp.expand_dims(a, axis), out)
    return out


def df_diff(x, axis=-1):
    x = to_df(x)
    ndim = x.hi.ndim
    axis = axis % ndim
    sl_hi = tuple(slice(1, None) if i == axis else slice(None) for i in range(ndim))
    sl_lo = tuple(slice(None, -1) if i == axis else slice(None) for i in range(ndim))
    return DF(x.hi[sl_hi], x.lo[sl_hi]) - DF(x.hi[sl_lo], x.lo[sl_lo])


def df_cumsum(x, axis=-1):
    """Inclusive cumsum via doubling shifts with compensated DF adds."""
    x = to_df(x)
    ndim = x.hi.ndim
    axis = axis % ndim
    n = x.hi.shape[axis]

    def shifted(a, k):
        pad_shape = list(a.shape)
        pad_shape[axis] = k
        pad = jnp.zeros(pad_shape, a.dtype)
        sl = tuple(
            slice(None, -k) if i == axis else slice(None) for i in range(ndim)
        )
        return jnp.concatenate([pad, a[sl]], axis=axis)

    cur = x
    k = 1
    while k < n:
        cur = cur + DF(shifted(cur.hi, k), shifted(cur.lo, k))
        k *= 2
    return cur


def df_flush_tiny(x, eps=1e-15):
    """Zero a DF pair where |hi| < eps (default 1e-15).

    Two reasons to flush geometrically-decaying quantities (e.g. exp(-lam
    tau) transmissions, PCR off-diagonals):

    * Precision window: below ~1e-26 the pair silently degrades (module
      docstring); at 1e-15 the dropped contribution is ~3 orders below the
      pair epsilon (~6e-13 relative) for O(1) arithmetic.
    * x86 runtime: products of two sub-1e-19 values create SUBNORMAL
      intermediates inside ``two_prod`` (the Dekker split parts multiply),
      and x86 handles subnormals via ~100-cycle microcode assists — measured
      30x wall-clock blowup of the df64 two-stream on XLA:CPU before these
      flushes. 1e-15 keeps every split-product normal (1e-15 * 2^-12 squared
      is still > the f32 min normal). TPU flushes subnormals in hardware
      (no penalty), so this costs only the selects there.
    """
    x = to_df(x)
    keep = jnp.abs(x.hi) >= eps
    zero = jnp.zeros((), x.hi.dtype)
    return DF(jnp.where(keep, x.hi, zero), jnp.where(keep, x.lo, zero))


def df_maximum(a, b):
    a, b = to_df(a), to_df(b)
    return df_where(a >= b, a, b)


def df_minimum(a, b):
    a, b = to_df(a), to_df(b)
    return df_where(a <= b, a, b)
