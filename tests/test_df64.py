"""Unit tests for the double-float (df64) arithmetic (ops/df64.py).

Each operation is compared against numpy float64 on float32 inputs: the DF
result (hi + lo, accumulated in f64) must match the f64 computation on the
SAME f32-rounded inputs to ~1e-12 relative — i.e. ~6 extra decimal digits
over plain float32.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clima_tpu.ops import df64
from clima_tpu.ops.df64 import DF, to_df

pytestmark = pytest.mark.fast


def _val(x):
    """DF -> float64 value."""
    return np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)


def _mk(rng, n, lo=-1e6, hi=1e6):
    x64 = rng.uniform(lo, hi, n)
    x32 = x64.astype(np.float32)
    return jnp.asarray(x32), x32.astype(np.float64)


def test_add_sub_mul_div():
    rng = np.random.default_rng(0)
    a32, a64 = _mk(rng, 512)
    b32, b64 = _mk(rng, 512)
    b64[np.abs(b64) < 1e-3] = 1.0
    b32 = jnp.asarray(b64.astype(np.float32))
    b64 = np.asarray(b32, np.float64)

    A, B = to_df(a32), to_df(b32)
    for op, ref in [
        (A + B, a64 + b64),
        (A - B, a64 - b64),
        (A * B, a64 * b64),
        (A / B, a64 / b64),
    ]:
        err = np.abs(_val(op) - ref) / np.maximum(np.abs(ref), 1e-30)
        assert err.max() < 1e-12


def test_compensated_cancellation():
    # the motivating case: two nearly-equal products whose difference is
    # ~1e-7 relative — plain f32 loses everything, DF keeps ~7 digits
    a = jnp.float32(1.2345678)
    b = jnp.float32(1.2345679)
    big = jnp.float32(1.0e6)
    d = to_df(a) * big - to_df(b) * big
    ref = (np.float64(np.float32(1.2345678)) - np.float64(np.float32(1.2345679))) * 1e6
    assert abs(float(_val(d)) - ref) / abs(ref) < 1e-10


def test_sqrt():
    rng = np.random.default_rng(1)
    x32, x64 = _mk(rng, 512, 1e-6, 1e8)
    out = df64.df_sqrt(to_df(x32))
    err = np.abs(_val(out) - np.sqrt(x64)) / np.sqrt(x64)
    assert err.max() < 1e-12
    # zero stays zero
    z = df64.df_sqrt(to_df(jnp.zeros(3, jnp.float32)))
    assert np.all(_val(z) == 0.0)


def test_exp():
    rng = np.random.default_rng(2)
    x64 = rng.uniform(-60.0, 60.0, 2048)
    x32 = jnp.asarray(x64.astype(np.float32))
    x64 = np.asarray(x32, np.float64)
    out = df64.df_exp(to_df(x32))
    err = np.abs(_val(out) - np.exp(x64)) / np.exp(x64)
    # dominated by k * (f32-pair ln2 error) for |x| ~ 60 (measured ~2e-11);
    # ~5e6 x better than plain f32 exp and far below what the df64 RT path
    # needs (the two-stream arguments are lam*tau in [0, ~40])
    assert err.max() < 5e-11
    # extreme tails clamp like f32
    tails = df64.df_exp(to_df(jnp.asarray([-100.0, 100.0], jnp.float32)))
    v = _val(tails)
    assert v[0] == 0.0 and np.isinf(v[1])


def test_expm1_near_zero():
    rng = np.random.default_rng(3)
    x64 = rng.uniform(-1e-5, 1e-5, 512)
    x32 = jnp.asarray(x64.astype(np.float32))
    x64 = np.asarray(x32, np.float64)
    out = df64.df_expm1(to_df(x32))
    ref = np.expm1(x64)
    err = np.abs(_val(out) - ref) / np.maximum(np.abs(ref), 1e-300)
    assert err.max() < 1e-10


def test_sum_and_cumsum():
    rng = np.random.default_rng(4)
    x32, x64 = _mk(rng, 1000, -1.0, 1.0)
    s = df64.df_sum(to_df(x32), axis=0)
    assert abs(float(_val(s)) - x64.sum()) / abs(x64.sum()) < 1e-12

    c = df64.df_cumsum(to_df(x32), axis=-1)
    ref = np.cumsum(x64)
    err = np.abs(_val(c) - ref) / np.maximum(np.abs(ref), 1e-12)
    assert err.max() < 1e-9


def test_pow_where_minmax_diff():
    rng = np.random.default_rng(5)
    x32, x64 = _mk(rng, 128, 0.1, 10.0)
    X = to_df(x32)
    assert np.abs(_val(X**3) - x64**3).max() / np.abs(x64**3).max() < 1e-12
    y32, y64 = _mk(rng, 128, 0.1, 10.0)
    Y = to_df(y32)
    assert np.allclose(_val(df64.df_maximum(X, Y)), np.maximum(x64, y64))
    assert np.allclose(_val(df64.df_minimum(X, Y)), np.minimum(x64, y64))
    assert np.allclose(
        _val(df64.df_where(x32 > y32, X, Y)), np.where(x64 > y64, x64, y64)
    )
    d = df64.df_diff(X, axis=0)
    assert np.abs(_val(d) - np.diff(x64)).max() < 1e-9


def test_mul_across_magnitude_window():
    # DF precision holds across the documented magnitude window
    # [~1e-26, 1e26]; outside it XLA's subnormal flushing breaks the Dekker
    # split (that failure mode produced a 6.6e-6 error in planck's h*nu
    # before the 2^k rescaling fix)
    rng = np.random.default_rng(6)
    for expo in (-25, -12, 0, 12, 25):
        scale = 10.0**expo
        a64 = rng.uniform(1.0, 2.0, 64) * scale
        b64 = rng.uniform(1.0, 2.0, 64)
        a32 = jnp.asarray(a64.astype(np.float32))
        b32 = jnp.asarray(b64.astype(np.float32))
        a64 = np.asarray(a32, np.float64)
        b64 = np.asarray(b32, np.float64)
        out = to_df(a32) * to_df(b32)
        err = np.abs(_val(out) - a64 * b64) / (a64 * b64)
        assert err.max() < 1e-12, expo


def test_comparisons_use_lo():
    a = DF(jnp.float32(1.0), jnp.float32(1e-9))
    b = DF(jnp.float32(1.0), jnp.float32(2e-9))
    assert bool(a < b) and bool(b > a) and bool(a <= b) and not bool(a >= b)


def test_pytree_and_jit():
    @jax.jit
    def f(x):
        return (x * x + 1.0) / (x + 2.0)

    x32 = jnp.asarray(np.float32([1.5, 2.5, 3.5]))
    out = f(to_df(x32))
    x64 = np.asarray(x32, np.float64)
    ref = (x64 * x64 + 1.0) / (x64 + 2.0)
    assert np.abs(_val(out) - ref).max() < 1e-12
