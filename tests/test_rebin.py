import numpy as np
import jax.numpy as jnp
import pytest

from clima_tpu.ops.rebin import (
    rebin,
    rebin_jnp,
    rebin_with_errors,
    inter2,
    addpnt,
    interp_discrete_to_bins,
)


def brute_force_rebin(old_bins, old_vals, new_bins):
    """Independent O(n*m) oracle: overlap-weighted mean of piecewise-constant data."""
    n_new = len(new_bins) - 1
    out = np.zeros(n_new)
    for j in range(n_new):
        lo, hi = new_bins[j], new_bins[j + 1]
        total = 0.0
        for i in range(len(old_vals)):
            a, b = old_bins[i], old_bins[i + 1]
            overlap = max(0.0, min(b, hi) - max(a, lo))
            total += overlap * old_vals[i]
        out[j] = total / (hi - lo)
    return out


def test_rebin_identity():
    edges = np.array([0.0, 1.0, 2.0, 3.0])
    vals = np.array([1.0, 5.0, 2.0])
    np.testing.assert_allclose(rebin(edges, vals, edges), vals, rtol=1e-14)


def test_rebin_conservation():
    rng = np.random.default_rng(0)
    old = np.sort(rng.uniform(0, 10, 33))
    vals = rng.uniform(0, 5, 32)
    new = np.linspace(old[0], old[-1], 7)
    out = rebin(old, vals, new)
    # total integral conserved when new grid spans old grid
    np.testing.assert_allclose(
        np.sum(out * np.diff(new)), np.sum(vals * np.diff(old)), rtol=1e-12
    )
    np.testing.assert_allclose(out, brute_force_rebin(old, vals, new), rtol=1e-12)


def test_rebin_vs_bruteforce_random():
    rng = np.random.default_rng(42)
    for _ in range(10):
        old = np.sort(rng.uniform(0, 1, 17))
        old[0], old[-1] = 0.0, 1.0
        vals = rng.uniform(0, 100, 16)
        new = np.sort(rng.uniform(0, 1, 9))
        new[0], new[-1] = 0.0, 1.0
        np.testing.assert_allclose(
            rebin(old, vals, new), brute_force_rebin(old, vals, new), rtol=1e-11
        )


def test_rebin_jnp_matches_numpy():
    rng = np.random.default_rng(3)
    old = np.sort(rng.uniform(0, 1, 26))
    old[0], old[-1] = 0.0, 1.0
    vals = rng.uniform(0, 10, 25)
    new = np.linspace(0, 1, 6)
    np.testing.assert_allclose(
        np.asarray(rebin_jnp(old, vals, new)), rebin(old, vals, new), rtol=1e-12
    )


def test_rebin_jnp_batched():
    rng = np.random.default_rng(4)
    B = 5
    n_old, n_new = 16, 4
    widths = rng.uniform(0.1, 1.0, (B, n_old))
    widths /= widths.sum(axis=1, keepdims=True)
    old = np.concatenate([np.zeros((B, 1)), np.cumsum(widths, axis=1)], axis=1)
    old[:, -1] = 1.0
    vals = rng.uniform(0, 10, (B, n_old))
    new = np.linspace(0, 1, n_new + 1)
    out = np.asarray(rebin_jnp(old, vals, new))
    for b in range(B):
        np.testing.assert_allclose(out[b], rebin(old[b], vals[b], new), rtol=1e-11)


def test_rebin_with_errors():
    old = np.array([0.0, 1.0, 2.0])
    vals = np.array([2.0, 4.0])
    errs = np.array([0.2, 0.4])
    new = np.array([0.0, 2.0])
    v, e = rebin_with_errors(old, vals, errs, new)
    np.testing.assert_allclose(v, [3.0], rtol=1e-13)
    np.testing.assert_allclose(e, [np.sqrt(0.1**2 + 0.2**2)], rtol=1e-13)


def test_inter2_linear_exact():
    # averaging a linear function over bins is exact
    x = np.linspace(-1, 11, 50)
    y = 3.0 * x + 1.0
    edges = np.array([0.0, 2.0, 5.0, 10.0])
    out = inter2(edges, x, y)
    mid = 0.5 * (edges[1:] + edges[:-1])
    np.testing.assert_allclose(out, 3.0 * mid + 1.0, rtol=1e-12)


def test_addpnt():
    x = np.array([1.0, 2.0, 4.0])
    y = np.array([10.0, 20.0, 40.0])
    x2, y2 = addpnt(x, y, 3.0, 30.0)
    np.testing.assert_array_equal(x2, [1, 2, 3, 4])
    np.testing.assert_array_equal(y2, [10, 20, 30, 40])


def test_interp_discrete_to_bins_constant():
    xp = np.array([1.0, 2.0, 3.0])
    yp = np.array([5.0, 5.0, 5.0])
    edges = np.array([0.0, 1.5, 2.5, 10.0])
    out = interp_discrete_to_bins(edges, xp, yp, "Constant")
    np.testing.assert_allclose(out, [5.0, 5.0, 5.0], rtol=1e-9)


def test_interp_discrete_to_bins_fillvalue():
    xp = np.array([1.0, 2.0])
    yp = np.array([5.0, 5.0])
    edges = np.array([10.0, 20.0])
    out = interp_discrete_to_bins(edges, xp, yp, "FillValue", fill_value=-30.0)
    np.testing.assert_allclose(out, [-30.0], rtol=1e-9)
