"""Native C++ futils library: build + cross-check against numpy."""

import numpy as np
import pytest

from clima_tpu.native.build import load


@pytest.fixture(scope="module")
def lib():
    lib = load()
    if lib is None:
        pytest.skip("native library unavailable (no compiler)")
    return lib


def _numpy_rebin(old_bins, old_vals, new_bins):
    widths = np.diff(old_bins)
    F = np.concatenate([[0.0], np.cumsum(old_vals * widths)])
    Fe = np.interp(np.clip(new_bins, old_bins[0], old_bins[-1]), old_bins, F)
    return np.diff(Fe) / np.diff(new_bins)


def test_native_rebin_matches_numpy(lib):
    from clima_tpu.ops.rebin import rebin, _cptr

    rng = np.random.default_rng(0)
    for _ in range(20):
        n_old = rng.integers(2, 50)
        n_new = rng.integers(2, 30)
        old = np.sort(rng.uniform(0, 10, n_old + 1))
        old += np.arange(n_old + 1) * 1e-9  # ensure strictly increasing
        vals = rng.uniform(-5, 5, n_old)
        new = np.sort(rng.uniform(-1, 11, n_new + 1))
        new += np.arange(n_new + 1) * 1e-9
        out = np.empty(n_new)
        status = lib.clima_rebin(n_old, _cptr(old), _cptr(vals), n_new, _cptr(new), _cptr(out))
        assert status == 0
        np.testing.assert_allclose(out, _numpy_rebin(old, vals, new), rtol=1e-12, atol=1e-12)


def test_native_inter2_matches_numpy(lib):
    from clima_tpu.ops import rebin as rb

    rng = np.random.default_rng(1)
    x = np.sort(rng.uniform(-5, 25, 60))
    x[0], x[-1] = -5.0, 25.0
    y = rng.uniform(0, 3, 60)
    xg = np.linspace(0.0, 20.0, 9)

    # native path via the public function
    out_pub = rb.inter2(xg, x, y)

    # force the numpy fallback
    lib0 = rb._native_lib
    try:
        rb._native_lib = lambda: None
        out_np = rb.inter2(xg, x, y)
    finally:
        rb._native_lib = lib0
    np.testing.assert_allclose(out_pub, out_np, rtol=1e-12)


def test_native_used_in_data_pipeline(lib):
    # the data loaders should run through the native path without error
    from clima_tpu.data import create_synthetic_datadir
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        create_synthetic_datadir(d)
