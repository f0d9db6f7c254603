"""Conservative rebinning and spectral regridding primitives.

These reimplement the semantics of the reference's vendored ``futils`` routines
(`rebin`, `inter2`, `addpnt`, `interp_discrete_to_bins`), which define the
opacity-grid semantics of the whole model (SURVEY.md item 5 of "hard parts";
reference usage at ``src/radtran/clima_radtran_types_create.f90:9-78`` and
``src/radtran/clima_radtran_types.f90:780-888``).

Two implementations are provided:

* jnp (traceable, vmappable) versions used inside jitted compute — notably
  :func:`rebin_cumulative` which is the hot primitive of RORR k-mixing.
* numpy host versions used at data-load time (spectral regridding).

The conservative rebin is formulated through the cumulative integral of the
piecewise-constant source function, which turns rebinning into a sorted
interpolation — a gather, which is what the TPU wants.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "rebin",
    "rebin_with_errors",
    "rebin_jnp",
    "inter2",
    "addpnt",
    "interp_discrete_to_bins",
    "grid_at_exact",
]


def _cumulative(old_bins, old_vals, xp):
    """Cumulative integral F(x) of the piecewise-constant function at bin edges."""
    widths = old_bins[..., 1:] - old_bins[..., :-1]
    F = xp.concatenate([xp.zeros(old_vals.shape[:-1] + (1,), old_vals.dtype),
                        xp.cumsum(old_vals * widths, axis=-1)], axis=-1)
    return F


def _native_lib():
    try:
        from ..native.build import load

        return load()
    except Exception:
        return None


def _cptr(arr):
    import ctypes

    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def rebin(old_bins: np.ndarray, old_vals: np.ndarray, new_bins: np.ndarray) -> np.ndarray:
    """Conservatively rebin ``old_vals`` on edges ``old_bins`` to edges ``new_bins``.

    Host version. Mirrors futils ``rebin`` as exposed at
    ``clima/cython/futils.pyx:15-53``: the mean of the piecewise-constant
    function over each new bin; regions outside the old grid contribute zero.
    Uses the native C++ merge-sweep (clima_tpu/native/futils.cpp) when
    available, numpy otherwise; both are cross-checked in tests.
    """
    old_bins = np.ascontiguousarray(old_bins, dtype=np.float64)
    old_vals = np.ascontiguousarray(old_vals, dtype=np.float64)
    new_bins = np.ascontiguousarray(new_bins, dtype=np.float64)
    if old_bins.ndim != 1 or new_bins.ndim != 1:
        raise ValueError("bins must be 1-D")
    if old_vals.shape[-1] != old_bins.shape[0] - 1:
        raise ValueError("old_vals must have len(old_bins)-1 values")
    if np.any(np.diff(old_bins) <= 0) or np.any(np.diff(new_bins) <= 0):
        raise ValueError("bin edges must be strictly increasing")

    lib = _native_lib()
    if lib is not None and old_vals.ndim == 1:
        out = np.empty(len(new_bins) - 1)
        status = lib.clima_rebin(
            len(old_vals), _cptr(old_bins), _cptr(old_vals),
            len(new_bins) - 1, _cptr(new_bins), _cptr(out),
        )
        if status == 0:
            return out

    F = _cumulative(old_bins, old_vals, np)
    Fe = np.interp(np.clip(new_bins, old_bins[0], old_bins[-1]), old_bins, F)
    return np.diff(Fe) / np.diff(new_bins)


def rebin_with_errors(old_bins, old_vals, old_errs, new_bins):
    """Conservative rebin propagating independent-bin errors in quadrature.

    Mirrors ``clima/cython/futils.pyx:55-99``.
    """
    old_bins = np.asarray(old_bins, dtype=np.float64)
    old_errs = np.asarray(old_errs, dtype=np.float64)
    new_vals = rebin(old_bins, old_vals, new_bins)
    new_bins = np.asarray(new_bins, dtype=np.float64)
    # variance integrates as (overlap/width)**2 * err**2
    n_new = len(new_bins) - 1
    new_errs = np.zeros(n_new)
    for j in range(n_new):
        lo, hi = new_bins[j], new_bins[j + 1]
        w = hi - lo
        over_lo = np.maximum(old_bins[:-1], lo)
        over_hi = np.minimum(old_bins[1:], hi)
        overlap = np.clip(over_hi - over_lo, 0.0, None)
        new_errs[j] = np.sqrt(np.sum((overlap / w) ** 2 * old_errs**2))
    return new_vals, new_errs


def rebin_jnp(old_bins, old_vals, new_bins):
    """Traceable conservative rebin along the last axis.

    ``old_bins``: (..., n_old+1) strictly increasing edges
    ``old_vals``: (..., n_old)
    ``new_bins``: (n_new+1,) or broadcastable edges

    Supports batched ``old_bins``/``old_vals`` (used by RORR where every
    (layer, bin) has its own sorted weight-edge grid).
    """
    old_bins = jnp.asarray(old_bins)
    old_vals = jnp.asarray(old_vals)
    new_bins = jnp.asarray(new_bins)
    F = _cumulative(old_bins, old_vals, jnp)
    lo = old_bins[..., :1]
    hi = old_bins[..., -1:]
    x = jnp.clip(new_bins, lo, hi)
    Fe = _interp_sorted(x, old_bins, F)
    return jnp.diff(Fe, axis=-1) / jnp.diff(new_bins, axis=-1)


def _interp_sorted(x, xs, ys):
    """Vectorized linear interpolation with batched abscissae along last axis.

    ``xs``: (..., n) sorted; ``ys``: (..., n); ``x``: (..., m). All leading
    dims broadcast.
    """
    n = xs.shape[-1]
    idx = jnp.clip(
        jnp.searchsorted(xs, x, side="right", method="compare_all") - 1
        if xs.ndim == 1
        else _batched_searchsorted(xs, x) - 1,
        0,
        n - 2,
    )
    x0 = jnp.take_along_axis(jnp.broadcast_to(xs, idx.shape[:-1] + (n,)), idx, axis=-1)
    x1 = jnp.take_along_axis(jnp.broadcast_to(xs, idx.shape[:-1] + (n,)), idx + 1, axis=-1)
    y0 = jnp.take_along_axis(jnp.broadcast_to(ys, idx.shape[:-1] + (n,)), idx, axis=-1)
    y1 = jnp.take_along_axis(jnp.broadcast_to(ys, idx.shape[:-1] + (n,)), idx + 1, axis=-1)
    t = (x - x0) / jnp.where(x1 == x0, 1.0, x1 - x0)
    return y0 + t * (y1 - y0)


def _batched_searchsorted(xs, x):
    """searchsorted(side='right') where both xs (..., n) and x (..., m) are batched."""
    bshape = jnp.broadcast_shapes(xs.shape[:-1], x.shape[:-1])
    xs = jnp.broadcast_to(xs, bshape + xs.shape[-1:])
    x = jnp.broadcast_to(x, bshape + x.shape[-1:])
    # compare-all: (..., m, n) boolean; counts of xs <= x
    cmp = xs[..., None, :] <= x[..., :, None]
    return jnp.sum(cmp, axis=-1)


# ----------------------------------------------------------------------------
# Host-side spectral regridding (load time only)
# ----------------------------------------------------------------------------


def addpnt(x: np.ndarray, y: np.ndarray, xnew: float, ynew: float):
    """Insert point (xnew, ynew) keeping x sorted. Mirrors futils ``addpnt``."""
    i = np.searchsorted(x, xnew)
    return np.insert(x, i, xnew), np.insert(y, i, ynew)


def inter2(xg: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Average the piecewise-linear function (x, y) over each bin of edges ``xg``.

    Mirrors futils ``inter2`` used for stellar flux and xsection regridding
    (``clima_radtran_types_create.f90:64,966,1194``): output j is the integral
    of the linear interpolant over [xg[j], xg[j+1]] divided by the bin width.
    The input grid must fully cover ``xg`` (callers guarantee this via addpnt
    sentinel points at 0 and +huge).
    """
    xg = np.ascontiguousarray(xg, dtype=np.float64)
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    if x[0] > xg[0] or x[-1] < xg[-1]:
        raise ValueError("inter2: data grid does not cover target bins")

    lib = _native_lib()
    if lib is not None:
        out = np.empty(len(xg) - 1)
        status = lib.clima_inter2(
            len(xg) - 1, _cptr(xg), _cptr(out), len(x), _cptr(x), _cptr(y)
        )
        if status == 0:
            return out

    # cumulative integral of the piecewise-linear function at points x
    seg = 0.5 * (y[1:] + y[:-1]) * np.diff(x)
    F = np.concatenate([[0.0], np.cumsum(seg)])

    def cumint(pts):
        idx = np.clip(np.searchsorted(x, pts, side="right") - 1, 0, len(x) - 2)
        x0 = x[idx]
        x1 = x[idx + 1]
        y0 = y[idx]
        y1 = y[idx + 1]
        t = np.where(x1 > x0, (pts - x0) / np.where(x1 == x0, 1.0, x1 - x0), 0.0)
        yq = y0 + t * (y1 - y0)
        return F[idx] + 0.5 * (y0 + yq) * (pts - x0)

    Fe = cumint(xg)
    return np.diff(Fe) / np.diff(xg)


def interp_discrete_to_bins(bin_edges, xp, yp, extrapolation="Constant", fill_value=None):
    """Regrid discrete samples (xp, yp) onto bins, futils ``interp_discrete_to_bins``.

    Used for Mie particle optical data ('Constant') and photolysis xsections
    ('FillValue') at ``clima_radtran_types_create.f90:832-841,1461``.

    The value in each bin is the average of the linear interpolant of the
    samples over the bin. Out-of-range regions use constant end-value
    extrapolation ('Constant') or ``fill_value`` ('FillValue').
    """
    bin_edges = np.asarray(bin_edges, dtype=np.float64)
    xp = np.asarray(xp, dtype=np.float64)
    yp = np.asarray(yp, dtype=np.float64)
    order = np.argsort(xp)
    xp = xp[order]
    yp = yp[order]
    if extrapolation == "Constant":
        lo_val, hi_val = yp[0], yp[-1]
    elif extrapolation == "FillValue":
        if fill_value is None:
            raise ValueError("fill_value required for FillValue extrapolation")
        lo_val = hi_val = fill_value
    else:
        raise ValueError(f"unknown extrapolation {extrapolation!r}")
    eps = 1e-10 * max(abs(xp[0]), 1.0)
    x = np.concatenate([[min(bin_edges[0], xp[0]) - 1.0, xp[0] - eps], xp,
                        [xp[-1] + eps, max(bin_edges[-1], xp[-1]) + 1.0]])
    y = np.concatenate([[lo_val, lo_val], yp, [hi_val, hi_val]])
    return inter2(bin_edges, x, y)


def grid_at_exact(n, lo, hi):
    """linspace helper matching futils ``linspace`` + exact endpoint pinning."""
    g = np.linspace(lo, hi, n)
    g[0] = lo
    g[-1] = hi
    return g
