"""Vectorized linear interpolation (finterp-equivalent, gather-based).

Replaces the reference's vendored ``finterp`` ``linear_interp_1d/2d`` objects
(used throughout ``src/radtran/clima_radtran_types.f90:890-983`` for k-table,
xsection and particle interpolation). On TPU these become pure gathers over
static tables, fully batchable with vmap; outside the table the edge interval
is extrapolated linearly, matching finterp behavior (callers clamp anyway,
e.g. ``clima_radtran_types.f90:655-656``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["interp1d", "interp2d", "searchsorted_right", "hat_weights",
           "pdot"]


def pdot(a, b):
    """Full-f32-precision matmul for precision-critical contractions.

    On TPU, f32 matmuls default to ONE bf16 MXU pass (~0.4% relative
    error). For hat-weight interpolation and weighted flux reductions that
    quantization is a correctness bug: it staircases the RCE residual as a
    function of temperature and was measured to floor device convergence at
    max|F/F0| ~ 2.5e-3 regardless of the flux path's own precision
    (f32 OR df64). Precision.HIGHEST runs the 6-pass f32-equivalent MXU
    algorithm; these contractions are small, so the cost is negligible next
    to the opacity/RT tensors they feed.
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def hat_weights(grid, x):
    """Linear-interpolation hat-basis weights, gather-free.

    Returns W of shape ``x.shape + (len(grid),)`` with two adjacent nonzeros
    per sample such that ``W @ values == interp(x, grid, values)`` for
    ``x`` clamped to the grid range.

    This turns every table interpolation into a small dense contraction —
    on TPU a matmul/VPU reduction — instead of an XLA gather, which
    serializes badly for many small indexed reads (the dominant cost of the
    reference-style per-point interpolation when vmapped over columns).
    """
    grid = jnp.asarray(grid)
    n = grid.shape[0]
    xc = jnp.clip(x, grid[0], grid[-1])[..., None]
    # boundary nodes get a virtual outer neighbor so their half-hat is flat
    gl = jnp.concatenate([grid[:1] - 1.0, grid[:-1]])  # left neighbors
    gr = jnp.concatenate([grid[1:], grid[-1:] + 1.0])  # right neighbors
    up = (xc - gl) / (grid - gl)  # rising edge of the hat
    down = (gr - xc) / (gr - grid)  # falling edge
    w = jnp.clip(jnp.minimum(up, down), 0.0, 1.0)
    # normalize to guard the sample-exactly-on-a-node double count
    return w / jnp.sum(w, axis=-1, keepdims=True)


def searchsorted_right(xs, x):
    """Index of the interval containing x: clip(searchsorted(xs, x, 'right')-1, 0, n-2)."""
    n = xs.shape[-1]
    return jnp.clip(jnp.searchsorted(xs, x, side="right") - 1, 0, n - 2)


def interp1d(x, xs, ys):
    """Linear interpolation of ys(xs) at x; linear extrapolation at the edges.

    ``xs``: (n,) sorted 1-D grid. ``ys``: (..., n) values (leading dims are
    table batch dims, e.g. wavelength bins). ``x``: arbitrary shape. The
    result has shape ``ys.shape[:-1] broadcast with x.shape`` following
    standard numpy broadcasting with x appended: result[..., i] uses x[i].

    For the common cases in this package we use explicit vmap at call sites;
    here x is assumed scalar-like broadcastable against ys' leading dims.
    """
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)
    idx = searchsorted_right(xs, x)
    x0 = xs[idx]
    x1 = xs[idx + 1]
    y0 = jnp.take_along_axis(ys, _expand_idx(idx, ys), axis=-1).squeeze(-1) if ys.ndim > 1 else ys[idx]
    y1 = (
        jnp.take_along_axis(ys, _expand_idx(idx + 1, ys), axis=-1).squeeze(-1)
        if ys.ndim > 1
        else ys[idx + 1]
    )
    t = (x - x0) / (x1 - x0)
    return y0 + t * (y1 - y0)


def _expand_idx(idx, ys):
    idx = jnp.asarray(idx)
    return jnp.broadcast_to(idx[..., None], ys.shape[:-1] + (1,))


def interp2d(x, y, xs, ys, table):
    """Bilinear interpolation of table(xs, ys) at points (x, y).

    ``xs``: (nx,), ``ys``: (ny,) sorted grids; ``table``: (..., nx, ny).
    ``x``/``y``: scalars or arrays broadcastable with each other; the result
    broadcasts table batch dims against point dims.

    Used for k-table evaluation: log10k[(gauss, bin)](log10P, T)
    (``clima_radtran_types.f90:649-662``).
    """
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)
    table = jnp.asarray(table)
    ix = searchsorted_right(xs, x)
    iy = searchsorted_right(ys, y)
    x0, x1 = xs[ix], xs[ix + 1]
    y0, y1 = ys[iy], ys[iy + 1]
    tx = (x - x0) / (x1 - x0)
    ty = (y - y0) / (y1 - y0)

    def gather(ixx, iyy):
        if table.ndim == 2:
            return table[ixx, iyy]
        # batched table: gather along the last two axes
        flat = table.reshape(table.shape[:-2] + (-1,))
        lin = ixx * table.shape[-1] + iyy
        lin_b = jnp.broadcast_to(lin[..., None], flat.shape[:-1] + (1,)) if lin.ndim else lin
        if lin.ndim:
            return jnp.take_along_axis(flat, lin_b, axis=-1).squeeze(-1)
        return flat[..., lin]

    f00 = gather(ix, iy)
    f01 = gather(ix, iy + 1)
    f10 = gather(ix + 1, iy)
    f11 = gather(ix + 1, iy + 1)
    return (
        f00 * (1 - tx) * (1 - ty)
        + f10 * tx * (1 - ty)
        + f01 * (1 - tx) * ty
        + f11 * tx * ty
    )
