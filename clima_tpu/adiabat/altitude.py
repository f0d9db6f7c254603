"""Hydrostatic altitude solve on the doubled edge grid.

Re-implements ``AdiabatClimate_compute_altitude``
(``src/adiabat/clima_adiabat_altitude.f90:16-179``): z(P) by integrating
dz/dP = -Rgas T / (g(z) P mubar) with T(log10P) and mubar(log10P) linear
interpolators, on the 2*nz+1 edge grid (edges are geometric means of the
center pressures), with optional ``reference_pressure`` anchoring of the
planet radius. dop853 is replaced by fixed RK4 substeps per interval under
``lax.scan`` — grid intervals are ~0.035 dex so accuracy is ample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as const
from ..ops.interp import searchsorted_right

__all__ = ["compute_altitude_core"]


def _interp1(xs, ys, x):
    idx = searchsorted_right(xs, x)
    t = (x - xs[idx]) / (xs[idx + 1] - xs[idx])
    return ys[idx] + t * (ys[idx + 1] - ys[idx])


def compute_altitude_core(P, T, mubar, P_surf, T_surf, mubar_surf, P_top,
                          planet_mass, planet_radius, reference_pressure=-1.0,
                          substeps=4):
    """Compute edge altitudes and per-layer z/dz/gravity.

    P/T/mubar: (nz,) layer centers (ground-up). Returns dict with z (nz,),
    dz (nz,), gravity (nz,), gravity_surf, z_e (2nz+1,).
    """
    nz = P.shape[0]
    ne = 2 * nz + 1

    # edge grid (altitude.f90:45-50)
    P_e = jnp.zeros(ne, dtype=P.dtype)
    P_e = P_e.at[0].set(P_surf)
    P_e = P_e.at[1::2].set(P)
    P_e = P_e.at[2:-1:2].set(jnp.sqrt(P[:-1] * P[1:]))
    P_e = P_e.at[-1].set(P_top)

    # interpolators on ascending log10P (altitude.f90:57-87)
    logP_grid = jnp.log10(jnp.concatenate([P[::-1], jnp.atleast_1d(P_surf)]))
    T_grid = jnp.concatenate([T[::-1], jnp.atleast_1d(T_surf)])
    mu_grid = jnp.concatenate([mubar[::-1], jnp.atleast_1d(mubar_surf)])

    def make_rhs(z_offset):
        def rhs(Pv, z):
            Tv = _interp1(logP_grid, T_grid, jnp.log10(Pv))
            muv = _interp1(logP_grid, mu_grid, jnp.log10(Pv))
            grav = (
                const.G_grav * (planet_mass / 1.0e3)
                / ((planet_radius + z - z_offset) / 1.0e2) ** 2
                * 1.0e2
            )
            return -(const.Rgas * Tv) / (grav * Pv * muv)

        return rhs

    rhs = make_rhs(jnp.asarray(0.0, P.dtype))

    def rk4_interval(z, Pa, Pb):
        K = substeps
        la, lb = jnp.log(Pa), jnp.log(Pb)

        def sub(z, k):
            p0 = jnp.exp(la + (lb - la) * k / K)
            p1 = jnp.exp(la + (lb - la) * (k + 1) / K)
            h = p1 - p0
            k1 = rhs(p0, z)
            k2 = rhs(p0 + 0.5 * h, z + 0.5 * h * k1)
            k3 = rhs(p0 + 0.5 * h, z + 0.5 * h * k2)
            k4 = rhs(p1, z + h * k3)
            return z + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

        z, _ = jax.lax.scan(sub, z, jnp.arange(K))
        return z

    def integrate_segment(z0, edges_pairs):
        """Scan z across consecutive edge intervals; returns z at each end edge."""

        def step(z, pair):
            za = rk4_interval(z, pair[0], pair[1])
            return za, za

        _, zs = jax.lax.scan(step, z0, edges_pairs)
        return zs

    def surface_anchored(rhs_fn):
        # integrate edges 1..ne-2 from the surface; extrapolate the last edge
        # (altitude.f90:180-193: the T interpolator does not cover P_top)
        nonlocal rhs
        rhs = rhs_fn
        pairs = jnp.stack([P_e[: ne - 2], P_e[1 : ne - 1]], axis=1)
        zs = integrate_segment(jnp.asarray(0.0, P.dtype), pairs)
        z_e = jnp.concatenate([jnp.zeros(1, P.dtype), zs])
        z_last = z_e[ne - 2] + (z_e[ne - 2] - z_e[ne - 3])
        z_e = jnp.concatenate([z_e, z_last[None]])
        return z_e

    if reference_pressure is not None and reference_pressure > 0:
        # Anchor the planet radius at reference_pressure (altitude.f90:97-169):
        # gravity must be evaluated with radius defined at z(Pref). Solve the
        # weakly-coupled fixed point by Picard iteration: integrate with the
        # current anchor estimate, relocate z(Pref), repeat. Two iterations
        # reduce the error to O((z/R)^3) — far below integration error.
        Pref = jnp.asarray(reference_pressure, P.dtype)
        zref = jnp.asarray(0.0, P.dtype)
        for _ in range(2):
            z_e = surface_anchored(make_rhs(zref))
            logPe_asc = jnp.log10(P_e[: ne - 1])[::-1]
            zref = _interp1(logPe_asc, z_e[: ne - 1][::-1], jnp.log10(Pref))
        z_ref_for_radius = zref
    else:
        z_e = surface_anchored(make_rhs(jnp.asarray(0.0, P.dtype)))
        z_ref_for_radius = jnp.asarray(0.0, P.dtype)

    z = z_e[1::2]
    dz = z_e[2::2] - z_e[0:-1:2]

    def grav_at(zv):
        return (
            const.G_grav * (planet_mass / 1.0e3)
            / ((planet_radius + zv - z_ref_for_radius) / 1.0e2) ** 2
            * 1.0e2
        )

    gravity = grav_at(z)
    gravity_surf = grav_at(jnp.asarray(0.0, P.dtype))

    return dict(z=z, dz=dz, gravity=gravity, gravity_surf=gravity_surf, z_e=z_e)
