"""Dry prescribed-profile construction (``src/adiabat/clima_adiabat_dry.f90``).

User supplies P/T/mixing-ratio columns; we interpolate them onto the internal
2*nz+1 log-P grid and integrate only the hydrostatic altitude. The recorded
``lapse_rate`` is the local dry adiabat R/cp (dry.f90:275-308).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as const
from ..config.species import heat_capacity
from ..ops.interp import searchsorted_right, pdot
from .profile import AdiabatParams

__all__ = ["make_profile_dry_core"]


def _interp1(xs, ys, x):
    idx = searchsorted_right(xs, x)
    t = (x - xs[idx]) / (xs[idx + 1] - xs[idx])
    return ys[idx] + t * (ys[idx + 1] - ys[idx])


def make_profile_dry_core(par: AdiabatParams, P_in, T_in, f_i_in):
    """Build the dry profile. P_in (npts,) decreasing (surface first), T_in
    (npts,), f_i_in (npts, ng). Returns dict of edge arrays."""
    ng = par.gas_masses.shape[0]
    ne = 2 * par.nz + 1

    # normalize mixing ratios (dry.f90:117-121)
    f_norm = f_i_in / jnp.sum(f_i_in, axis=1, keepdims=True)

    P_surf = P_in[0]
    logP = jnp.linspace(jnp.log10(P_surf), jnp.log10(par.P_top), ne)
    P_e = 10.0**logP
    P_e = P_e.at[0].set(P_surf)
    P_e = P_e.at[-1].set(par.P_top)

    lg_in = jnp.log10(P_in)[::-1]  # ascending
    T_grid = T_in[::-1]
    lf_grid = jnp.log10(jnp.maximum(f_norm, 1e-200))[::-1]  # (npts, ng)

    lgP_e = jnp.log10(P_e)
    T_e = _interp1(lg_in, T_grid, lgP_e)
    f_i_e = jax.vmap(lambda col: _interp1(lg_in, col, lgP_e), in_axes=1, out_axes=1)(
        lf_grid
    )
    f_i_e = 10.0**f_i_e  # (ne, ng)

    mubar_e = pdot(f_i_e, par.gas_masses)

    # dry adiabat lapse rate R/cp at each level (dry.f90:275-308)
    cp_i = jax.vmap(lambda T: heat_capacity(par.thermo, T))(T_e)  # (ne, ng)
    cp = jnp.sum(cp_i * f_i_e, axis=1)
    lapse_rate_e = const.Rgas_si / cp

    # hydrostatic z
    def rk4_interval(z, pair):
        Pa, Pb = pair
        K = par.substeps
        la, lb = jnp.log(Pa), jnp.log(Pb)

        def rhs(Pv, zv):
            Tv = _interp1(lg_in, T_grid, jnp.log10(Pv))
            fv = jax.vmap(lambda col: _interp1(lg_in, col, jnp.log10(Pv)), in_axes=1)(
                lf_grid
            )
            muv = jnp.sum(10.0**fv * par.gas_masses)
            grav = (
                const.G_grav * (par.planet_mass / 1.0e3)
                / ((par.planet_radius + zv) / 1.0e2) ** 2
                * 1.0e2
            )
            return -(const.Rgas * Tv) / (grav * Pv * muv)

        def sub(zv, k):
            p0 = jnp.exp(la + (lb - la) * k / K)
            p1 = jnp.exp(la + (lb - la) * (k + 1) / K)
            h = p1 - p0
            k1 = rhs(p0, zv)
            k2 = rhs(p0 + 0.5 * h, zv + 0.5 * h * k1)
            k3 = rhs(p0 + 0.5 * h, zv + 0.5 * h * k2)
            k4 = rhs(p1, zv + h * k3)
            return zv + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

        z, _ = jax.lax.scan(sub, z, jnp.arange(K))
        return z, z

    _, z_rest = jax.lax.scan(
        rk4_interval, jnp.asarray(0.0, P_e.dtype), (P_e[:-1], P_e[1:])
    )
    z_e = jnp.concatenate([jnp.zeros(1, P_e.dtype), z_rest])

    return dict(P_e=P_e, T_e=T_e, z_e=z_e, f_i_e=f_i_e, lapse_rate_e=lapse_rate_e)
