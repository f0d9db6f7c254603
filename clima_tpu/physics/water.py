"""Hard-coded H2O latent heat and saturation vapor pressure fits.

Reference: ``src/clima_eqns_water.f90`` (exp-fit latent heats, SVP via the
Clausius-Clapeyron integral using the exponential-integral function Ei).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import expi

__all__ = [
    "latent_heat_H2O",
    "latent_heat_H2O_vap",
    "latent_heat_H2O_sub",
    "sat_pressure_H2O",
    "sat_pressure_H2O_vap",
    "sat_pressure_H2O_sub",
    "T_freeze",
    "mu_H2O",
    "Rgas",
]

Rgas = 8.31446261815324e7  # erg/(mol*K)
mu_H2O = 18.01534  # g/mol

A_v = -3413485157036.1396
B_v = 4.093669788667096e-06
C_v = 3441894705040.859

A_s = -208246976589.85126
B_s = -2.0162205697439128e-05
C_s = 235714178130.73007

T0 = 373.15  # K
P0 = 1.0142e6  # dynes/cm2
T_freeze = 273.15  # K

# constants precomputed in the reference (clima_eqns_water.f90:76,87-88)
_I_v_T0 = -20369368.110596914
_I_v_Tfreeze = 3141290.0653794562
_I_s_Tfreeze = 124184300.01342696


def latent_heat_H2O_vap(T):
    """Latent heat of vaporization, erg/g."""
    return A_v * jnp.exp(B_v * T) + C_v


def latent_heat_H2O_sub(T):
    """Latent heat of sublimation, erg/g."""
    return A_s * jnp.exp(B_s * T) + C_s


def latent_heat_H2O(T):
    T = jnp.asarray(T)
    return jnp.where(T > T_freeze, latent_heat_H2O_vap(T), latent_heat_H2O_sub(T))


def _integral_fcn(A, B, C, T):
    """The integral of L/T^2 dT (clima_eqns_water.f90:63-68)."""
    return (-A * B * T * expi(B * T) + A * jnp.exp(B * T) + C) / T


def sat_pressure_H2O_vap(T):
    """SVP over liquid water, dynes/cm^2."""
    tmp = _integral_fcn(A_v, B_v, C_v, T) - _I_v_T0
    return P0 * jnp.exp((mu_H2O / Rgas) * (-tmp))


def sat_pressure_H2O_sub(T):
    """SVP over ice, dynes/cm^2."""
    tmp = (_I_v_Tfreeze - _I_v_T0) + (_integral_fcn(A_s, B_s, C_s, T) - _I_s_Tfreeze)
    return P0 * jnp.exp((mu_H2O / Rgas) * (-tmp))


def sat_pressure_H2O(T):
    T = jnp.asarray(T)
    return jnp.where(T > T_freeze, sat_pressure_H2O_vap(T), sat_pressure_H2O_sub(T))
