"""LinearLatentHeat condensation model, vectorized over gases.

Reference: ``src/clima_saturationdata.f90``. A species' latent heat is linear
in T in three regimes (sublimation below the triple point, vaporization up to
the critical point, a non-physical super-critical continuation above) and the
SVP follows from the analytic Clausius-Clapeyron integral
``P_ref * exp((mu/Rgas) * (-A/T + B lnT - ...))`` (:93-167).

Where the reference uses dual-number forward AD (differentia) for
``sat_pressure_derivative`` (:170-184), we use ``jax.grad``.

The class stores parameter arrays over ALL gases; non-condensible gases get
``has_sat=False`` and an SVP of +huge so the dry/condensing classification
logic can run unmasked and vectorized.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as const

__all__ = ["SaturationParams", "sat_pressure", "latent_heat", "sat_pressure_derivative"]

BIG = 1.0e30  # stand-in for huge(1.0_dp): SVP of non-condensibles (finite in f32)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SaturationParams:
    """Per-gas LinearLatentHeat parameters, arrays of shape (ng,)."""

    has_sat: jnp.ndarray  # bool
    mu: jnp.ndarray
    T_ref: jnp.ndarray
    P_ref: jnp.ndarray
    T_triple: jnp.ndarray
    T_critical: jnp.ndarray
    a_v: jnp.ndarray
    b_v: jnp.ndarray
    a_s: jnp.ndarray
    b_s: jnp.ndarray
    a_c: jnp.ndarray
    b_c: jnp.ndarray

    def tree_flatten(self):
        fields = dataclasses.fields(self)
        return tuple(getattr(self, f.name) for f in fields), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_gas_list(cls, sats):
        """Build from a list of per-gas dicts (or None for non-condensibles)."""
        ng = len(sats)

        def arr(key, default):
            return np.array(
                [s[key] if s is not None else default for s in sats], dtype=np.float64
            )

        return cls(
            has_sat=np.array([s is not None for s in sats]),
            mu=arr("mu", 1.0),
            T_ref=arr("T_ref", 300.0),
            P_ref=arr("P_ref", 1.0e6),
            T_triple=arr("T_triple", 100.0),
            T_critical=arr("T_critical", 600.0),
            a_v=arr("a_v", 1.0e10),
            b_v=arr("b_v", 0.0),
            a_s=arr("a_s", 1.0e10),
            b_s=arr("b_s", 0.0),
            a_c=arr("a_c", 1.0e10),
            b_c=arr("b_c", 0.0),
        )


def _integral(A, B, T):
    """integral of L/T^2 dT with L = A + B*T (clima_saturationdata.f90:157-167)."""
    return -A / T + B * jnp.log(T)


def latent_heat(p: SaturationParams, T, T_branch=None):
    """Latent heat erg/g across the three regimes (:80-91). T broadcastable vs (ng,).

    ``T_branch`` (optional) selects the regime instead of T itself: the
    profile integrator pins a whole RK substep piece to one branch so its
    stage evaluations never straddle the latent-heat JUMP at T_triple
    (L_sub - L_vap = latent heat of fusion) — the piece extrapolates its own
    branch smoothly and the kink is handled by splitting the step there.
    """
    Tb = T if T_branch is None else T_branch
    L_crit = p.a_c + p.b_c * T
    L_vap = p.a_v + p.b_v * T
    L_sub = p.a_s + p.b_s * T
    return jnp.where(
        Tb >= p.T_critical, L_crit, jnp.where(Tb > p.T_triple, L_vap, L_sub)
    )


def sat_pressure(p: SaturationParams, T, T_branch=None):
    """Saturation pressure (dynes/cm^2) of each gas at T (:93-155).

    Non-condensible gases return BIG. T broadcastable against (ng,).
    ``T_branch`` pins the regime choice (see :func:`latent_heat`); the SVP is
    continuous across regime boundaries but only C0, so pinning keeps a
    branch-split RK substep piece analytic.
    """
    Tb = T if T_branch is None else T_branch
    tmp_vap = _integral(p.a_v, p.b_v, T) - _integral(p.a_v, p.b_v, p.T_ref)
    tmp_sub = (
        _integral(p.a_v, p.b_v, p.T_triple)
        - _integral(p.a_v, p.b_v, p.T_ref)
        + _integral(p.a_s, p.b_s, T)
        - _integral(p.a_s, p.b_s, p.T_triple)
    )
    tmp_crit = (
        _integral(p.a_v, p.b_v, p.T_critical)
        - _integral(p.a_v, p.b_v, p.T_ref)
        + _integral(p.a_c, p.b_c, T)
        - _integral(p.a_c, p.b_c, p.T_critical)
    )
    tmp = jnp.where(Tb >= p.T_critical, tmp_crit, jnp.where(Tb > p.T_triple, tmp_vap, tmp_sub))
    psat = p.P_ref * jnp.exp((p.mu / const.Rgas) * tmp)
    return jnp.where(p.has_sat, psat, BIG)


def sat_pressure_derivative(p: SaturationParams, T):
    """dP_sat/dT via jax.grad (replaces differentia dual numbers, :170-184)."""
    T = jnp.asarray(T, dtype=jnp.result_type(float))

    def scalar_sat(t):
        return sat_pressure(p, t)

    # jacfwd over broadcasted T: use jvp with unit tangent
    _, dPdT = jax.jvp(scalar_sat, (T,), (jnp.ones_like(T),))
    return dPdT
