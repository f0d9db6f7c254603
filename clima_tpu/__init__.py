"""clima_tpu: a TPU-native (JAX/XLA/Pallas) column climate framework.

A from-scratch rebuild of the capabilities of Nicholaswogan/clima (1-D
radiative transfer + planetary climate modeling): correlated-k two-stream
radiative transfer, multispecies moist pseudoadiabats, surface-temperature
and full radiative-convective-equilibrium solvers — redesigned around
XLA compilation, vmap column batching, and jax.sharding multi-chip scaling.
"""

from .utils.errors import ClimaException
from .radtran import Radtran, ClimaRadtranWrk
from .adiabat import (
    AdiabatClimate,
    RCE_SOLVE_HYBRJ_ONLY,
    RCE_SOLVE_PTC_THEN_HYBRJ,
    RCE_SOLVE_HYBRJ_THEN_PTC_THEN_HYBRJ,
)
from .ops.rebin import rebin, rebin_with_errors

__version__ = "0.1.0"

__all__ = [
    "ClimaException",
    "Radtran",
    "ClimaRadtranWrk",
    "AdiabatClimate",
    "RCE_SOLVE_HYBRJ_ONLY",
    "RCE_SOLVE_PTC_THEN_HYBRJ",
    "RCE_SOLVE_HYBRJ_THEN_PTC_THEN_HYBRJ",
    "rebin",
    "rebin_with_errors",
]
