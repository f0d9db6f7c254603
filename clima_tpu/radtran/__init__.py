from .radtran import Radtran, ClimaRadtranWrk, RTChannelView
from .data import OpticalData, load_optical_data, load_channel, read_stellar_flux
from .opacity import compute_opacity

__all__ = [
    "Radtran",
    "ClimaRadtranWrk",
    "RTChannelView",
    "OpticalData",
    "load_optical_data",
    "load_channel",
    "read_stellar_flux",
    "compute_opacity",
]
