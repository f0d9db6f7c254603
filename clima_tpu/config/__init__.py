from .species import Species, GasThermo, heat_capacity, load_species
from .settings import ClimaSettings, SettingsOpacity, load_settings
from .atmosphere_file import AtmosphereFile, unpack_atmospherefile

__all__ = [
    "Species",
    "GasThermo",
    "heat_capacity",
    "load_species",
    "ClimaSettings",
    "SettingsOpacity",
    "load_settings",
    "AtmosphereFile",
    "unpack_atmospherefile",
]
