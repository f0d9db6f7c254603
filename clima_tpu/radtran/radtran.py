"""The Radtran facade: IR + solar radiative transfer on a fixed column grid.

Mirrors the public surface of the reference ``Radtran`` class
(``src/radtran/clima_radtran.f90:31-91`` and the Cython wrapper
``clima/cython/Radtran.pyx``): constructors from settings.yaml, ``radiate``,
``TOA_fluxes``, bolometric-flux helpers, custom optical properties, and the
``wrk_ir``/``wrk_sol`` result views.

TPU-native design: all compute is one jitted program per (solar on/off,
opacity on/off, custom on/off) combination; the opacity tables enter as
compile-time constants; results are cached on device and materialized to
numpy lazily through ClimaRadtranWrk properties.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as const
from ..config import load_settings
from ..physics import eqns
from ..utils.errors import ClimaException
from . import data as data_mod
from .opacity import compute_opacity
from .radiate import radiate_ir, radiate_solar, integrate_fluxes

__all__ = ["Radtran", "ClimaRadtranWrk", "RTChannelView"]


class ClimaRadtranWrk:
    """Result container (reference ClimaRadtranWrk, clima_radtran.f90:11-25).

    Arrays are ground-up: index 0 of the edge axis is the surface.
    """

    def __init__(self, nz, nw):
        self._fup_a = jnp.zeros((nz + 1, nw))
        self._fdn_a = jnp.zeros((nz + 1, nw))
        self._fup_n = jnp.zeros(nz + 1)
        self._fdn_n = jnp.zeros(nz + 1)
        self._amean = jnp.zeros((nz + 1, nw))
        self._tau_band = jnp.zeros((nz, nw))

    @property
    def fup_a(self):
        return np.asarray(self._fup_a)

    @property
    def fdn_a(self):
        return np.asarray(self._fdn_a)

    @property
    def fup_n(self):
        return np.asarray(self._fup_n)

    @property
    def fdn_n(self):
        return np.asarray(self._fdn_n)

    @property
    def amean(self):
        return np.asarray(self._amean)

    @property
    def tau_band(self):
        return np.asarray(self._tau_band)


class RTChannelView:
    """Wavelength-channel metadata view (reference RTChannel)."""

    def __init__(self, info):
        self._info = info

    @property
    def wavl(self):
        return np.asarray(self._info.wavl)

    @property
    def freq(self):
        return np.asarray(self._info.freq)

    @property
    def nw(self):
        return self._info.nw


class Radtran:
    """IR and solar radiative transfer (reference Radtran facade)."""

    def __init__(self, species_names, particle_names, settings, star_f,
                 num_zenith_angles, surface_albedo, nz, datadir):
        """Equivalent of create_Radtran_2 (clima_radtran.f90:128-219).

        ``settings`` may be a ClimaSettings object or a settings.yaml path.
        """
        if isinstance(settings, str):
            s = load_settings(settings)
        else:
            s = settings

        if nz < 1:
            raise ClimaException('"nz" can not be less than 1.')
        self.ng = len(species_names)
        self.species_names = list(species_names)
        self.np = len(particle_names)
        self.particle_names = list(particle_names)
        self.nz = nz

        ang, w = eqns.zenith_angles_and_weights(num_zenith_angles)
        self.zenith_u = np.cos(ang * np.pi / 180.0)
        self.zenith_weights = w

        if s.op is None:
            raise ClimaException(
                f'"{s.filename}/optical-properties" does not contain opacity information.'
            )
        self.op = data_mod.load_optical_data(datadir, species_names, particle_names, s.op)
        self.ir = data_mod.load_channel(datadir, "ir", s.wavelength_bins_file, self.op)
        self.sol = data_mod.load_channel(datadir, "solar", s.wavelength_bins_file, self.op)

        self.surface_albedo = np.full(self.sol.nw, surface_albedo, dtype=np.float64)
        self.surface_emissivity = np.ones(self.ir.nw, dtype=np.float64)
        self.has_hard_surface = True
        self.ir_tau_min = 1.0e-6
        self.diurnal_fac = 0.5
        self.photon_scale_factor = (
            s.photon_scale_factor if s.planet_is_present else 1.0
        )
        self.photons_sol = data_mod.read_stellar_flux(star_f, self.sol.wavl)

        self.wrk_ir = ClimaRadtranWrk(nz, self.ir.nw)
        self.wrk_sol = ClimaRadtranWrk(nz, self.sol.nw)
        self.f_total = np.zeros(nz + 1)

        self._custom = None
        self._opr = None  # last computed opacity (device dict)
        self._build_jit()

    @classmethod
    def from_settings(cls, settings_f, star_f, num_zenith_angles, surface_albedo, nz, datadir):
        """Equivalent of create_Radtran_1 (clima_radtran.f90:98-126)."""
        s = load_settings(settings_f)
        if s.gases is None:
            raise ClimaException(
                f'"{settings_f}/optical-properties/gases" does not exist'
            )
        particles = s.particles or []
        return cls(s.gases, particles, s, star_f, num_zenith_angles, surface_albedo, nz, datadir)

    # ------------------------------------------------------------------
    # jitted cores
    # ------------------------------------------------------------------

    def _build_jit(self):
        op = self.op
        ir_slice = (self.ir.ind_start, self.ir.ind_end)
        sol_slice = (self.sol.ind_start, self.sol.ind_end)
        freq_master = jnp.asarray(op.freq)
        wavl_master = jnp.asarray(op.wavl)
        wbin = jnp.asarray(op.kset.wbin)

        @functools.partial(jax.jit, static_argnames=("has_particles", "has_custom"))
        def opacity_fn(P, T, densities, dz, pdensities, radii, custom,
                       has_particles, has_custom):
            return compute_opacity(
                op, P, T, densities, dz,
                pdensities if has_particles else None,
                radii if has_particles else None,
                custom if has_custom else None,
            )

        @functools.partial(
            jax.jit, static_argnames=("has_hard_surface", "ir_tau_min")
        )
        def ir_fn(opr, emissivity, T_surface, T, has_hard_surface, ir_tau_min):
            res = radiate_ir(
                ir_slice, freq_master, wbin, opr, emissivity,
                has_hard_surface, ir_tau_min, T_surface, T,
            )
            fup_n, fdn_n = integrate_fluxes(
                res["fup_a"], res["fdn_a"], freq_master[ir_slice[0] : ir_slice[1] + 2]
            )
            res["fup_n"] = fup_n
            res["fdn_n"] = fdn_n
            return res

        @jax.jit
        def sol_fn(opr, albedo, photons_scaled, diurnal_fac, zenith_u, zenith_weights):
            res = radiate_solar(
                sol_slice, freq_master, wavl_master, wbin, opr, albedo,
                diurnal_fac, photons_scaled, zenith_u, zenith_weights,
            )
            fup_n, fdn_n = integrate_fluxes(
                res["fup_a"], res["fdn_a"], freq_master[sol_slice[0] : sol_slice[1] + 2]
            )
            res["fup_n"] = fup_n
            res["fdn_n"] = fdn_n
            return res

        self._opacity_fn = opacity_fn
        self._ir_fn = ir_fn
        self._sol_fn = sol_fn

    # ------------------------------------------------------------------
    # main entry points
    # ------------------------------------------------------------------

    def _check_inputs(self, T, P, densities, dz, pdensities, radii):
        nz, ng, np_ = self.nz, self.ng, self.np
        if (pdensities is None) != (radii is None):
            raise ClimaException("Both pdensities and radii must be arguments.")
        if np_ > 0 and radii is None:
            raise ClimaException(
                'The model contains particles but "pdensities" and "radii" are not arguments.'
            )
        if np.shape(T) != (nz,):
            raise ClimaException('"T" has the wrong input dimension.')
        if np.shape(P) != (nz,):
            raise ClimaException('"P" has the wrong input dimension.')
        if np.shape(densities) != (nz, ng):
            raise ClimaException('"densities" has the wrong input dimension.')
        if np.shape(dz) != (nz,):
            raise ClimaException('"dz" has the wrong input dimension.')
        if radii is not None:
            if np.shape(pdensities) != (nz, np_):
                raise ClimaException('"pdensities" has the wrong input dimension.')
            if np.shape(radii) != (nz, np_):
                raise ClimaException('"radii" has the wrong input dimension.')

    def radiate(self, T_surface, T, P, densities, dz, pdensities=None, radii=None,
                compute_solar=True, compute_opacity=True):
        """Full RT evaluation (Radtran_radiate, clima_radtran.f90:221-318).

        Inputs are ground-up: T (nz,), P (nz,) bars, densities (nz, ng)
        molecules/cm^3, dz (nz,) cm. Results are stored on wrk_ir / wrk_sol /
        f_total, ground-up.
        """
        self._check_inputs(T, P, densities, dz, pdensities, radii)
        has_particles = radii is not None and self.np > 0
        has_custom = self._custom is not None

        if compute_opacity or self._opr is None:
            self._opr = self._opacity_fn(
                jnp.asarray(P), jnp.asarray(T), jnp.asarray(densities), jnp.asarray(dz),
                jnp.asarray(pdensities) if has_particles else jnp.zeros((self.nz, max(self.np, 1))),
                jnp.asarray(radii) if has_particles else jnp.ones((self.nz, max(self.np, 1))),
                self._custom if has_custom else {
                    "log10P": jnp.zeros(2), "dtau_dz": jnp.zeros((2, self.op.nw)),
                    "w0": jnp.zeros((2, self.op.nw)), "g0": jnp.zeros((2, self.op.nw))},
                has_particles, has_custom,
            )

        ir_res = self._ir_fn(
            self._opr, jnp.asarray(self.surface_emissivity), jnp.asarray(T_surface),
            jnp.asarray(T), self.has_hard_surface, self.ir_tau_min,
        )
        w = self.wrk_ir
        w._fup_a, w._fdn_a = ir_res["fup_a"], ir_res["fdn_a"]
        w._fup_n, w._fdn_n = ir_res["fup_n"], ir_res["fdn_n"]
        w._tau_band = ir_res["tau_band"]

        if compute_solar:
            sol_res = self._sol_fn(
                self._opr, jnp.asarray(self.surface_albedo),
                jnp.asarray(self.photons_sol * self.photon_scale_factor),
                self.diurnal_fac, jnp.asarray(self.zenith_u),
                jnp.asarray(self.zenith_weights),
            )
            w = self.wrk_sol
            w._fup_a, w._fdn_a = sol_res["fup_a"], sol_res["fdn_a"]
            w._fup_n, w._fdn_n = sol_res["fup_n"], sol_res["fdn_n"]
            w._amean = sol_res["amean"]
            w._tau_band = sol_res["tau_band"]

        self.f_total = np.asarray(
            (self.wrk_sol._fdn_n - self.wrk_sol._fup_n)
            + (self.wrk_ir._fdn_n - self.wrk_ir._fup_n)
        )

    def TOA_fluxes(self, T_surface, T, P, densities, dz, pdensities=None, radii=None,
                   compute_solar=True, compute_opacity=True):
        """Returns (ISR, OLR) in mW/m^2 (clima_radtran.f90:320-342)."""
        self.radiate(T_surface, T, P, densities, dz, pdensities, radii,
                     compute_solar, compute_opacity)
        ISR = float(self.wrk_sol._fdn_n[self.nz] - self.wrk_sol._fup_n[self.nz])
        OLR = -float(self.wrk_ir._fdn_n[self.nz] - self.wrk_ir._fup_n[self.nz])
        return ISR, OLR

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def bolometric_flux(self):
        """Bolometric stellar flux at the planet, W/m^2 (clima_radtran.f90:353-364)."""
        dfreq = self.sol.freq[:-1] - self.sol.freq[1:]
        return float(np.sum(self.photons_sol * dfreq) * self.photon_scale_factor / 1.0e3)

    def set_bolometric_flux(self, flux):
        self.photon_scale_factor = 1.0
        self.photon_scale_factor = flux / self.bolometric_flux()

    def skin_temperature(self, bond_albedo):
        return float(eqns.skin_temperature(self.bolometric_flux(), bond_albedo))

    def equilibrium_temperature(self, bond_albedo):
        return float(eqns.equilibrium_temperature(self.bolometric_flux(), bond_albedo))

    def apply_radiation_enhancement(self, rad_enhancement):
        """Scale solar fluxes (tidally-locked dayside, clima_radtran.f90:402-411)."""
        w = self.wrk_sol
        w._fdn_n = w._fdn_n * rad_enhancement
        w._fdn_a = w._fdn_a * rad_enhancement
        w._fup_n = w._fup_n * rad_enhancement
        w._fup_a = w._fup_a * rad_enhancement
        self.f_total = np.asarray(
            (w._fdn_n - w._fup_n) + (self.wrk_ir._fdn_n - self.wrk_ir._fup_n)
        )

    def opacities2yaml(self):
        return "optical-properties:\n" + self.op.opacities2yaml()

    def set_custom_optical_properties(self, wv, P, dtau_dz, w0, g0):
        """Inject custom opacity (clima_radtran.f90:493-506, types.f90:429-533).

        wv (nwv,) nm; P (nP,) dynes/cm^2 decreasing; dtau_dz/w0/g0 (nP, nwv).
        """
        wv = np.asarray(wv, dtype=np.float64)
        P = np.asarray(P, dtype=np.float64)
        dtau_dz = np.asarray(dtau_dz, dtype=np.float64)
        w0 = np.asarray(w0, dtype=np.float64)
        g0 = np.asarray(g0, dtype=np.float64)
        if np.any(wv <= 0):
            raise ClimaException("All elements of `wv` must be larger than zero")
        if np.any(P <= 0):
            raise ClimaException("All elements of `P` must be larger than zero")
        for arr, name in ((dtau_dz, "dtau_dz"), (w0, "w0"), (g0, "g0")):
            if arr.shape != (len(P), len(wv)):
                raise ClimaException(f"`P`/`wv` and `{name}` have incompatible shapes")
        wv1 = 0.5 * (self.op.wavl[1:] + self.op.wavl[:-1])  # median wavelengths

        def regrid(arr):
            out = np.zeros((len(P), self.op.nw))
            for i in range(len(P)):
                out[i] = np.interp(wv1, wv, arr[i])
            return out[::-1]  # ascending log10P ordering

        self._custom = {
            "log10P": jnp.asarray(np.log10(P)[::-1].copy()),
            "dtau_dz": jnp.asarray(regrid(dtau_dz)),
            "w0": jnp.asarray(regrid(w0)),
            "g0": jnp.asarray(regrid(g0)),
        }
        self._opr = None

    def unset_custom_optical_properties(self):
        self._custom = None
        self._opr = None
