"""Time-stepping RCE model (reference ``src/climate/clima_climate*.f90``).

Experimental in the reference (src/clima.f90:18-19) and here: fixed-altitude
uniform grid, fixed composition from an atmosphere.txt file, RHS = radiative
flux divergence + mixing-length convective diffusion, integrated with an
adaptive dopri-class method, streaming snapshots at requested times.

The reference streams Fortran-unformatted binary records
(clima_climate_integrate.f90:81-99); we write an ``.npz`` stream with the
same fields (documented format difference) and provide ``load_evolve_file``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants as const
from ..config import load_species, load_settings, AtmosphereFile, unpack_atmospherefile
from ..config.species import heat_capacity
from ..physics import eqns
from ..radtran import Radtran
from ..utils.errors import ClimaException

__all__ = ["Climate", "load_evolve_file"]

# ground slab properties (clima_climate_rhs.f90:27-29)
CP_GROUND = 4.182e7  # H2O, erg/(g*K)
RHO_GROUND = 1.0  # g/cm3
DZ_GROUND = 500.0  # cm


class Climate:
    def __init__(self, species_file, settings_file, flux_file, atmosphere_file, data_dir):
        s = load_settings(settings_file)
        if not s.atmos_grid_is_present or s.bottom is None or s.top is None:
            raise ClimaException(
                f'"{settings_file}/atmosphere-grid" needs bottom/top/number-of-layers.'
            )
        if not s.planet_is_present or s.P_surf is None:
            raise ClimaException(
                f'"{settings_file}/planet" needs surface-pressure for Climate.'
            )
        self.sp = load_species(species_file)
        self.species_names = list(self.sp.gas_names)

        self.nz = s.nz
        self.double_radiative_grid = True
        self.nz_r = 2 * self.nz
        self.neq = self.nz + 1
        self.planet_mass = s.planet_mass
        self.planet_radius = s.planet_radius
        self.surface_pressure = s.P_surf  # bar

        self.rad = Radtran(
            self.species_names, [], s, flux_file,
            s.number_of_zenith_angles, s.surface_albedo, self.nz_r, data_dir,
        )

        self.z, self.dz = eqns.vertical_grid(s.bottom, s.top, self.nz)
        if self.double_radiative_grid:
            self.z_r = np.repeat(self.z, 2) + np.tile([-0.25, 0.25], self.nz) * np.repeat(
                self.dz, 2
            )
            self.dz_r = np.repeat(0.5 * self.dz, 2)
        else:
            self.z_r, self.dz_r = self.z, self.dz
        self.grav = np.asarray(
            eqns.gravity(self.planet_radius, self.planet_mass, jnp.asarray(self.z))
        )

        atm = AtmosphereFile(atmosphere_file)
        self.mix, T_init, _ = unpack_atmospherefile(atm, self.species_names, self.z)
        self.T_init = np.concatenate([[T_init[0]], T_init])
        self.mubar = self.mix @ self.sp.gas_masses

        self.rtol = 1.0e-4
        self.atol = 1.0e-6
        self.verbose = True

        self._P = None  # computed hydrostatically on first RHS call

    # ------------------------------------------------------------------

    def right_hand_side(self, T_in):
        """dT/dt in K/s for [T_ground, T(nz)] (clima_climate_rhs.f90:7-152)."""
        T_in = np.asarray(T_in, dtype=np.float64)
        T_surf = T_in[0]
        T = T_in[1:]

        if self._P is None:
            P, density = eqns.press_and_den(
                jnp.asarray(T), jnp.asarray(self.grav),
                self.surface_pressure * 1.0e6, jnp.asarray(self.dz),
                jnp.asarray(self.mubar),
            )
            self._P = np.asarray(P) / 1.0e6  # bar
            self._density = np.asarray(density)

        P, density = self._P, self._density
        densities = self.mix * density[:, None]
        rho = density * (1.0 / const.N_avo) * self.mubar

        # radiative transfer on the doubled grid
        rep = lambda a: np.repeat(a, 2, axis=0)
        self.rad.radiate(
            T_surf, rep(T), rep(P), rep(densities), self.dz_r,
        )
        f_total = self.rad.f_total

        cp_i = np.asarray(
            jnp.stack([heat_capacity(self.sp.thermo, t) for t in jnp.asarray(T)])
        )
        cp = np.sum(cp_i * self.mix, axis=1)
        cp = cp * (1.0 / (self.mubar * 1.0e-3)) * 1.0e4  # erg/(g*K)

        adiabat_lapse = self.grav / cp  # K/cm
        scale_height = (const.k_boltz * T * const.N_avo) / (self.mubar * self.grav)

        Fc_e, Fc_g = self._convection_diffusion(
            T, T_surf, cp, rho, adiabat_lapse, scale_height
        )

        if self.double_radiative_grid:
            dFdz = (f_total[2::2][: self.nz] - f_total[0:-2:2][: self.nz]) / self.dz
        else:
            dFdz = (f_total[1:] - f_total[:-1]) / self.dz

        dTdt = np.zeros(self.neq)
        inv_rhocp = 1.0 / (rho * cp)
        dTdt_l = inv_rhocp * dFdz
        # convective flux divergence
        dTdt_l[1:-1] -= inv_rhocp[1:-1] * (Fc_e[1:] - Fc_e[:-1]) / self.dz[1:-1]
        dTdt_l[0] -= inv_rhocp[0] * (Fc_e[0] - Fc_g) / self.dz[0]
        dTdt_l[-1] -= inv_rhocp[-1] * (0.0 - Fc_e[-1] / self.dz[-1])
        # ground slab (clima_climate_rhs.f90:144-146)
        dTdt[0] = (1.0 / (RHO_GROUND * CP_GROUND)) * f_total[0] / DZ_GROUND - (
            1.0 / (RHO_GROUND * CP_GROUND)
        ) * (Fc_g / DZ_GROUND)
        dTdt[1:] = dTdt_l
        return dTdt

    def _convection_diffusion(self, T, T_surf, cp, rho, adiabat_lapse, scale_height):
        """Mixing-length convective heat fluxes (clima_climate_rhs.f90:154-225)."""
        nz = self.nz
        free_mixing_length = scale_height
        vk = const.von_karman_const
        mixing_length = vk * self.z / (1.0 + vk * self.z / free_mixing_length)

        gm = lambda a, b: np.sqrt(a * b)
        rho_av = gm(rho[:-1], rho[1:])
        cp_av = gm(cp[:-1], cp[1:])
        grav_av = gm(self.grav[:-1], self.grav[1:])
        T_av = gm(T[:-1], T[1:])
        ad_av = gm(adiabat_lapse[:-1], adiabat_lapse[1:])
        ml_av = gm(mixing_length[:-1], mixing_length[1:])
        delta_z = 0.5 * (self.dz[:-1] + self.dz[1:])
        dTdz = (T[1:] - T[:-1]) / delta_z
        Kh = np.asarray(
            eqns.eddy_for_heat(
                jnp.asarray(ml_av), jnp.asarray(grav_av), jnp.asarray(T_av),
                jnp.asarray(dTdz), jnp.asarray(ad_av),
            )
        )
        Fc_e = -(rho_av * cp_av * Kh) * (dTdz + ad_av)

        # surface layer (ground to first atmospheric layer)
        rho_g = np.sqrt(RHO_GROUND * rho[0])
        cp_g = np.sqrt(CP_GROUND * cp[0])
        T_avg = np.sqrt(T_surf * T[0])
        delta_zg = 0.5 * DZ_GROUND + 0.5 * self.dz[0]
        dTdz_g = (T[0] - T_surf) / delta_zg
        Kh_g = float(
            eqns.eddy_for_heat(
                mixing_length[0], self.grav[0], T_avg, dTdz_g, adiabat_lapse[0]
            )
        )
        Fc_g = -(rho_g * cp_g * Kh_g) * (dTdz_g + adiabat_lapse[0])
        return Fc_e, Fc_g

    # ------------------------------------------------------------------

    def evolve(self, filename, tstart, T_start, t_eval, overwrite=False):
        """Integrate dT/dt, streaming snapshots at t_eval (integrate.f90:113-182)."""
        import os
        from scipy.integrate import solve_ivp

        T_start = np.asarray(T_start, dtype=np.float64)
        if T_start.shape != (self.neq,):
            raise ClimaException("Input to evolve has the wrong dimension")
        if not overwrite and os.path.exists(filename):
            raise ClimaException(
                f"Unable to create file {filename} because it already exists"
            )

        self._P = None
        nsteps = [0]

        def rhs(t, y):
            du = self.right_hand_side(y)
            nsteps[0] += 1
            if self.verbose and nsteps[0] % 50 == 0:
                print(
                    f" N = {nsteps[0]:6d}   Time = {t:11.5e}   max(dy/dt) = {np.max(np.abs(du)):11.5e}"
                )
            return du

        sol = solve_ivp(
            rhs, (tstart, t_eval[-1]), T_start, method="DOP853",
            t_eval=np.asarray(t_eval), rtol=self.rtol, atol=self.atol,
            dense_output=False,
        )

        snapshots = []
        for j, tj in enumerate(sol.t):
            Tj = sol.y[:, j]
            du = self.right_hand_side(Tj)  # refresh rad state at this snapshot
            take = lambda a: a[0::2][: self.nz + 1] if self.double_radiative_grid else a
            snapshots.append(
                dict(
                    t=tj,
                    T=Tj,
                    f_total=take(self.rad.f_total),
                    fup_ir=take(self.rad.wrk_ir.fup_n),
                    fdn_ir=take(self.rad.wrk_ir.fdn_n),
                    fup_sol=take(self.rad.wrk_sol.fup_n),
                    fdn_sol=take(self.rad.wrk_sol.fdn_n),
                    P=np.concatenate([[self.surface_pressure], self._P]),
                )
            )

        np.savez(
            filename,
            nz=self.nz,
            z=np.concatenate([[0.0], self.z]),
            nt=len(snapshots),
            t=np.array([s["t"] for s in snapshots]),
            **{
                key: np.stack([s[key] for s in snapshots])
                for key in ["T", "f_total", "fup_ir", "fdn_ir", "fup_sol", "fdn_sol", "P"]
            },
        )
        return sol.success


def load_evolve_file(filename):
    """Load an evolve() snapshot stream."""
    with np.load(filename) as d:
        return {k: d[k] for k in d.files}
