"""Time-stepping RCE model (reference ``src/climate/clima_climate*.f90``).

Experimental in the reference (src/clima.f90:18-19) and here: fixed-altitude
uniform grid, fixed composition from an atmosphere.txt file, RHS = radiative
flux divergence + mixing-length convective diffusion, integrated with an
adaptive dopri-class method, streaming snapshots at requested times.

Two integrators:
  - ``method="DOP853"`` (default): host-driven scipy DOP853, matching the
    reference's dop853 (clima_climate_integrate.f90:113-182). Best on CPU;
    on a remote accelerator every RHS evaluation pays a host<->device sync.
  - ``method="rk45_device"``: TPU-native path — the ENTIRE integration runs
    device-side in one jit (lax.scan over snapshot segments, lax.while_loop
    adaptive Dormand-Prince 5(4) stepping), and the snapshot radiative
    fields are computed with one batched (vmapped) radiate call. On CPU
    float64 the device RHS matches right_hand_side to ~1e-15 and the
    trajectories agree with DOP853 at the shared tolerance. In float32 (TPU
    default) the net heating rates carry a few percent of cancellation
    error, which accumulates over long transients — use float64 (CPU) when
    trajectory-accurate evolution is needed; the reference is f64 throughout.

The reference streams Fortran-unformatted binary records
(clima_climate_integrate.f90:81-99); we write an ``.npz`` stream with the
same fields (documented format difference) and provide ``load_evolve_file``.
"""

from __future__ import annotations

import numpy as np
import jax
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
    # device-side (TPU-native) path
    # ------------------------------------------------------------------

    def _build_device_fns(self, T_freeze=None):
        """Pure-jnp RHS + flux function closed over the frozen column state.

        Mirrors right_hand_side exactly; the hydrostatic pressure is frozen
        at the temperature of the FIRST RHS call — i.e. the integration's
        T_start, not T_init — matching the reference's first-call switch
        (clima_climate_rhs.f90:38-46). ``T_freeze`` is the full (neq,)
        starting state; defaults to T_init for standalone flux evaluation.
        """
        from ..radtran.opacity import compute_opacity
        from ..radtran.radiate import radiate_ir, radiate_solar, integrate_fluxes

        rad = self.rad
        nz = self.nz
        if T_freeze is None:
            T_freeze = self.T_init
        T0 = jnp.asarray(np.asarray(T_freeze)[1:])
        grav = jnp.asarray(self.grav)
        mubar = jnp.asarray(self.mubar)
        mix = jnp.asarray(self.mix)
        dz = jnp.asarray(self.dz)
        z = jnp.asarray(self.z)
        P, density = eqns.press_and_den(
            T0, grav, self.surface_pressure * 1.0e6, dz, mubar
        )
        P_bar = P / 1.0e6
        densities = mix * density[:, None]
        rho = density * (1.0 / const.N_avo) * mubar

        rep = lambda a: jnp.repeat(a, 2, axis=0)
        P_r, dens_r = rep(P_bar), rep(densities)
        dz_r = jnp.asarray(self.dz_r)

        op = rad.op
        freq_master = jnp.asarray(op.freq)
        wavl_master = jnp.asarray(op.wavl)
        wbin = jnp.asarray(op.kset.wbin)
        emis = jnp.asarray(rad.surface_emissivity)
        alb = jnp.asarray(rad.surface_albedo)
        ir_slice = (rad.ir.ind_start, rad.ir.ind_end)
        sol_slice = (rad.sol.ind_start, rad.sol.ind_end)
        photons_scaled = jnp.asarray(rad.photons_sol * rad.photon_scale_factor)
        zen_u = jnp.asarray(rad.zenith_u)
        zen_w = jnp.asarray(rad.zenith_weights)
        thermo = self.sp.thermo
        hard = bool(rad.has_hard_surface)
        tau_min = float(rad.ir_tau_min)
        diurnal = float(rad.diurnal_fac)

        def fluxes_fn(T_surf, T):
            T_r = rep(T)
            opr = compute_opacity(op, P_r, T_r, dens_r, dz_r)
            r_ir = radiate_ir(ir_slice, freq_master, wbin, opr, emis, hard,
                              tau_min, T_surf, T_r)
            fup_ir, fdn_ir = integrate_fluxes(
                r_ir["fup_a"], r_ir["fdn_a"],
                freq_master[ir_slice[0] : ir_slice[1] + 2])
            r_sol = radiate_solar(sol_slice, freq_master, wavl_master, wbin,
                                  opr, alb, diurnal, photons_scaled, zen_u,
                                  zen_w, compute_amean=False)
            fup_sol, fdn_sol = integrate_fluxes(
                r_sol["fup_a"], r_sol["fdn_a"],
                freq_master[sol_slice[0] : sol_slice[1] + 2])
            f_total = (fdn_sol - fup_sol) + (fdn_ir - fup_ir)
            return f_total, fup_ir, fdn_ir, fup_sol, fdn_sol

        vk = const.von_karman_const

        def rhs(T_in):
            T_surf = T_in[0]
            T = T_in[1:]
            f_total = fluxes_fn(T_surf, T)[0]

            cp_i = jax.vmap(lambda t: heat_capacity(thermo, t))(T)  # (nz, ng)
            cp = jnp.sum(cp_i * mix, axis=1) * (1.0 / (mubar * 1.0e-3)) * 1.0e4
            adiabat_lapse = grav / cp
            scale_height = (const.k_boltz * T * const.N_avo) / (mubar * grav)

            # mixing-length convection (clima_climate_rhs.f90:154-225)
            mixing_length = vk * z / (1.0 + vk * z / scale_height)
            gm = lambda a, b: jnp.sqrt(a * b)
            rho_av = gm(rho[:-1], rho[1:])
            cp_av = gm(cp[:-1], cp[1:])
            grav_av = gm(grav[:-1], grav[1:])
            T_av = gm(T[:-1], T[1:])
            ad_av = gm(adiabat_lapse[:-1], adiabat_lapse[1:])
            ml_av = gm(mixing_length[:-1], mixing_length[1:])
            delta_z = 0.5 * (dz[:-1] + dz[1:])
            dTdz = (T[1:] - T[:-1]) / delta_z
            Kh = eqns.eddy_for_heat(ml_av, grav_av, T_av, dTdz, ad_av)
            Fc_e = -(rho_av * cp_av * Kh) * (dTdz + ad_av)

            rho_g = jnp.sqrt(RHO_GROUND * rho[0])
            cp_g = jnp.sqrt(CP_GROUND * cp[0])
            T_avg = jnp.sqrt(T_surf * T[0])
            delta_zg = 0.5 * DZ_GROUND + 0.5 * dz[0]
            dTdz_g = (T[0] - T_surf) / delta_zg
            Kh_g = eqns.eddy_for_heat(
                mixing_length[0], grav[0], T_avg, dTdz_g, adiabat_lapse[0]
            )
            Fc_g = -(rho_g * cp_g * Kh_g) * (dTdz_g + adiabat_lapse[0])

            dFdz = (f_total[2::2][:nz] - f_total[0:-2:2][:nz]) / dz
            div_c = jnp.concatenate([
                (Fc_e[:1] - Fc_g) / dz[:1],
                (Fc_e[1:] - Fc_e[:-1]) / dz[1:-1],
                (0.0 - Fc_e[-1:]) / dz[-1:],
            ])
            dTdt_l = (dFdz - div_c) / (rho * cp)
            dTdt0 = (f_total[0] - Fc_g) / (RHO_GROUND * CP_GROUND * DZ_GROUND)
            return jnp.concatenate([dTdt0[None], dTdt_l])

        return rhs, fluxes_fn

    # ------------------------------------------------------------------

    def evolve(self, filename, tstart, T_start, t_eval, overwrite=False,
               method="DOP853", max_steps_per_segment=2000):
        """Integrate dT/dt, streaming snapshots at t_eval (integrate.f90:113-182).

        ``method``: "DOP853" (host scipy, reference-matching) or
        "rk45_device" (whole integration device-side in one jit; see module
        docstring).
        """
        import os
        from scipy.integrate import solve_ivp

        T_start = np.asarray(T_start, dtype=np.float64)
        if T_start.shape != (self.neq,):
            raise ClimaException("Input to evolve has the wrong dimension")
        if not overwrite and os.path.exists(filename):
            raise ClimaException(
                f"Unable to create file {filename} because it already exists"
            )

        if method == "rk45_device":
            return self._evolve_device(
                filename, tstart, T_start, np.asarray(t_eval, dtype=np.float64),
                max_steps_per_segment,
            )
        if method != "DOP853":
            raise ClimaException(f"unknown evolve method {method!r}")

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

    def _evolve_device(self, filename, tstart, T_start, t_eval, max_steps):
        """TPU-native evolve: one jitted lax.scan over snapshot segments with
        lax.while_loop adaptive Dormand-Prince 5(4) stepping inside, then one
        batched radiate over the snapshots for the output fields."""
        edges_chk = np.concatenate([[tstart], t_eval])
        if not np.all(np.diff(edges_chk) > 0):
            raise ClimaException(
                "t_eval must be strictly increasing and all > tstart "
                "(a zero-length segment would spin max_steps rejected steps)"
            )
        rhs, fluxes_fn = self._build_device_fns(T_freeze=T_start)
        rtol, atol = self.rtol, self.atol

        # Dormand-Prince 5(4) tableau
        A = (
            (1 / 5,),
            (3 / 40, 9 / 40),
            (44 / 45, -56 / 15, 32 / 9),
            (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
            (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
            (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
        )
        E = (71 / 57600, 0.0, -71 / 16695, 71 / 1920, -17253 / 339200,
             22 / 525, -1 / 40)

        def step(y, dt):
            ks = [rhs(y)]
            for row in A:
                yi = y + dt * sum(c * k for c, k in zip(row, ks))
                ks.append(rhs(yi))
            y5 = yi  # last row of A is the 5th-order solution weights
            err = dt * sum(c * k for c, k in zip(E, ks))
            sc = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y5))
            norm = jnp.sqrt(jnp.mean((err / sc) ** 2))
            return y5, norm

        def segment(carry, t_pair):
            # integrate in normalized segment time s in [0, 1]: comparing and
            # accumulating s is well-conditioned in float32, while t + dt with
            # t ~ 1e10 s and small dt would stall (t + dt == t)
            t_a, t_b = t_pair
            span = t_b - t_a

            def cond(st):
                s, y, dt_s, n = st
                return (s < 1.0) & (n < max_steps)

            def body(st):
                s, y, dt_s, n = st
                dt_sc = jnp.minimum(dt_s, 1.0 - s)
                y5, norm = step(y, dt_sc * span)
                # a non-finite norm (overshoot into unphysical state) is a
                # REJECTED step — shrink and retry, like dop853 does
                finite = jnp.isfinite(norm)
                accept = finite & (norm <= 1.0)
                s = jnp.where(accept, s + dt_sc, s)
                y = jnp.where(accept, y5, y)
                fac = jnp.where(
                    finite,
                    jnp.clip(
                        0.9 * jnp.maximum(norm, 1e-10) ** -0.2, 0.2, 5.0
                    ),
                    0.2,
                )
                dt_s = dt_sc * fac
                return s, y, dt_s, n + 1

            y0, dt_phys = carry
            s0 = jnp.zeros_like(span)
            s, y, dt_s, n = jax.lax.while_loop(
                cond, body, (s0, y0, dt_phys / span, jnp.zeros((), jnp.int32))
            )
            success = s >= 1.0
            return (y, dt_s * span), (y, success, n)

        def run(y0, t_pairs):
            # initial step from the rhs scale (Hairer-style h0)
            f0 = rhs(y0)
            sc = atol + rtol * jnp.abs(y0)
            d0 = jnp.sqrt(jnp.mean((y0 / sc) ** 2))
            d1 = jnp.sqrt(jnp.mean((f0 / sc) ** 2))
            dt0 = jnp.where(d1 > 0, 0.01 * d0 / d1, 1.0e-6)
            (_, _), (ys, succ, nsteps) = jax.lax.scan(
                segment, (y0, dt0), t_pairs
            )
            return ys, succ, nsteps

        T_start = jnp.asarray(T_start, dtype=jnp.zeros(()).dtype)
        edges = np.concatenate([[tstart], t_eval])
        t_pairs = jnp.stack(
            [jnp.asarray(edges[:-1]), jnp.asarray(edges[1:])], axis=1
        )
        ys, succ, nsteps = jax.jit(run)(T_start, t_pairs)
        ys = np.asarray(ys)
        success = bool(np.all(np.asarray(succ)))
        if self.verbose:
            print(
                f" device RK45: {int(np.sum(np.asarray(nsteps)))} steps over "
                f"{len(t_eval)} segments, success = {success}"
            )

        # snapshot radiative fields: one batched radiate over all snapshots
        flux_batch = jax.jit(jax.vmap(lambda y: fluxes_fn(y[0], y[1:])))
        f_total, fup_ir, fdn_ir, fup_sol, fdn_sol = [
            np.asarray(a) for a in flux_batch(jnp.asarray(ys))
        ]
        if self._P is None:
            # same frozen hydrostatic state used by the device RHS
            P, density = eqns.press_and_den(
                jnp.asarray(self.T_init[1:]), jnp.asarray(self.grav),
                self.surface_pressure * 1.0e6, jnp.asarray(self.dz),
                jnp.asarray(self.mubar),
            )
            self._P = np.asarray(P) / 1.0e6
            self._density = np.asarray(density)

        take = (
            (lambda a: a[0::2][: self.nz + 1])
            if self.double_radiative_grid
            else (lambda a: a)
        )
        P_out = np.concatenate([[self.surface_pressure], self._P])
        np.savez(
            filename,
            nz=self.nz,
            z=np.concatenate([[0.0], self.z]),
            nt=len(t_eval),
            t=np.asarray(t_eval),
            T=ys,
            f_total=np.stack([take(a) for a in f_total]),
            fup_ir=np.stack([take(a) for a in fup_ir]),
            fdn_ir=np.stack([take(a) for a in fdn_ir]),
            fup_sol=np.stack([take(a) for a in fup_sol]),
            fdn_sol=np.stack([take(a) for a in fdn_sol]),
            P=np.stack([P_out] * len(t_eval)),
        )
        return success


def load_evolve_file(filename):
    """Load an evolve() snapshot stream."""
    with np.load(filename) as d:
        return {k: d[k] for k in d.files}
