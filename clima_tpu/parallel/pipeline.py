"""Pure, batched end-to-end column pipelines.

This is the TPU-native counterpart of the reference's serial Python sweep
loops (SURVEY.md section 2.4): the entire column model — moist adiabat
construction, altitude solve, opacity assembly, two-stream RT, TOA fluxes,
and a damped-Newton surface-temperature solve — expressed as one pure
jittable function of (T_surf, P_i_surf), then batched with ``vmap`` over a
leading column axis and sharded over a 1-D ``columns`` device mesh. Columns
never communicate; the only collective is the all-reduce implicit in the
batched convergence check.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import constants as const
from ..adiabat.profile import AdiabatParams, make_profile_core
from ..adiabat.altitude import compute_altitude_core
from ..ops.interp import pdot
from ..radtran.opacity import compute_opacity
from ..radtran.radiate import radiate_ir, radiate_solar, integrate_fluxes

__all__ = [
    "make_column_fns",
    "batched_toa_fluxes",
    "batched_surface_temperature",
    "make_mesh",
    "shard_columns",
    "initialize_distributed",
]


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host initialization (jax.distributed over ICI/DCN).

    The workload is communication-free across columns (SURVEY.md section
    2.4): after this call, build the mesh with :func:`make_mesh` over
    ``jax.devices()`` and shard the column batch; the only cross-host
    traffic is the convergence all-reduce.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_column_fns(c):
    """Build pure column functions from an AdiabatClimate instance.

    Returns dict with:
      toa_fluxes(T_surf, P_i_surf) -> (ISR, OLR)  [single column, jittable]
      column_model(T_surf, P_i_surf, T_trop) -> dict(ISR, OLR, fup_sol_toa,
        fdn_sol_toa, P_surf, N_atmos, N_surface)   [full traced model]
      profile_only(T_surf, P_i_surf, T_trop) -> dict(P_surf, N_atmos,
        N_surface)                                 [no RT — reservoir solves]
      newton_step(state, P_i_surf) -> state       [one damped-Newton step on
                                                   log10(T_surf)]
    """
    par: AdiabatParams = c._par
    op = c.rad.op
    RH = jnp.asarray(c.RH)
    T_trop_default = float(c.T_trop)
    nz = c.nz
    ir_slice = (c.rad.ir.ind_start, c.rad.ir.ind_end)
    sol_slice = (c.rad.sol.ind_start, c.rad.sol.ind_end)
    freq_master = jnp.asarray(op.freq)
    wavl_master = jnp.asarray(op.wavl)
    wbin = jnp.asarray(op.kset.wbin)
    emissivity = jnp.asarray(c.rad.surface_emissivity)
    albedo = jnp.asarray(c.rad.surface_albedo)
    photons = jnp.asarray(c.rad.photons_sol * c.rad.photon_scale_factor)
    zenith_u = jnp.asarray(c.rad.zenith_u)
    zenith_w = jnp.asarray(c.rad.zenith_weights)
    diurnal = c.rad.diurnal_fac
    has_hard = c.rad.has_hard_surface
    ir_tau_min = c.rad.ir_tau_min
    gas_masses = jnp.asarray(c.sp.gas_masses)

    def _build_profile(T_surf, P_i_surf, T_trop):
        """Profile + altitude + reservoir bookkeeping (no RT)."""
        prof = make_profile_core(par, RH, T_surf, P_i_surf, T_trop)
        P_c = prof["P_e"][1::2]
        T_c = prof["T_e"][1::2]
        f_c = prof["f_i_e"][1::2]
        mubar = pdot(f_c, gas_masses)
        mubar_surf = pdot(prof["f_i_e"][0], gas_masses)
        alt = compute_altitude_core(
            P_c, T_c, mubar, prof["P_surf"], T_surf, mubar_surf, par.P_top,
            par.planet_mass, par.planet_radius, -1.0,
        )
        density = P_c / (const.k_boltz * T_c)
        dens = f_c * density[:, None]
        # N_atmos mol/cm^2 (clima_adiabat.f90:449-453 semantics)
        N_atmos = jnp.sum(dens * alt["dz"][:, None], axis=0) / const.N_avo
        return dict(
            prof=prof, P_c=P_c, T_c=T_c, f_c=f_c, dens=dens, dz=alt["dz"],
            P_surf=prof["P_surf"], N_atmos=N_atmos,
            N_surface=prof["N_surface"],
        )

    def profile_only(T_surf, P_i_surf, T_trop):
        b = _build_profile(T_surf, P_i_surf, T_trop)
        return dict(P_surf=b["P_surf"], N_atmos=b["N_atmos"],
                    N_surface=b["N_surface"],
                    f_i_surf=b["prof"]["f_i_e"][0])

    def column_model(T_surf, P_i_surf, T_trop):
        b = _build_profile(T_surf, P_i_surf, T_trop)
        T_c, P_c, dens = b["T_c"], b["P_c"], b["dens"]

        # doubled RT grid + 2 ghost layers (clima_adiabat.f90:729-773)
        rep = lambda a: jnp.repeat(a, 2, axis=0)
        T_r = jnp.concatenate([rep(T_c), T_c[-1:], T_c[-1:]])
        P_r = jnp.concatenate([rep(P_c), P_c[-1:], P_c[-1:]])
        dens_r = jnp.concatenate([rep(dens), dens[-1:], dens[-1:]], axis=0)
        dz_half = 0.5 * b["dz"]
        dz_r = jnp.concatenate([rep(dz_half), dz_half[-1:], dz_half[-1:]])

        opr = compute_opacity(op, P_r / 1.0e6, T_r, dens_r, dz_r)
        ir = radiate_ir(
            ir_slice, freq_master, wbin, opr, emissivity, has_hard, ir_tau_min,
            T_surf, T_r,
        )
        fup_ir, fdn_ir = integrate_fluxes(
            ir["fup_a"], ir["fdn_a"], freq_master[ir_slice[0] : ir_slice[1] + 2]
        )
        sol = radiate_solar(
            sol_slice, freq_master, wavl_master, wbin, opr, albedo, diurnal,
            photons, zenith_u, zenith_w, compute_amean=False,
        )
        fup_sol, fdn_sol = integrate_fluxes(
            sol["fup_a"], sol["fdn_a"], freq_master[sol_slice[0] : sol_slice[1] + 2]
        )
        ISR = fdn_sol[-1] - fup_sol[-1]
        OLR = -(fdn_ir[-1] - fup_ir[-1])
        return dict(
            ISR=ISR, OLR=OLR, fup_sol_toa=fup_sol[-1], fdn_sol_toa=fdn_sol[-1],
            P_surf=b["P_surf"], N_atmos=b["N_atmos"], N_surface=b["N_surface"],
            f_i_surf=b["prof"]["f_i_e"][0],
        )

    def toa_fluxes(T_surf, P_i_surf):
        m = column_model(T_surf, P_i_surf, T_trop_default)
        return m["ISR"], m["OLR"]

    def newton_step(state, P_i_surf):
        """One damped FD-Newton step on log10(T_surf) for ISR-OLR=0.

        state = (logT, resid, converged). Mirrors the reference's hybrd1
        1-DOF solve (clima_adiabat.f90:882-961), vectorization-friendly.
        """
        logT, resid, conv = state
        eps = 1.0e-4
        T0 = 10.0**logT
        T1 = 10.0 ** (logT + eps)
        isr0, olr0 = toa_fluxes(T0, P_i_surf)
        isr1, olr1 = toa_fluxes(T1, P_i_surf)
        r0 = isr0 - olr0
        r1 = isr1 - olr1
        dr = (r1 - r0) / eps
        step = -r0 / jnp.where(jnp.abs(dr) > 1e-30, dr, 1e-30)
        step = jnp.clip(step, -0.05, 0.05)  # damping: <= ~12% in T
        scale = jnp.maximum(jnp.abs(isr0), 1.0)
        new_conv = jnp.abs(r0) < 1.0e-6 * scale
        logT_new = jnp.where(new_conv, logT, logT + step)
        return (logT_new, r0, new_conv)

    return dict(toa_fluxes=toa_fluxes, newton_step=newton_step,
                column_model=column_model, profile_only=profile_only)


def make_mesh(n_devices=None, devices=None):
    """1-D 'columns' mesh over the available devices."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), axis_names=("columns",))


def shard_columns(mesh):
    return NamedSharding(mesh, P("columns"))


def batched_toa_fluxes(c, T_surf_batch, P_i_surf_batch, mesh=None):
    """Batched TOA fluxes over columns, optionally sharded over a mesh."""
    fns = make_column_fns(c)
    fn = jax.vmap(fns["toa_fluxes"])
    if mesh is not None:
        sharding = shard_columns(mesh)
        T_surf_batch = jax.device_put(jnp.asarray(T_surf_batch), sharding)
        P_i_surf_batch = jax.device_put(
            jnp.asarray(P_i_surf_batch), NamedSharding(mesh, P("columns", None))
        )
    return jax.jit(fn)(jnp.asarray(T_surf_batch), jnp.asarray(P_i_surf_batch))


def batched_surface_temperature(c, P_i_surf_batch, T_guess=280.0, max_iter=30,
                                mesh=None):
    """Solve ISR-OLR=0 for every column in the batch, fully on device.

    The while_loop termination is a global all-reduce over the sharded batch
    — the only cross-device communication in the workload.
    """
    fns = make_column_fns(c)
    step = jax.vmap(fns["newton_step"], in_axes=((0, 0, 0), 0))

    P_i_surf_batch = jnp.asarray(P_i_surf_batch)
    B = P_i_surf_batch.shape[0]
    logT0 = jnp.full(B, np.log10(T_guess), dtype=P_i_surf_batch.dtype)
    resid0 = jnp.full(B, jnp.inf, dtype=P_i_surf_batch.dtype)
    conv0 = jnp.zeros(B, dtype=bool)

    def cond(carry):
        state, it = carry
        return (~jnp.all(state[2])) & (it < max_iter)

    def body(carry):
        state, it = carry
        return step(state, P_i_surf_batch), it + 1

    @jax.jit
    def solve(state0):
        state, iters = jax.lax.while_loop(cond, body, (state0, 0))
        return state, iters

    state0 = (logT0, resid0, conv0)
    if mesh is not None:
        sharding = shard_columns(mesh)
        state0 = jax.device_put(state0, sharding)
        P_i_surf_batch = jax.device_put(
            P_i_surf_batch, NamedSharding(mesh, P("columns", None))
        )
    (logT, resid, conv), iters = solve(state0)
    return 10.0**logT, resid, conv, int(iters)
