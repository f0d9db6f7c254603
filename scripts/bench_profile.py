"""Component-level timing of the headline bench pipeline on TPU.

Times (opacity | IR | solar | full) at the bench's flagship shapes using the
sync-amortized round-trip pattern (CLAUDE.md): K distinct inner evaluations
per dispatch, sum-reduced to a scalar, np.asarray round-trip per timed call.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _template
    from clima_tpu.radtran import data as data_mod
    from clima_tpu.radtran.opacity import compute_opacity
    from clima_tpu.radtran.radiate import radiate_ir, radiate_solar, integrate_fluxes
    from clima_tpu.physics import eqns
    from clima_tpu.config import load_settings, load_species

    t = _template(nz=100, n_zenith=4, tag="benchprof")
    s = load_settings(t["settings"])
    sp = load_species(t["species"])
    op = data_mod.load_optical_data(t["datadir"], sp.gas_names, [], s.op)
    ir = data_mod.load_channel(t["datadir"], "ir", None, op)
    sol = data_mod.load_channel(t["datadir"], "solar", None, op)
    photons = data_mod.read_stellar_flux(t["star"], sol.wavl)

    nz = 2 * 100 + 2
    n_zen = 4
    ang, zw = eqns.zenith_angles_and_weights(n_zen)
    zen_u = np.cos(ang * np.pi / 180.0)

    ng = sp.ng
    zc = np.linspace(0.0, 7.0e6, nz)
    T = np.maximum(288.0 - 6.5e-5 * zc, 200.0)
    dz = np.full(nz, 7.0e6 / nz)
    P_bar = 1.013 * np.exp(-zc / 8.0e5)
    den = P_bar * 1.0e6 / (1.380649e-16 * T)
    mix = np.full((nz, ng), 1e-12)
    mix[:, sp.gas_names.index("H2O")] = 1e-2 * np.exp(-zc / 2e5) + 1e-6
    mix[:, sp.gas_names.index("CO2")] = 400e-6
    mix[:, sp.gas_names.index("N2")] = 0.78
    dens = mix * den[:, None]

    freq_master = jnp.asarray(op.freq)
    wavl_master = jnp.asarray(op.wavl)
    wbin = jnp.asarray(op.kset.wbin)
    emis = jnp.ones(ir.nw)
    alb = jnp.full(sol.nw, 0.25)
    ir_slice = (ir.ind_start, ir.ind_end)
    sol_slice = (sol.ind_start, sol.ind_end)

    def opac_only(T_surf, T, P, dens, dz):
        opr = compute_opacity(op, P, T, dens, dz)
        return sum(jnp.sum(v) for v in opr.values()) + 0.0 * T_surf

    def ir_only(T_surf, T, P, dens, dz):
        opr = compute_opacity(op, P, T, dens, dz)
        r_ir = radiate_ir(ir_slice, freq_master, wbin, opr, emis, True, 1e-6, T_surf, T)
        fup_ir, fdn_ir = integrate_fluxes(
            r_ir["fup_a"], r_ir["fdn_a"], freq_master[ir_slice[0] : ir_slice[1] + 2]
        )
        return fup_ir[-1] - fdn_ir[-1]

    def sol_only(T_surf, T, P, dens, dz):
        opr = compute_opacity(op, P, T, dens, dz)
        r_sol = radiate_solar(
            sol_slice, freq_master, wavl_master, wbin, opr, alb, 0.5,
            jnp.asarray(photons), jnp.asarray(zen_u), jnp.asarray(zw),
        )
        fup, fdn = integrate_fluxes(
            r_sol["fup_a"], r_sol["fdn_a"], freq_master[sol_slice[0] : sol_slice[1] + 2]
        )
        return fup[-1] - fdn[-1] + 0.0 * T_surf

    def full(T_surf, T, P, dens, dz):
        opr = compute_opacity(op, P, T, dens, dz)
        r_ir = radiate_ir(ir_slice, freq_master, wbin, opr, emis, True, 1e-6, T_surf, T)
        fup_ir, fdn_ir = integrate_fluxes(
            r_ir["fup_a"], r_ir["fdn_a"], freq_master[ir_slice[0] : ir_slice[1] + 2]
        )
        r_sol = radiate_solar(
            sol_slice, freq_master, wavl_master, wbin, opr, alb, 0.5,
            jnp.asarray(photons), jnp.asarray(zen_u), jnp.asarray(zw),
        )
        fup, fdn = integrate_fluxes(
            r_sol["fup_a"], r_sol["fdn_a"], freq_master[sol_slice[0] : sol_slice[1] + 2]
        )
        return fup[-1] - fdn[-1] - (fdn_ir[-1] - fup_ir[-1])

    B = int(os.environ.get("BENCH_COLUMNS", "256"))
    K = int(os.environ.get("BENCH_INNER", "8"))
    n_iter = int(os.environ.get("BENCH_ITERS", "5"))

    rng = np.random.default_rng(0)
    T_surf_b = jnp.asarray(rng.uniform(280.0, 295.0, B))
    jitter = rng.uniform(0.95, 1.05, (B, 1))
    T_b = jnp.asarray(T[None, :] * jitter)
    P_b = jnp.asarray(np.repeat(P_bar[None, :], B, axis=0))
    dens_b = jnp.asarray(dens[None, :, :] * jitter[:, :, None])
    dz_b = jnp.asarray(np.repeat(dz[None, :], B, axis=0))

    for name, f in [("opacity", opac_only), ("opacity+ir", ir_only),
                    ("opacity+solar", sol_only), ("full", full)]:
        def many(T_surf, T, P, dens, dz, f=f):
            acc = 0.0
            for i in range(K):
                sc = 1.0 + 1e-6 * i
                acc = acc + f(T_surf * sc, T * sc, P, dens * sc, dz)
            return acc

        fn = jax.jit(jax.vmap(many))
        out = fn(T_surf_b, T_b, P_b, dens_b, dz_b)
        np.asarray(out)
        t0 = time.perf_counter()
        for i in range(n_iter):
            out = fn(T_surf_b * (1.0 + 1e-6 * i), T_b, P_b, dens_b, dz_b)
            np.asarray(out)
        dt = time.perf_counter() - t0
        per_eval_ms = dt / (n_iter * K) * 1e3
        print(f"{name:16s} {per_eval_ms:9.3f} ms per (B={B}, K-amortized) eval")


if __name__ == "__main__":
    main()
