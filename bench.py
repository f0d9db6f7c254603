"""Headline benchmark: band-column two-stream RT solves per second per chip.

Target (BASELINE.md): >= 1e5 two-stream solves/s/chip, where one "solve" is a
single (wavelength bin x gauss point x zenith angle x column) Toon two-stream
tridiagonal solution of size 2*nz on the flagship radiative grid
(nz_r = 2*100+2 = 202 layers, the AdiabatClimate Earth config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _template
    from clima_tpu.radtran import data as data_mod
    from clima_tpu.radtran.opacity import compute_opacity
    from clima_tpu.radtran.radiate import radiate_ir, radiate_solar, integrate_fluxes
    from clima_tpu.physics import eqns
    from clima_tpu.config import load_settings, load_species

    t = _template(nz=100, n_zenith=4, tag="bench")
    s = load_settings(t["settings"])
    sp = load_species(t["species"])
    op = data_mod.load_optical_data(t["datadir"], sp.gas_names, [], s.op)
    ir = data_mod.load_channel(t["datadir"], "ir", None, op)
    sol = data_mod.load_channel(t["datadir"], "solar", None, op)
    photons = data_mod.read_stellar_flux(t["star"], sol.wavl)

    nz = 2 * 100 + 2  # flagship radiative grid (doubled + ghosts)
    n_zen = 4
    ang, zw = eqns.zenith_angles_and_weights(n_zen)
    zen_u = np.cos(ang * np.pi / 180.0)

    # prescribed Earth-like column
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

    def radiate_one(T_surf, T, P, dens, dz):
        opr = compute_opacity(op, P, T, dens, dz)
        r_ir = radiate_ir(ir_slice, freq_master, wbin, opr, emis, True, 1e-6, T_surf, T)
        fup_ir, fdn_ir = integrate_fluxes(
            r_ir["fup_a"], r_ir["fdn_a"], freq_master[ir_slice[0] : ir_slice[1] + 2]
        )
        r_sol = radiate_solar(
            sol_slice, freq_master, wavl_master, wbin, opr, alb, 0.5,
            jnp.asarray(photons), jnp.asarray(zen_u), jnp.asarray(zw),
            compute_amean=False,
        )
        fup_sol, fdn_sol = integrate_fluxes(
            r_sol["fup_a"], r_sol["fdn_a"], freq_master[sol_slice[0] : sol_slice[1] + 2]
        )
        return fdn_sol[-1] - fup_sol[-1], -(fdn_ir[-1] - fup_ir[-1])

    B = int(os.environ.get("BENCH_COLUMNS", "256"))
    # K distinct evaluations per dispatch: one host<->device sync through the
    # axon relay costs ~60 ms, which would otherwise be charged to the chip.
    K = int(os.environ.get("BENCH_INNER", "8"))

    def radiate_many(T_surf, T, P, dens, dz):
        # Every input that reaches opacity assembly and the solar path is
        # perturbed per inner iteration, so the K evaluations are genuinely
        # distinct subgraphs — XLA CSE cannot deduplicate opacity or the
        # solar solves across iterations (advisor finding r1: varying only
        # T_surf let CSE collapse K opacity+solar computations into one).
        acc_isr, acc_olr = 0.0, 0.0
        for i in range(K):
            s = 1.0 + 1e-6 * i
            isr, olr = radiate_one(T_surf * s, T * s, P, dens * s, dz)
            acc_isr = acc_isr + isr
            acc_olr = acc_olr + olr
        return acc_isr, acc_olr

    fn = jax.jit(jax.vmap(radiate_many))

    rng = np.random.default_rng(0)
    T_surf_b = jnp.asarray(rng.uniform(280.0, 295.0, B))
    jitter = rng.uniform(0.95, 1.05, (B, 1))
    T_b = jnp.asarray(T[None, :] * jitter)
    P_b = jnp.asarray(np.repeat(P_bar[None, :], B, axis=0))
    dens_b = jnp.asarray(dens[None, :, :] * jitter[:, :, None])
    dz_b = jnp.asarray(np.repeat(dz[None, :], B, axis=0))

    # warmup / compile. NOTE: sync via np.asarray (device_get) — in this
    # environment jax.block_until_ready does not reliably synchronize through
    # the TPU relay, so timing must round-trip a (small) result to host.
    out = fn(T_surf_b, T_b, P_b, dens_b, dz_b)
    np.asarray(out[0])

    # timed iterations; scale one input so every call is distinct. The rate
    # uses the MEDIAN per-iteration time: each iteration syncs through the
    # axon relay, whose occasional ~1 s stalls are host/network noise, not
    # chip time — a single stall in a mean-based timing misreported the r4
    # headline 3x low (BENCH_r04 1.78M vs 5.4M re-measured, VERDICT r5).
    n_iter = int(os.environ.get("BENCH_ITERS", "10"))
    times = []
    for i in range(n_iter):
        t0 = time.perf_counter()
        out = fn(T_surf_b * (1.0 + 1e-6 * i), T_b, P_b, dens_b, dz_b)
        np.asarray(out[0])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    ngauss = op.kset.nbin
    solves_per_column = ir.nw * ngauss * 1 + sol.nw * ngauss * n_zen
    total_solves = solves_per_column * B * K
    rate = total_solves / dt

    print(
        json.dumps(
            {
                "metric": "two_stream_band_solves_per_s",
                "value": rate,
                "unit": "solves/s/chip",
                "vs_baseline": rate / 1.0e5,
            }
        )
    )


if __name__ == "__main__":
    main()
