"""Sub-stage TPU timing inside compute_opacity at the bench workload.

Times (a) k-table interpolation, (b) RORR k-mixing, (c) continua/Rayleigh
assembly, (d) the final combine, each as its own jitted program with slope
timing. Usage: python scripts/profile_opacity.py [--columns 256]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--columns", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--K", type=int, default=9)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _template
    from clima_tpu.radtran import data as data_mod
    from clima_tpu.radtran import opacity as opac
    from clima_tpu.config import load_settings, load_species

    t = _template(nz=100, n_zenith=4, tag="bench")
    s = load_settings(t["settings"])
    sp = load_species(t["species"])
    op = data_mod.load_optical_data(t["datadir"], sp.gas_names, [], s.op)

    nz = 202
    ng = sp.ng
    B = args.columns
    rng = np.random.default_rng(0)
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
    jitter = rng.uniform(0.95, 1.05, (B, 1))
    T_b = jnp.asarray(T[None, :] * jitter)
    P_b = jnp.asarray(np.repeat(P_bar[None, :], B, axis=0))
    dens_b = jnp.asarray(dens[None, :, :] * jitter[:, :, None])
    dz_b = jnp.asarray(np.repeat(dz[None, :], B, axis=0))

    nk = len(op.k)
    nw = op.nw
    nbin = op.kset.nbin
    print(json.dumps({"nk": nk, "nw": nw, "nbin": nbin, "nz": nz, "B": B,
                      "ncia": len(op.cia), "nray": len(op.ray),
                      "cont": op.cont is not None}))

    def kinterp_one(P, Tz, d, z):
        log10P = jnp.log10(P)
        cols = d * z[:, None]
        tau_ks = []
        for kt in op.k:
            kcoef = opac._interp_ktable(kt, log10P, Tz)
            tau_sp = kcoef * cols[:, kt.sp_ind][:, None, None]
            tau_ks.append(jnp.transpose(tau_sp, (2, 0, 1)))
        return jnp.stack(tau_ks, axis=0)

    tau_ks_b = jax.jit(jax.vmap(kinterp_one))(P_b, T_b, dens_b, dz_b)
    tau_ks_b = jnp.asarray(np.asarray(tau_ks_b))

    def stage_kinterp(scale):
        o = jax.vmap(kinterp_one)(P_b, T_b * scale, dens_b * scale, dz_b)
        return jnp.sum(o)

    from clima_tpu.ops.pallas_rorr import k_rorr_mix_pallas
    from clima_tpu.ops.rorr import k_rorr_mix

    use_pallas = opac._use_pallas_rorr()

    def stage_rorr(scale):
        def mix_one(tk):
            if use_pallas and nbin <= 16 and nk >= 2:
                return k_rorr_mix_pallas(tk, op.kset.wbin, op.kset.wbin_e)
            return k_rorr_mix(tk, jnp.asarray(op.kset.wbin_e))
        return jnp.sum(jax.vmap(mix_one)(tau_ks_b * scale))

    def continua_one(P, Tz, d, z):
        log10P = jnp.log10(P)
        cols = d * z[:, None]
        tausg = jnp.zeros((nz, nw))
        for xs in op.ray:
            tausg = tausg + jnp.asarray(xs.xs_0d)[None, :] * cols[:, xs.sp_inds[0]][:, None]
        taua = jnp.zeros((nz, nw))
        for xs in op.cia:
            j, jj = xs.sp_inds
            if xs.dim == 0:
                lgval = opac._safe_log10(jnp.asarray(xs.xs_0d))[None, :]
            else:
                lgval = opac._interp_table_T_log10(xs.temp, xs.log10_xs, Tz)
            lgcol = (opac._safe_log10(d[:, j]) + opac._safe_log10(d[:, jj]) + jnp.log10(z))
            taua = taua + 10.0 ** (lgval + lgcol[:, None])
        for xs in op.pxs + op.axs:
            j = xs.sp_inds[0]
            if xs.dim == 0:
                val = jnp.asarray(xs.xs_0d)[None, :]
            else:
                val = 10.0 ** opac._interp_table_T_log10(xs.temp, xs.log10_xs, Tz)
            taua = taua + val * cols[:, j][:, None]
        if op.cont is not None:
            LH2O = op.cont.LH2O
            lg_h2o = opac._interp_table_T_log10(op.cont.temp, op.cont.log10_xs_H2O, Tz)
            lg_for = opac._interp_table_T_log10(op.cont.temp, op.cont.log10_xs_foreign, Tz)
            foreign_col = jnp.sum(cols, axis=1) - cols[:, LH2O]
            lg_n_h2o = opac._safe_log10(d[:, LH2O])
            taua = taua + 10.0 ** (lg_h2o + (lg_n_h2o + opac._safe_log10(cols[:, LH2O]))[:, None])
            taua = taua + 10.0 ** (lg_for + (lg_n_h2o + opac._safe_log10(foreign_col))[:, None])
        return tausg + taua

    def stage_continua(scale):
        o = jax.vmap(continua_one)(P_b, T_b * scale, dens_b * scale, dz_b)
        return jnp.sum(o)

    def stage_full(scale):
        o = jax.vmap(lambda P, Tz, d, z: opac.compute_opacity(op, P, Tz, d, z))(
            P_b, T_b * scale, dens_b * scale, dz_b
        )
        return sum(jnp.sum(l) for l in jax.tree.leaves(o))

    def timed(stage_fn, K):
        def f(s0):
            acc = 0.0
            for i in range(K):
                acc = acc + stage_fn(s0 * (1.0 + 1e-6 * i))
            return acc
        jf = jax.jit(f)
        np.asarray(jf(jnp.float32(1.0)))
        t0 = time.perf_counter()
        for i in range(args.iters):
            np.asarray(jf(jnp.float32(1.0 + 1e-6 * (i + 1))))
        return (time.perf_counter() - t0) / args.iters

    for name, fn in [("kinterp", stage_kinterp), ("rorr", stage_rorr),
                     ("continua", stage_continua), ("full_opacity", stage_full)]:
        t1 = timed(fn, 1)
        tK = timed(fn, args.K)
        per = (tK - t1) / (args.K - 1)
        print(json.dumps({"stage": name, "per_call_ms": per * 1e3,
                          "t1_ms": t1 * 1e3}))


if __name__ == "__main__":
    main()
