"""Sub-stage timing inside compute_opacity at the bench workload (TPU).

Times, with the K-slope method over a vmapped B-column batch:
  hatw    : hat_weights + Wpt outer-product build only
  ktable  : k-table interpolation matmuls only (per precision)
  rorr    : RORR k-mixing only (pallas vs xla)
  contin  : Rayleigh+CIA+photolysis+continuum assembly only
  full    : whole compute_opacity

Usage: python scripts/opacity_substages.py [--columns 256] [--iters 5]
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--K", type=int, default=9)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _template
    from clima_tpu.radtran import data as data_mod
    from clima_tpu.radtran import opacity as om
    from clima_tpu.ops.interp import hat_weights
    from clima_tpu.config import load_settings, load_species

    t = _template(nz=100, n_zenith=4, tag="bench")
    s = load_settings(t["settings"])
    sp = load_species(t["species"])
    op = data_mod.load_optical_data(t["datadir"], sp.gas_names, [], s.op)

    nz = 2 * 100 + 2
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

    B = args.columns
    rng = np.random.default_rng(0)
    jitter = rng.uniform(0.95, 1.05, (B, 1))
    T_b = jnp.asarray(T[None, :] * jitter)
    P_b = jnp.asarray(np.repeat(P_bar[None, :], B, axis=0))
    dens_b = jnp.asarray(dens[None, :, :] * jitter[:, :, None])
    dz_b = jnp.asarray(np.repeat(dz[None, :], B, axis=0))

    nbin = op.kset.nbin
    nw = op.nw
    nk = len(op.k)

    def prep(P, Tz, d, z):
        P = P[::-1]; Tz = Tz[::-1]; d = d[::-1]; z = z[::-1]
        return jnp.log10(P), Tz, d * z[:, None], z

    def sub_hatw(P, Tz, d, z):
        log10P, Tz, cols, _ = prep(P, Tz, d, z)
        acc = 0.0
        for kt in op.k:
            Wp = hat_weights(jnp.asarray(kt.log10P), log10P)
            Wt = hat_weights(jnp.asarray(kt.temp), Tz)
            WptT = (Wp.T[:, None, :] * Wt.T[None, :, :]).reshape(-1, Tz.shape[0])
            acc = acc + jnp.sum(WptT)
        return acc

    def make_ktable(prec):
        pd = lambda a, b: jnp.matmul(a, b, precision=prec)

        def f(P, Tz, d, z):
            log10P, Tz, cols, _ = prep(P, Tz, d, z)
            acc = 0.0
            for kt in op.k:
                Wp = hat_weights(jnp.asarray(kt.log10P), log10P)
                Wt = hat_weights(jnp.asarray(kt.temp), Tz)
                nzl = Wp.shape[0]
                WptT = (Wp.T[:, None, :] * Wt.T[None, :, :]).reshape(-1, nzl)
                tab = jnp.asarray(kt.log10k)
                G, Pn, Tn, Wn = tab.shape
                tabT = jnp.transpose(tab, (0, 3, 1, 2)).reshape(G * Wn, Pn * Tn)
                logk = pd(tabT, WptT).reshape(G, Wn, nzl)
                acc = acc + jnp.sum(10.0 ** logk)
            return acc
        return f

    # the RORR-only stage builds its (nk, nbin, nw, nz) per-species tau
    # inside the traced fn from small per-column seeds (a materialized
    # (B, nk, nbin, nw, nz) input is 2.5 GB and thrashes HBM)
    seed_b = jnp.asarray(
        np.random.default_rng(1).uniform(0.5, 2.0, (B, nk, nz)), jnp.float32
    )
    gaus = jnp.asarray(10.0 ** np.linspace(-4.0, 1.0, nbin), jnp.float32)
    wline = jnp.asarray(np.random.default_rng(2).uniform(0.1, 10.0, (nk, nw)),
                        jnp.float32)

    def make_rorr(use_pallas):
        from clima_tpu.ops.rorr import k_rorr_mix
        from clima_tpu.ops.pallas_rorr import k_rorr_mix_pallas_t

        def f(seed):
            tk = (seed[:, None, None, :] * gaus[None, :, None, None]
                  * wline[:, None, :, None])  # (nk, nbin, nw, nz)
            if use_pallas:
                mixed = k_rorr_mix_pallas_t(
                    tk.reshape(nk, nbin, nw * nz), op.kset.wbin, op.kset.wbin_e
                )
            else:
                mixed = jnp.moveaxis(
                    k_rorr_mix(
                        jnp.moveaxis(tk.reshape(nk, nbin, nw * nz), 1, -1),
                        jnp.asarray(op.kset.wbin_e),
                    ), -1, 0)
            return jnp.sum(mixed)
        return f

    def sub_contin(P, Tz, d, z):
        # full compute_opacity minus the k-distribution work: zero k-tables
        # is not expressible, so time full and subtract instead; here time
        # only the continuum/CIA/rayleigh loop by calling internals.
        log10P, Tz, cols, zf = prep(P, Tz, d, z)
        densities = d[::-1]
        dzf = z[::-1]
        tausg = jnp.zeros((Tz.shape[0], nw))
        for xs in op.ray:
            tausg = tausg + jnp.asarray(xs.xs_0d)[None, :] * cols[:, xs.sp_inds[0]][:, None]
        taua = jnp.zeros((Tz.shape[0], nw))
        for xs in op.cia:
            j, jj = xs.sp_inds
            lgval = om._interp_table_T_log10(xs.temp, xs.log10_xs, Tz)
            lgcol = (om._safe_log10(densities[:, j]) + om._safe_log10(densities[:, jj])
                     + jnp.log10(dzf))
            taua = taua + 10.0 ** (lgval + lgcol[:, None])
        for xs in op.pxs + op.axs:
            j = xs.sp_inds[0]
            if xs.dim == 0:
                val = jnp.asarray(xs.xs_0d)[None, :]
            else:
                val = 10.0 ** om._interp_table_T_log10(xs.temp, xs.log10_xs, Tz)
            taua = taua + val * cols[:, j][:, None]
        if op.cont is not None:
            LH2O = op.cont.LH2O
            lg_h2o = om._interp_table_T_log10(op.cont.temp, op.cont.log10_xs_H2O, Tz)
            lg_for = om._interp_table_T_log10(op.cont.temp, op.cont.log10_xs_foreign, Tz)
            foreign_col = jnp.sum(cols, axis=1) - cols[:, LH2O]
            lg_n_h2o = om._safe_log10(densities[:, LH2O])
            taua = taua + 10.0 ** (lg_h2o + (lg_n_h2o + om._safe_log10(cols[:, LH2O]))[:, None])
            taua = taua + 10.0 ** (lg_for + (lg_n_h2o + om._safe_log10(foreign_col))[:, None])
        return jnp.sum(tausg) + jnp.sum(taua)

    def sub_full(P, Tz, d, z):
        o = om.compute_opacity(op, P, Tz, d, z)
        return sum(jnp.sum(v) for v in o.values())

    def timed_cols(stage_fn, K, inputs):
        def f(s0):
            acc = 0.0
            for i in range(K):
                sc = s0 * (1.0 + 1e-6 * i)
                acc = acc + jnp.sum(jax.vmap(stage_fn)(*[x * sc if j < 2 else x
                                                         for j, x in enumerate(inputs)]))
            return acc
        jf = jax.jit(f)
        np.asarray(jf(jnp.float32(1.0)))
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(jf(jnp.float32(1.0 + 1e-6 * (i + 1))))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    def timed_tensor(stage_fn, K, tensor):
        def f(s0):
            acc = 0.0
            for i in range(K):
                acc = acc + jnp.sum(jax.vmap(stage_fn)(tensor * (s0 + 1e-6 * i)))
            return acc
        jf = jax.jit(f)
        np.asarray(jf(jnp.float32(1.0)))
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(jf(jnp.float32(1.0 + 1e-6 * (i + 1))))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    inputs = (P_b, T_b, dens_b, dz_b)

    stages = [
        ("hatw", lambda K: timed_cols(lambda P, Tz, d, z: sub_hatw(P, Tz, d, z), K, inputs)),
        ("ktable_highest", lambda K: timed_cols(make_ktable(jax.lax.Precision.HIGHEST), K, inputs)),
        ("ktable_default", lambda K: timed_cols(make_ktable(jax.lax.Precision.DEFAULT), K, inputs)),
        ("ktable_high", lambda K: timed_cols(make_ktable(jax.lax.Precision.HIGH), K, inputs)),
        ("rorr_pallas", lambda K: timed_tensor(make_rorr(True), K, seed_b)),
        ("rorr_xla", lambda K: timed_tensor(make_rorr(False), K, seed_b)),
        ("contin", lambda K: timed_cols(sub_contin, K, inputs)),
        ("full", lambda K: timed_cols(sub_full, K, inputs)),
    ]
    for name, runner in stages:
        t1 = runner(1)
        tK = runner(args.K)
        per = (tK - t1) / (args.K - 1)
        print(json.dumps({"stage": name, "per_call_ms": per * 1e3,
                          "t1_ms": t1 * 1e3, "tK_ms": tK * 1e3}), flush=True)


if __name__ == "__main__":
    main()
