"""Stage-level timing of compute_opacity on TPU (where 92% of the headline
pipeline's time goes — scripts/bench_profile.py).

Stages timed cumulatively at the bench shapes (B columns x K inner evals):
  kinterp      k-table bilinear interpolation only
  +rorr        + RORR k-mixing (Pallas rank kernel or XLA sort path)
  +cont        + rayleigh/CIA/photolysis/continuum assembly
  full         complete compute_opacity (incl. combine/transposes)
Also times the XLA-sort RORR for comparison (set_rorr_pallas_mode).
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
    from clima_tpu.radtran import opacity as opac
    from clima_tpu.radtran.opacity import (
        compute_opacity, _interp_ktable, _interp_table_T_log10, _safe_log10,
    )
    from clima_tpu.ops.rorr import k_rorr_mix
    from clima_tpu.ops.pallas_rorr import k_rorr_mix_pallas
    from clima_tpu.config import load_settings, load_species

    t = _template(nz=100, n_zenith=4, tag="opacprof")
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

    def tau_species(P, T, dens, dz):
        # nz-minor assembly, mirroring compute_opacity (r4 layout)
        from clima_tpu.radtran.opacity import _interp_ktable_t

        log10P = jnp.log10(P)
        cols = dens * dz[:, None]
        tau_ks = []
        for kt in op.k:
            kcoef = _interp_ktable_t(kt, log10P, T)  # (G, W, nz)
            tau_ks.append(kcoef * cols[:, kt.sp_ind][None, None, :])
        return jnp.stack(tau_ks, axis=0)  # (nk, G, W, nz)

    def kinterp(Ts, T, P, dens, dz):
        return jnp.sum(tau_species(P, T, dens, dz)) + 0.0 * Ts

    def kinterp_rorr(Ts, T, P, dens, dz):
        from clima_tpu.ops.pallas_rorr import k_rorr_mix_pallas_t

        tau_ks = tau_species(P, T, dens, dz)
        nk, G = tau_ks.shape[0], tau_ks.shape[1]
        mixed = k_rorr_mix_pallas_t(
            tau_ks.reshape(nk, G, -1), op.kset.wbin, op.kset.wbin_e
        )
        return jnp.sum(mixed) + 0.0 * Ts

    def kinterp_rorr_xla(Ts, T, P, dens, dz):
        tau_ks = jnp.moveaxis(tau_species(P, T, dens, dz), 1, -1)
        mixed = k_rorr_mix(tau_ks, jnp.asarray(op.kset.wbin_e))
        return jnp.sum(mixed) + 0.0 * Ts

    def continua(Ts, T, P, dens, dz):
        cols = dens * dz[:, None]
        nzl = T.shape[0]
        nw = op.nw
        tausg = jnp.zeros((nzl, nw))
        for xs in op.ray:
            tausg = tausg + jnp.asarray(xs.xs_0d)[None, :] * cols[:, xs.sp_inds[0]][:, None]
        taua = jnp.zeros((nzl, nw))
        for xs in op.cia:
            j, jj = xs.sp_inds
            if xs.dim == 0:
                lgval = _safe_log10(jnp.asarray(xs.xs_0d))[None, :]
            else:
                lgval = _interp_table_T_log10(xs.temp, xs.log10_xs, T)
            lgcol = (
                _safe_log10(dens[:, j]) + _safe_log10(dens[:, jj]) + jnp.log10(dz)
            )
            taua = taua + 10.0 ** (lgval + lgcol[:, None])
        for xs in op.pxs + op.axs:
            j = xs.sp_inds[0]
            if xs.dim == 0:
                val = jnp.asarray(xs.xs_0d)[None, :]
            else:
                val = 10.0 ** _interp_table_T_log10(xs.temp, xs.log10_xs, T)
            taua = taua + val * cols[:, j][:, None]
        if op.cont is not None:
            LH2O = op.cont.LH2O
            lg_h2o = _interp_table_T_log10(op.cont.temp, op.cont.log10_xs_H2O, T)
            lg_for = _interp_table_T_log10(op.cont.temp, op.cont.log10_xs_foreign, T)
            foreign_col = jnp.sum(cols, axis=1) - cols[:, LH2O]
            lg_n_h2o = _safe_log10(dens[:, LH2O])
            taua = taua + 10.0 ** (lg_h2o + (lg_n_h2o + _safe_log10(cols[:, LH2O]))[:, None])
            taua = taua + 10.0 ** (lg_for + (lg_n_h2o + _safe_log10(foreign_col))[:, None])
        return jnp.sum(tausg) + jnp.sum(taua) + 0.0 * Ts

    def full(Ts, T, P, dens, dz):
        opr = compute_opacity(op, P, T, dens, dz)
        return sum(jnp.sum(v) for v in opr.values()) + 0.0 * Ts

    B = int(os.environ.get("BENCH_COLUMNS", "256"))
    K = int(os.environ.get("BENCH_INNER", "8"))
    n_iter = int(os.environ.get("BENCH_ITERS", "4"))

    rng = np.random.default_rng(0)
    T_surf_b = jnp.asarray(rng.uniform(280.0, 295.0, B))
    jitter = rng.uniform(0.95, 1.05, (B, 1))
    T_b = jnp.asarray(T[None, :] * jitter)
    P_b = jnp.asarray(np.repeat(P_bar[None, :], B, axis=0))
    dens_b = jnp.asarray(dens[None, :, :] * jitter[:, :, None])
    dz_b = jnp.asarray(np.repeat(dz[None, :], B, axis=0))

    for name, f in [
        ("kinterp", kinterp),
        ("kinterp+rorr(pallas)", kinterp_rorr),
        ("kinterp+rorr(xla)", kinterp_rorr_xla),
        ("continua", continua),
        ("full", full),
    ]:
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
        print(f"{name:22s} {per_eval_ms:9.3f} ms per (B={B}) eval")


if __name__ == "__main__":
    main()
