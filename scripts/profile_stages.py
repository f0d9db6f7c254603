"""Stage-level TPU timing for the headline bench workload.

Times compute_opacity / radiate_ir / radiate_solar separately (and the full
chain) at the bench configuration, using the K-repeat slope method to cancel
relay dispatch overhead (see CLAUDE.md). Prints one JSON line per stage.

Usage: python scripts/profile_stages.py [--columns 256] [--iters 5]
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

    B = args.columns
    rng = np.random.default_rng(0)
    jitter = rng.uniform(0.95, 1.05, (B, 1))
    T_surf_b = jnp.asarray(rng.uniform(280.0, 295.0, B))
    T_b = jnp.asarray(T[None, :] * jitter)
    P_b = jnp.asarray(np.repeat(P_bar[None, :], B, axis=0))
    dens_b = jnp.asarray(dens[None, :, :] * jitter[:, :, None])
    dz_b = jnp.asarray(np.repeat(dz[None, :], B, axis=0))

    # one representative opacity result for the RT-only stages
    op_one = jax.jit(jax.vmap(lambda P, Tz, d, z: compute_opacity(op, P, Tz, d, z)))(
        P_b, T_b, dens_b, dz_b
    )
    op_one = jax.tree.map(lambda x: np.asarray(x), op_one)
    op_b = jax.tree.map(jnp.asarray, op_one)

    def _sum(tree):
        leaves = jax.tree.leaves(tree)
        return sum(jnp.sum(l) for l in leaves)

    def stage_opacity(scale):
        o = jax.vmap(lambda P, Tz, d, z: compute_opacity(op, P, Tz, d, z))(
            P_b, T_b * scale, dens_b * scale, dz_b
        )
        return _sum(o)

    def stage_ir(scale):
        o = jax.tree.map(lambda x: x * scale, op_b)
        r = jax.vmap(
            lambda opr, Ts, Tz: _sum(
                radiate_ir(ir_slice, freq_master, wbin, opr, emis, True, 1e-6, Ts, Tz)
            )
        )(o, T_surf_b * scale, T_b * scale)
        return jnp.sum(r)

    def stage_solar(scale):
        o = jax.tree.map(lambda x: x * scale, op_b)
        r = jax.vmap(
            lambda opr: _sum(
                radiate_solar(
                    sol_slice, freq_master, wavl_master, wbin, opr, alb, 0.5,
                    jnp.asarray(photons), jnp.asarray(zen_u), jnp.asarray(zw),
                )
            )
        )(o)
        return jnp.sum(r)

    def timed(stage_fn, K):
        def f(s0):
            acc = 0.0
            for i in range(K):
                acc = acc + stage_fn(s0 * (1.0 + 1e-6 * i))
            return acc

        jf = jax.jit(f)
        np.asarray(jf(jnp.float32(1.0)))  # compile+warm
        t0 = time.perf_counter()
        for i in range(args.iters):
            np.asarray(jf(jnp.float32(1.0 + 1e-6 * (i + 1))))
        return (time.perf_counter() - t0) / args.iters

    K = args.K
    out = {}
    for name, fn in [("opacity", stage_opacity), ("ir", stage_ir), ("solar", stage_solar)]:
        t1 = timed(fn, 1)
        tK = timed(fn, K)
        per = (tK - t1) / (K - 1)
        out[name] = dict(per_call_ms=per * 1e3, t1_ms=t1 * 1e3, tK_ms=tK * 1e3)
        print(json.dumps({"stage": name, **out[name]}))

    total = sum(v["per_call_ms"] for v in out.values())
    print(json.dumps({"stage": "sum", "per_call_ms": total,
                      "columns": B, "device": jax.devices()[0].device_kind}))


if __name__ == "__main__":
    main()
