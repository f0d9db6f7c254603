"""Isolate the r4 headline regression: time the FULL bench chain under
different hot-path configurations.

Configs:
  base      : shipped configuration (pdot=HIGHEST, fused Pallas weights)
  pdot_def  : opacity interp matmuls at default (bf16 MXU) precision
  pdot_high : opacity interp matmuls at Precision.HIGH (3-pass bf16)
  nofuse    : unfused Pallas two-stream + XLA DEFAULT-precision reductions
  xla       : no Pallas at all (XLA twostream path)
  noamean   : (solar amean already off in bench)

Usage: python scripts/bench_experiments.py [--configs base,pdot_def,...]
Prints one JSON line per config: per-call seconds and solves/s.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_inputs():
    import jax.numpy as jnp
    from __graft_entry__ import _template
    from clima_tpu.radtran import data as data_mod
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

    B = int(os.environ.get("BENCH_COLUMNS", "256"))
    rng = np.random.default_rng(0)
    T_surf_b = jnp.asarray(rng.uniform(280.0, 295.0, B))
    jitter = rng.uniform(0.95, 1.05, (B, 1))
    T_b = jnp.asarray(T[None, :] * jitter)
    P_b = jnp.asarray(np.repeat(P_bar[None, :], B, axis=0))
    dens_b = jnp.asarray(dens[None, :, :] * jitter[:, :, None])
    dz_b = jnp.asarray(np.repeat(dz[None, :], B, axis=0))
    return dict(op=op, ir=ir, sol=sol, photons=photons, zen_u=zen_u, zw=zw,
                n_zen=n_zen, B=B,
                inputs=(T_surf_b, T_b, P_b, dens_b, dz_b))


def make_fn(ctx, K):
    import jax
    import jax.numpy as jnp
    from clima_tpu.radtran.opacity import compute_opacity
    from clima_tpu.radtran.radiate import radiate_ir, radiate_solar, integrate_fluxes

    op, ir, sol = ctx["op"], ctx["ir"], ctx["sol"]
    freq_master = jnp.asarray(op.freq)
    wavl_master = jnp.asarray(op.wavl)
    wbin = jnp.asarray(op.kset.wbin)
    emis = jnp.ones(ir.nw)
    alb = jnp.full(sol.nw, 0.25)
    ir_slice = (ir.ind_start, ir.ind_end)
    sol_slice = (sol.ind_start, sol.ind_end)
    photons = ctx["photons"]
    zen_u, zw = ctx["zen_u"], ctx["zw"]

    def radiate_one(T_surf, T, P, dens, dz):
        opr = compute_opacity(op, P, T, dens, dz)
        r_ir = radiate_ir(ir_slice, freq_master, wbin, opr, emis, True, 1e-6, T_surf, T)
        fup_ir, fdn_ir = integrate_fluxes(
            r_ir["fup_a"], r_ir["fdn_a"], freq_master[ir_slice[0]: ir_slice[1] + 2]
        )
        r_sol = radiate_solar(
            sol_slice, freq_master, wavl_master, wbin, opr, alb, 0.5,
            jnp.asarray(photons), jnp.asarray(zen_u), jnp.asarray(zw),
            compute_amean=False,
        )
        fup_sol, fdn_sol = integrate_fluxes(
            r_sol["fup_a"], r_sol["fdn_a"], freq_master[sol_slice[0]: sol_slice[1] + 2]
        )
        return fdn_sol[-1] - fup_sol[-1], -(fdn_ir[-1] - fup_ir[-1])

    def radiate_many(T_surf, T, P, dens, dz):
        acc_isr, acc_olr = 0.0, 0.0
        for i in range(K):
            s = 1.0 + 1e-6 * i
            isr, olr = radiate_one(T_surf * s, T * s, P, dens * s, dz)
            acc_isr = acc_isr + isr
            acc_olr = acc_olr + olr
        return acc_isr, acc_olr

    return jax.jit(jax.vmap(radiate_many))


def time_fn(fn, inputs, n_iter):
    T_surf_b = inputs[0]
    out = fn(*inputs)
    np.asarray(out[0])
    times = []
    for i in range(n_iter):
        t0 = time.perf_counter()
        out = fn(T_surf_b * (1.0 + 1e-6 * i), *inputs[1:])
        np.asarray(out[0])
        times.append(time.perf_counter() - t0)
    # median per-iteration time: robust to relay hiccups (single dispatches
    # through the axon tunnel occasionally stall ~1 s)
    return float(np.median(times))


def apply_config(name):
    """Monkeypatch the hot path per config. Returns an undo callable."""
    import jax
    import jax.numpy as jnp
    from clima_tpu.radtran import opacity as op_mod
    from clima_tpu.ops import twostream as ts

    undos = []

    def set_pdot(prec):
        orig = op_mod.pdot
        f = lambda a, b: jnp.matmul(a, b, precision=prec)
        op_mod.pdot = f
        undos.append(lambda: setattr(op_mod, "pdot", orig))

    if name == "base":
        pass
    elif name == "pdot_def":
        set_pdot(jax.lax.Precision.DEFAULT)
    elif name == "pdot_high":
        set_pdot(jax.lax.Precision.HIGH)
    elif name == "nofuse":
        # unfused pallas kernels + DEFAULT-precision XLA reductions
        from clima_tpu.ops import pallas_twostream as pts

        def solar_w(tau, w0, gt, u0s, Rsfc, zw, wbin, with_amean=True):
            amean, _, fup, fdn = pts.two_stream_solar_multi_pallas(
                tau, w0, gt, u0s, Rsfc)
            nG = wbin.shape[0]
            nw = tau.shape[0] // nG
            unflat = lambda x: x.reshape(u0s.shape[0], nw, nG, -1)
            red = lambda x: jnp.einsum("zwgk,g,z->wk", unflat(x), wbin, zw)
            return (red(amean) if with_amean else None), red(fup), red(fdn)

        def ir_w(tau, w0, gt, emis, hard, tmin, bpl, wbin):
            fup, fdn = pts.two_stream_ir_pallas(tau, w0, gt, emis, hard, tmin, bpl)
            nG = wbin.shape[0]
            nw = tau.shape[0] // nG
            red = lambda x: jnp.einsum("wgk,g->wk",
                                       x.reshape(nw, nG, -1), wbin)
            return red(fup), red(fdn)

        from clima_tpu.radtran import radiate as rad
        o1, o2 = rad.two_stream_solar_multi_weighted_auto, rad.two_stream_ir_weighted_auto
        rad.two_stream_solar_multi_weighted_auto = solar_w
        rad.two_stream_ir_weighted_auto = ir_w
        undos.append(lambda: (setattr(rad, "two_stream_solar_multi_weighted_auto", o1),
                              setattr(rad, "two_stream_ir_weighted_auto", o2)))
    elif name == "xla":
        ts.set_pallas_mode("never")
        undos.append(lambda: ts.set_pallas_mode("auto"))
    elif name == "pdot_def_nofuse":
        set_pdot(jax.lax.Precision.DEFAULT)
        undo1 = apply_config("nofuse")
        undos.append(undo1)
    else:
        raise ValueError(name)

    def undo():
        for u in reversed(undos):
            u()
    return undo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="base,pdot_def,pdot_high,nofuse")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--K", type=int, default=8)
    args = ap.parse_args()

    ctx = build_inputs()
    B = ctx["B"]
    op, ir, sol, n_zen = ctx["op"], ctx["ir"], ctx["sol"], ctx["n_zen"]
    ngauss = op.kset.nbin
    solves_per_column = ir.nw * ngauss * 1 + sol.nw * ngauss * n_zen

    for name in args.configs.split(","):
        undo = apply_config(name)
        try:
            fn = make_fn(ctx, args.K)
            per_call = time_fn(fn, ctx["inputs"], args.iters)
        finally:
            undo()
        total = solves_per_column * B * args.K
        print(json.dumps({
            "config": name, "per_call_s": per_call,
            "solves_per_s": total / per_call, "B": B, "K": args.K,
        }), flush=True)


if __name__ == "__main__":
    main()
