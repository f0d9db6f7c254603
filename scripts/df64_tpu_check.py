"""On-TPU validation of the df64 (float32-pair) precision layer.

The error-free transforms in ops/df64.py assume IEEE f32 add/mul/sub per op.
This must be verified on the REAL chip (interpret/CPU tests can't catch a
TPU-specific rounding or subnormal behavior): this script runs the df64
building blocks and the full df64 two-stream kernels on the device and
compares against float64 numpy evaluated on the host, then times the df64 IR
two-stream against the plain-f32 path at bench-like shapes.

Writes a JSON artifact (default DF64_TPU.json at the repo root).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _val(x):
    return np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)


def main(out_path="DF64_TPU.json"):
    import jax
    import jax.numpy as jnp

    from clima_tpu.ops import df64
    from clima_tpu.ops.df64 import DF, to_df
    from clima_tpu.ops.twostream_df import (
        two_stream_ir_df, two_stream_solar_multi_df, planck_fcn_df,
    )
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_tridiag_twostream import np_two_stream_ir, np_two_stream_solar

    res = {"device": str(jax.devices()[0].platform)}
    rng = np.random.default_rng(0)

    # --- arithmetic: +-*/ vs f64 on f32 inputs --------------------------
    a64 = rng.uniform(-1e6, 1e6, 4096)
    b64 = rng.uniform(1.0, 1e6, 4096) * np.sign(rng.uniform(-1, 1, 4096))
    a32 = jnp.asarray(a64.astype(np.float32)); a64 = np.asarray(a32, np.float64)
    b32 = jnp.asarray(b64.astype(np.float32)); b64 = np.asarray(b32, np.float64)

    @jax.jit
    def arith(a, b):
        A, B = to_df(a), to_df(b)
        return (A + B, A - B, A * B, A / B, df64.df_sqrt(A * A),
                df64.df_exp(B / 1e5))

    outs = arith(a32, b32)
    refs = [a64 + b64, a64 - b64, a64 * b64, a64 / b64, np.abs(a64),
            np.exp(b64 / 1e5)]
    for name, o, r in zip(["add", "sub", "mul", "div", "sqrt", "exp"], outs, refs):
        err = float(np.max(np.abs(_val(o) - r) / np.maximum(np.abs(r), 1e-30)))
        res[f"arith_{name}_relerr"] = err

    # --- planck --------------------------------------------------------
    nu = np.logspace(12.5, 14.5, 256)
    T = np.linspace(150.0, 600.0, 256)
    nu32 = nu.astype(np.float32); T32 = T.astype(np.float32)
    # host f64 reference (pure numpy, same formula as physics.eqns)
    from clima_tpu import constants as const
    h, c, kb = const.plank, const.c_light, const.k_boltz_si
    x = h * nu32.astype(np.float64) / (kb * T32.astype(np.float64))
    ref_b = 2.0e3 * (h * nu32.astype(np.float64) / c) * (nu32.astype(np.float64) / c) \
        * nu32.astype(np.float64) / np.expm1(x)
    out_b = jax.jit(planck_fcn_df)(jnp.asarray(nu32), jnp.asarray(T32))
    res["planck_relerr"] = float(np.max(np.abs(_val(out_b) - ref_b) / ref_b))

    # --- two-stream IR + solar vs f64 oracle ---------------------------
    nz, nb = 50, 16
    tau = rng.uniform(1e-4, 2.0, (nb, nz)).astype(np.float32)
    w0 = rng.uniform(0.05, 0.95, (nb, nz)).astype(np.float32)
    gt = rng.uniform(0.0, 0.8, (nb, nz)).astype(np.float32)
    bplanck = rng.uniform(2.0, 10.0, (nb, nz + 1)).astype(np.float32)
    emis = np.full(nb, 0.92, np.float32)
    fup, fdn = jax.jit(
        lambda t, w, g, e, b: two_stream_ir_df(t, w, g, e, True, 1e-6, b)
    )(jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt),
      jnp.asarray(emis), jnp.asarray(bplanck))
    err_ir = 0.0
    for b in range(nb):
        fo, do = np_two_stream_ir(
            tau[b].astype(np.float64), w0[b].astype(np.float64),
            gt[b].astype(np.float64), 0.92, True, 1e-6,
            bplanck[b].astype(np.float64))
        scale = np.abs(fo).max()
        err_ir = max(err_ir,
                     float(np.max(np.abs(_val(fup)[b] - fo)) / scale),
                     float(np.max(np.abs(_val(fdn)[b] - do)) / scale))
    res["ir_df_vs_f64_relerr"] = err_ir

    u0s = np.array([0.25, 0.7], np.float32)
    fups, fdns = jax.jit(
        lambda t, w, g, u, r: two_stream_solar_multi_df(t, w, g, u, r)
    )(jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt), jnp.asarray(u0s),
      jnp.full(nb, 0.3, np.float32))
    err_sol = 0.0
    for zi, u0 in enumerate(u0s):
        for b in range(nb):
            _, _, fo, do = np_two_stream_solar(
                tau[b].astype(np.float64), w0[b].astype(np.float64),
                gt[b].astype(np.float64), float(u0), 0.3)
            scale = max(np.abs(fo).max(), np.abs(do).max())
            err_sol = max(
                err_sol,
                float(np.max(np.abs(_val(fups)[zi, b] - fo)) / scale),
                float(np.max(np.abs(_val(fdns)[zi, b] - do)) / scale))
    res["solar_df_vs_f64_relerr"] = err_sol

    # --- timing: df64 IR vs plain f32 IR at bench-like shapes ----------
    from clima_tpu.ops.twostream import two_stream_ir

    B, nzb = 4096, 101
    taub = jnp.asarray(rng.uniform(1e-4, 2.0, (B, nzb)).astype(np.float32))
    w0b = jnp.asarray(rng.uniform(0.05, 0.95, (B, nzb)).astype(np.float32))
    gtb = jnp.asarray(rng.uniform(0.0, 0.8, (B, nzb)).astype(np.float32))
    bpb = jnp.asarray(rng.uniform(2.0, 10.0, (B, nzb + 1)).astype(np.float32))
    emb = jnp.full(B, 0.92, jnp.float32)
    K = 4

    def many_df(t, w, g, e, b):
        acc = 0.0
        for i in range(K):
            fu, fd = two_stream_ir_df(t * (1.0 + 1e-6 * i), w, g, e, True,
                                      1e-6, b)
            acc = acc + jnp.sum(fu.hi) + jnp.sum(fd.hi)
        return acc

    def many_f32(t, w, g, e, b):
        acc = 0.0
        for i in range(K):
            fu, fd = two_stream_ir(t * (1.0 + 1e-6 * i), w, g, e, True,
                                   1e-6, b)
            acc = acc + jnp.sum(fu) + jnp.sum(fd)
        return acc

    for name, f in [("ir_df64", many_df), ("ir_f32", many_f32)]:
        fn = jax.jit(f)
        np.asarray(fn(taub, w0b, gtb, emb, bpb))
        t0 = time.perf_counter()
        n_it = 5
        for i in range(n_it):
            np.asarray(fn(taub * (1.0 + 1e-6 * i), w0b, gtb, emb, bpb))
        dt = (time.perf_counter() - t0) / (n_it * K)
        res[f"{name}_ms_per_eval_B{B}"] = dt * 1e3

    res["df64_overhead_x"] = (res[f"ir_df64_ms_per_eval_B{B}"]
                              / res[f"ir_f32_ms_per_eval_B{B}"])
    print(json.dumps(res, indent=2))
    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main(*sys.argv[1:])
