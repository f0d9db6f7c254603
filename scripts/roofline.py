"""Kernel roofline evidence (BASELINE.md: HBM-bandwidth-limited kernels).

Measures achieved HBM bandwidth (GB/s, counting compulsory traffic: bytes
read + written at the kernel boundary) and throughput for the hot kernels
on the current backend:

  - fused Pallas two-stream (IR + solar) at the flagship batch
  - fused rank-based Pallas RORR k-mixing chain

and reports each against the chip's nominal peak (v5e: 819 GB/s). RORR is
ALU-limited by construction (nbin^2 compares per pair on nbin^2+2nbin floats
of traffic), so its roofline ceiling is the VPU, not HBM — each number is
printed with its limiting resource.

Measurement method: per-call dispatch + relay-sync overhead in this
environment is tens of ms with high variance, so each kernel is applied K
times on distinctly-scaled inputs inside ONE jit and timed at K=1 and K=9;
the per-application time is the slope (T_9 - T_1) / 8, which cancels the
fixed overhead. Sync is by round-tripping a scalar (np.asarray) — the repo
convention (jax.block_until_ready is unreliable through the relay).

Usage: python scripts/roofline.py [--columns 256] [--iters 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

HBM_PEAK_GBS = {"tpu v5e": 819.0, "tpu v5 lite": 819.0}


def _time(fn, args, iters, vary_index=0):
    import numpy as np

    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for i in range(iters):
        a = list(args)
        a[vary_index] = a[vary_index] * (1.0 + 1e-6 * (i + 1))
        np.asarray(fn(*a))
    return (time.perf_counter() - t0) / iters


def _slope(make_f, args, iters, K=9):
    """Per-application time via the K-repeat slope (cancels fixed overhead)."""
    t1 = _time(make_f(1), args, iters)
    tK = _time(make_f(K), args, iters)
    return max((tK - t1) / (K - 1), 1e-9), t1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--columns", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--nz", type=int, default=202)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from clima_tpu.ops.twostream import (
        two_stream_ir_auto,
        two_stream_solar_auto,
        two_stream_solar_multi_auto,
    )
    from clima_tpu.ops.pallas_rorr import k_rorr_mix_pallas
    from clima_tpu.physics.eqns import planck_fcn

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown").lower()
    peak = next((v for k, v in HBM_PEAK_GBS.items() if k in kind), None)

    B = args.columns * 60 * 8  # columns x bins x gauss, flagship-ish flat batch
    nz = args.nz
    itemsize = 4
    rng = np.random.default_rng(0)

    results = []

    # --- two-stream IR ---
    tau = jnp.asarray(rng.uniform(1e-6, 2.0, (B, nz)), dtype=jnp.float32)
    w0 = jnp.asarray(rng.uniform(0.02, 0.999, (B, nz)), dtype=jnp.float32)
    gt = jnp.asarray(rng.uniform(0.0, 0.85, (B, nz)), dtype=jnp.float32)
    emis = jnp.full((B,), 0.95, dtype=jnp.float32)
    Tprof = np.linspace(290.0, 180.0, nz + 1)
    bpl = jnp.asarray(
        np.asarray(planck_fcn(2.0e13, jnp.asarray(Tprof)))[None, :].repeat(B, 0),
        dtype=jnp.float32,
    )

    def make_ir(K):
        def f(t, w, g, e, b):
            acc = 0.0
            for i in range(K):
                fup, fdn = two_stream_ir_auto(
                    t * (1.0 + 1e-6 * i), w, g, e, True, 1e-6, b
                )
                acc = acc + fup.sum() + fdn.sum()
            return acc

        return jax.jit(f)

    dt, _ = _slope(make_ir, (tau, w0, gt, emis, bpl), args.iters)
    bytes_ir = (3 * B * nz + B * (nz + 1) + B + 2 * B * (nz + 1)) * itemsize
    results.append(
        dict(kernel="two_stream_ir", time_ms=dt * 1e3,
             solves_per_s=B / dt, achieved_GBs=bytes_ir / dt / 1e9,
             limiter="HBM")
    )

    # --- two-stream solar ---
    u0 = jnp.asarray(rng.uniform(0.2, 1.0, B), dtype=jnp.float32)
    rs = jnp.asarray(rng.uniform(0.0, 0.6, B), dtype=jnp.float32)

    def make_sol(K):
        def f(t, w, g, u, r):
            acc = 0.0
            for i in range(K):
                outs = two_stream_solar_auto(t * (1.0 + 1e-6 * i), w, g, u, r)
                acc = acc + outs[0].sum() + outs[1].sum()
            return acc

        return jax.jit(f)

    dt, _ = _slope(make_sol, (tau, w0, gt, u0, rs), args.iters)
    bytes_sol = (3 * B * nz + 2 * B + 3 * B * (nz + 1)) * itemsize
    results.append(
        dict(kernel="two_stream_solar", time_ms=dt * 1e3,
             solves_per_s=B / dt, achieved_GBs=bytes_sol / dt / 1e9,
             limiter="HBM")
    )

    # --- multi-zenith solar (shared matrix, 4 RHS — the production path) ---
    nzen = 4
    u0s = jnp.asarray(rng.uniform(0.2, 1.0, nzen), dtype=jnp.float32)

    def make_sol_multi(K):
        def f(t, w, g, r):
            acc = 0.0
            for i in range(K):
                outs = two_stream_solar_multi_auto(
                    t * (1.0 + 1e-6 * i), w, g, u0s, r
                )
                acc = acc + outs[0].sum() + outs[2].sum()
            return acc

        return jax.jit(f)

    dt, _ = _slope(make_sol_multi, (tau, w0, gt, rs), args.iters)
    bytes_solm = (3 * B * nz + B + 3 * nzen * B * (nz + 1)) * itemsize
    results.append(
        dict(kernel="two_stream_solar_multi4", time_ms=dt * 1e3,
             solves_per_s=nzen * B / dt, achieved_GBs=bytes_solm / dt / 1e9,
             limiter="HBM")
    )

    # --- rank-RORR mixing chain (3 species) ---
    nk, nbin = 3, 8
    R = args.columns * 60 * nz  # columns x bins x layers rows
    tau_ks = jnp.asarray(rng.lognormal(0, 2, (nk, R, nbin)).astype(np.float32))
    wbin = np.full(nbin, 1.0 / nbin)
    wbin_e = np.concatenate([[0.0], np.cumsum(wbin)])

    def make_mix(K):
        def f(tk):
            acc = 0.0
            for i in range(K):
                acc = acc + k_rorr_mix_pallas(
                    tk * (1.0 + 1e-6 * i), wbin, wbin_e
                ).sum()
            return acc

        return jax.jit(f)

    dt, _ = _slope(make_mix, (tau_ks,), args.iters)
    bytes_mix = (nk * R * nbin + R * nbin) * itemsize
    results.append(
        dict(kernel="rorr_rank_mix_3sp", time_ms=dt * 1e3,
             mixes_per_s=R / dt, achieved_GBs=bytes_mix / dt / 1e9,
             limiter="VPU (nbin^2 compares/pair)")
    )

    for r in results:
        r["device_kind"] = kind
        if peak and r["limiter"] == "HBM":
            r["fraction_of_HBM_peak"] = r["achieved_GBs"] / peak
        print(json.dumps(r))


if __name__ == "__main__":
    main()
