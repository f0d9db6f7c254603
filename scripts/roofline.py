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
    """Best-of-iters single-dispatch wall time (min is the right statistic
    against the relay's long-tailed latency noise)."""
    import numpy as np

    out = fn(*args)
    np.asarray(out)
    best = float("inf")
    for i in range(iters):
        a = list(args)
        a[vary_index] = a[vary_index] * (1.0 + 1e-6 * (i + 1))
        t0 = time.perf_counter()
        np.asarray(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def _slope(make_f, args, iters, K=25):
    """Per-application time via the K-repeat slope (cancels fixed overhead).

    K=25 with best-of timing: the relay round-trip carries tens of ms of
    long-tailed noise, and at K=9 the slope of a ~1 ms kernel is smaller
    than that noise — ROOFLINE_r03's two_stream_ir '1.28 ms / 57% of HBM
    peak' was exactly this artifact (the repeatable r4 measurement is
    ~7.6 ms, VPU-bound).
    """
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
    # ~350 f32 ops/element: coefficients (exp/sqrt/div) ~35, Planck-source
    # rows ~35, 8 block-PCR sweeps x ~35, flux reconstruction ~10. At
    # measured dt this runs ~1.1 TFLOP/s — VPU-bound (arithmetic intensity
    # ~37 flops/byte is far above the v5e balance point ~5), NOT HBM-bound
    ops_ir = 350.0
    results.append(
        dict(kernel="two_stream_ir", time_ms=dt * 1e3,
             solves_per_s=B / dt, achieved_GBs=bytes_ir / dt / 1e9,
             achieved_TFlops=B * nz * ops_ir / dt / 1e12,
             flops_per_element_est=ops_ir,
             limiter="VPU (fused two-stream is compute-bound)")
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
    ops_sol = 450.0  # + delta-Eddington scaling, direct beam, amean
    results.append(
        dict(kernel="two_stream_solar", time_ms=dt * 1e3,
             solves_per_s=B / dt, achieved_GBs=bytes_sol / dt / 1e9,
             achieved_TFlops=B * nz * ops_sol / dt / 1e12,
             flops_per_element_est=ops_sol,
             limiter="VPU (fused two-stream is compute-bound)")
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
    # shared elimination ~350 + 4 zeniths x (particular solutions + RHS
    # sweeps + flux) ~110 each. Empirical proof of the VPU limiter: the
    # weight-fused variant below removes ~75% of the HBM write traffic and
    # moves wall time by only ~7%
    ops_solm = 350.0 + nzen * 110.0
    results.append(
        dict(kernel="two_stream_solar_multi4", time_ms=dt * 1e3,
             solves_per_s=nzen * B / dt, achieved_GBs=bytes_solm / dt / 1e9,
             achieved_TFlops=B * nz * ops_solm / dt / 1e12,
             flops_per_element_est=ops_solm,
             limiter="VPU (multi-RHS PCR + per-zenith sources)")
    )

    # --- weight-fused production kernels (VERDICT r4: the solar kernel
    # wrote (nzen, B, nz+1) x3 arrays the driver immediately contracted;
    # the fused kernels reduce in VMEM, cutting write traffic nzen*nG-fold)
    nG = 8
    wbin_w = jnp.asarray(np.full(nG, 1.0 / nG), jnp.float32)
    zw4 = jnp.asarray(rng.uniform(0.1, 0.5, 4), jnp.float32)
    from clima_tpu.ops.twostream import (
        two_stream_ir_weighted_auto,
        two_stream_solar_multi_weighted_auto,
    )

    def make_irw(K):
        def f(t, w, g, e, b):
            acc = 0.0
            for i in range(K):
                fup, fdn = two_stream_ir_weighted_auto(
                    t * (1.0 + 1e-6 * i), w, g, e, True, 1e-6, b, wbin_w
                )
                acc = acc + fup.sum() + fdn.sum()
            return acc

        return jax.jit(f)

    dt, _ = _slope(make_irw, (tau, w0, gt, emis, bpl), args.iters)
    bytes_irw = (3 * B * nz + B * (nz + 1) + B
                 + 2 * (B // nG) * (nz + 1)) * itemsize
    results.append(
        dict(kernel="two_stream_ir_weighted", time_ms=dt * 1e3,
             solves_per_s=B / dt, achieved_GBs=bytes_irw / dt / 1e9,
             achieved_TFlops=B * nz * 355.0 / dt / 1e12,
             limiter="VPU (compute-bound; fused gauss reduction)")
    )

    def make_solw(K):
        def f(t, w, g, r):
            acc = 0.0
            for i in range(K):
                am, fup, fdn = two_stream_solar_multi_weighted_auto(
                    t * (1.0 + 1e-6 * i), w, g, u0s, r, zw4, wbin_w
                )
                acc = acc + am.sum() + fup.sum() + fdn.sum()
            return acc

        return jax.jit(f)

    dt, _ = _slope(make_solw, (tau, w0, gt, rs), args.iters)
    bytes_solw = (3 * B * nz + B + 3 * (B // nG) * (nz + 1)) * itemsize
    results.append(
        dict(kernel="two_stream_solar_multi4_weighted", time_ms=dt * 1e3,
             solves_per_s=nzen * B / dt, achieved_GBs=bytes_solw / dt / 1e9,
             achieved_TFlops=B * nz * (350.0 + nzen * 110.0) / dt / 1e12,
             limiter="VPU (compute-bound; fused zenith+gauss reduction)")
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

    # --- opacity stage (VERDICT r4 item 4: 92% of pipeline time had no
    # roofline entry). Measures the k-table hat-basis interpolation matmul
    # (BASELINE names it a speed-of-light kernel) and the full
    # compute_opacity at bench shapes, vmapped over columns.
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _template
    from clima_tpu.config import load_settings, load_species
    from clima_tpu.radtran import data as data_mod
    from clima_tpu.radtran.opacity import compute_opacity, _interp_ktable

    t = _template(nz=100, n_zenith=4, tag="bench")
    s = load_settings(t["settings"])
    sp = load_species(t["species"])
    op = data_mod.load_optical_data(t["datadir"], sp.gas_names, [], s.op)
    Bc = args.columns
    nzc = 2 * 100 + 2
    zc = np.linspace(0.0, 7.0e6, nzc)
    T1 = np.maximum(288.0 - 6.5e-5 * zc, 200.0)
    P1 = 1.013 * np.exp(-zc / 8.0e5)
    den = P1 * 1.0e6 / (1.380649e-16 * T1)
    mix = np.full((nzc, sp.ng), 1e-6)
    mix[:, sp.gas_names.index("N2")] = 0.78
    dens1 = mix * den[:, None]
    jitter = rng.uniform(0.95, 1.05, (Bc, 1))
    T_b = jnp.asarray(T1[None, :] * jitter, jnp.float32)
    P_b = jnp.asarray(np.repeat(P1[None, :], Bc, 0), jnp.float32)
    dens_b = jnp.asarray(dens1[None] * jitter[:, :, None], jnp.float32)
    dz_b = jnp.asarray(np.full((Bc, nzc), 7.0e6 / nzc), jnp.float32)

    kt = op.k[0]
    G, Pn, Tn, Wn = np.asarray(kt.log10k).shape

    def make_kinterp(K):
        def f(P, T):
            acc = 0.0
            for i in range(K):
                k = jax.vmap(
                    lambda p, t: _interp_ktable(kt, jnp.log10(p), t)
                )(P, T * (1.0 + 1e-6 * i))
                acc = acc + k.sum()
            return acc

        return jax.jit(f)

    dt, _ = _slope(make_kinterp, (P_b, T_b), args.iters)
    # boundary traffic: write (B, nz, G, W) + read P/T; the (P*T, G*W) table
    # is VMEM-resident across the batch
    bytes_ki = (Bc * nzc * G * Wn + 2 * Bc * nzc) * itemsize
    results.append(
        dict(kernel="kinterp_hat_matmul_f32full", time_ms=dt * 1e3,
             interps_per_s=Bc * nzc / dt, achieved_GBs=bytes_ki / dt / 1e9,
             limiter="HBM",
             note="Precision.HIGHEST (6-pass MXU; bf16 single-pass "
                  "quantizes opacities ~0.4% — a correctness bug)")
    )

    def make_opac(K):
        def f(P, T, dens, dz):
            acc = 0.0
            for i in range(K):
                o = jax.vmap(
                    lambda p, t, d, z: compute_opacity(op, p, t * (1.0 + 1e-6 * i), d, z)
                )(P, T, dens, dz)
                acc = acc + o["tau"].sum() + o["w0"].sum() + o["g"].sum()
            return acc

        return jax.jit(f)

    dt, _ = _slope(make_opac, (P_b, T_b, dens_b, dz_b), args.iters)
    nw_tot = op.nw
    nbin_o = op.kset.nbin
    bytes_op = (Bc * (2 * nw_tot * nbin_o * nzc + 2 * nw_tot * nzc)
                + Bc * nzc * (sp.ng + 3)) * itemsize
    results.append(
        dict(kernel="compute_opacity_full", time_ms=dt * 1e3,
             columns_per_s=Bc / dt, achieved_GBs=bytes_op / dt / 1e9,
             limiter="HBM (outputs) + VPU (RORR)")
    )

    for r in results:
        r["device_kind"] = kind
        if peak and r["limiter"] == "HBM":
            r["fraction_of_HBM_peak"] = r["achieved_GBs"] / peak
        print(json.dumps(r))


if __name__ == "__main__":
    main()
