"""Measure the Pallas-rank vs XLA-sort RORR crossover in nbin (VERDICT r1 item 9).

The fused rank-based Pallas RORR kernel does O(nbin^2) unrolled compares per
rebin edge (O(nbin^4) work per species pair) entirely in VMEM, vs the XLA
path's variadic lax.sort + clipped-reduction rebin (O(nbin^2 log nbin)
work but gather/sort-bound). This script times both on identically-shaped
synthetic k-distribution chains across nbin and prints a JSON table with the
measured per-mix times and the crossover, used to justify the nbin<=16
dispatch guard in clima_tpu.radtran.opacity (compute_opacity).

Timing follows the repo convention: K-repeat slope inside one jit, synced by
np.asarray round-trip (jax.block_until_ready is unreliable via the relay).

Usage: python scripts/rorr_crossover.py [--out RORR_CROSSOVER.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _time_slope(fn_k, args, iters=3, K=5):
    t = {}
    for k in (1, K):
        f = fn_k(k)
        out = f(*args)
        np.asarray(out)
        t0 = time.perf_counter()
        for i in range(iters):
            a = [args[0] * (1.0 + 1e-6 * (i + 1))] + list(args[1:])
            np.asarray(f(*a))
        t[k] = (time.perf_counter() - t0) / iters
    return max((t[K] - t[1]) / (K - 1), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--nbins", type=int, nargs="*", default=[4, 8, 16, 24, 32])
    ap.add_argument("--nk", type=int, default=3, help="species in the mix chain")
    ap.add_argument("--nw", type=int, default=128)
    ap.add_argument("--nz", type=int, default=202)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from clima_tpu.ops.rorr import k_rorr_mix

    try:
        from clima_tpu.ops.pallas_rorr import k_rorr_mix_pallas

        has_pallas = True
    except Exception:
        has_pallas = False

    platform = jax.devices()[0].platform
    rows = []
    rng = np.random.default_rng(0)
    for nbin in args.nbins:
        # Gauss-Legendre weights on [0,1] like the reference k-tables
        x, w = np.polynomial.legendre.leggauss(nbin)
        wbin = (w / 2.0).astype(np.float64)
        wbin_e = np.concatenate([[0.0], np.cumsum(wbin)])
        wbin_e[-1] = 1.0
        tau = jnp.asarray(
            10.0 ** rng.uniform(-6, 2, (args.nk, args.nw, args.nz, nbin))
        )

        def xla_k(k):
            def f(t):
                acc = 0.0
                for i in range(k):
                    acc = acc + k_rorr_mix(t * (1.0 + 1e-7 * i), jnp.asarray(wbin_e))
                return jnp.sum(acc)

            return jax.jit(f)

        t_xla = _time_slope(xla_k, (tau,))
        row = dict(nbin=nbin, t_xla_s=t_xla)

        if has_pallas and platform != "cpu":
            def pallas_k(k):
                def f(t):
                    acc = 0.0
                    for i in range(k):
                        acc = acc + k_rorr_mix_pallas(
                            t * (1.0 + 1e-7 * i), wbin, wbin_e
                        )
                    return jnp.sum(acc)

                return jax.jit(f)

            try:
                t_pal = _time_slope(pallas_k, (tau,))
                row["t_pallas_s"] = t_pal
                row["pallas_speedup"] = t_xla / t_pal
            except Exception as e:  # lowering/VMEM limits at large nbin
                row["pallas_error"] = f"{type(e).__name__}: {e}"[:200]
        rows.append(row)
        print(json.dumps(row), flush=True)

    result = dict(
        platform=platform,
        shape=dict(nk=args.nk, nw=args.nw, nz=args.nz),
        rows=rows,
    )
    crossover = None
    speedups = [(r["nbin"], r.get("pallas_speedup")) for r in rows]
    for nbin, s in speedups:
        if s is not None and s < 1.0 and crossover is None:
            crossover = nbin
    result["crossover_nbin"] = crossover
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
