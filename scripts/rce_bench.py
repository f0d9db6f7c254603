"""Flagship-scale batched device RCE benchmark (VERDICT r4 item 5).

Runs ``batched_rce`` on the CURRENT backend at the reference RCE-test
configuration (nz=50, one zenith angle — ``tests/settings_RCE_test.yaml``)
over heterogeneous column ensembles B in {8, 64, 256}: CO2 log-spaced
100..6400 ppm, perturbed surface-temperature guesses. Records columns/s,
per-lane convergence, rc/solve-iteration spread, and wall/compile split.

Precision: df64 (the mode that reaches the reference tolerance on f32
hardware, TPU_VALIDATION_r04). The whole ensemble is ONE jitted program;
a batched while_loop runs until the SLOWEST lane converges, so columns/s
already charges the heterogeneity penalty.

Usage:
  python scripts/rce_bench.py [--nz 50] [--out RCE_BENCH_r04.json]
          [--sizes 8 64 256] [--xtol 1e-5] [--precision df64]
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
    ap.add_argument("--nz", type=int, default=50)
    ap.add_argument("--out", default="RCE_BENCH_r04.json")
    ap.add_argument("--sizes", type=int, nargs="+", default=[8, 64, 256])
    ap.add_argument("--xtol", type=float, default=1.0e-5)
    ap.add_argument("--precision", default="df64",
                    choices=["df64", "standard", "auto"])
    ap.add_argument("--jac-budget", type=int, default=96,
                    help="target B * jac_chunk: bounds concurrent FD "
                         "Jacobian radiates (B=2 at nz=50 ran 102 "
                         "concurrent fine; un-chunked B=8 OOM-crashed the "
                         "TPU worker)")
    ap.add_argument("--chunk-iters", type=int, default=12,
                    help="inner iterations per device dispatch: the axon "
                         "relay's TPU worker dies on single dispatches "
                         "beyond ~10 min (measured r5), so the solve runs "
                         "as warm-restarted chunks (batched_rce chunk_iters)")
    args = ap.parse_args()

    import jax
    from clima_tpu.data import make_template_dir
    from clima_tpu.adiabat import AdiabatClimate
    from clima_tpu.adiabat.rce_device import batched_rce

    root = os.path.join(REPO, ".graft_assets", f"tpl_rcebench_nz{args.nz}")
    if not os.path.exists(os.path.join(root, "settings.yaml")):
        make_template_dir(root, nz=args.nz, n_zenith=1)
    c = AdiabatClimate(
        os.path.join(root, "species.yaml"), os.path.join(root, "settings.yaml"),
        os.path.join(root, "star.txt"), os.path.join(root, "data"),
    )
    c.verbose = False
    c.xtol_rc = args.xtol

    dev = jax.devices()[0]
    result = dict(
        platform=dev.platform,
        device_kind=getattr(dev, "device_kind", "unknown"),
        nz=args.nz, xtol_rc=args.xtol, flux_precision=args.precision,
        x64=bool(jax.config.jax_enable_x64),
        runs=[],
    )

    rng = np.random.default_rng(7)
    iH2O = c.species_names.index("H2O")
    iCO2 = c.species_names.index("CO2")
    iN2 = c.species_names.index("N2")

    # Seeding follows the reference workflow (test_adiabat.f90:163-252:
    # surface_temperature THEN RCE): every lane warm-starts from ONE
    # converged nearby column — the 400 ppm CO2 solution of the nz=50 TPU
    # validation run — with per-lane CO2 spread (100..6400 ppm shifts the
    # equilibrium by ~+-10 K) and jittered T_surf guesses. Cold generic
    # seeds (uniform 275-295 K + a linspace profile) sit outside the
    # solver's basin at nz=50 (all lanes stalled at max|F/F0| ~ 0.04,
    # first r5 attempt) — the host solver is never run that way either.
    ref_file = os.path.join(REPO, ".graft_assets", f"cpuref_nz{args.nz}.json")
    if os.path.exists(ref_file):
        ref = json.load(open(ref_file))
        T_surf_ref, T_ref = float(ref["T_surf"]), np.asarray(ref["T"])
    else:  # fall back to a host surface_temperature solve for one column
        P_ref = np.full(c.sp.ng, 1.0e-15)
        P_ref[iH2O], P_ref[iCO2], P_ref[iN2] = 270.0e6, 400.0, 1.0e6
        T_surf_ref = c.surface_temperature(P_ref, T_guess=280.0)
        T_ref = c.T.copy()

    for B in args.sizes:
        P_b = np.full((B, c.sp.ng), 1.0e-15)
        P_b[:, iH2O] = 270.0e6
        P_b[:, iCO2] = 1.0e6 * np.geomspace(100e-6, 6400e-6, B)
        P_b[:, iN2] = 1.0e6
        T_s = T_surf_ref + rng.uniform(-2.0, 2.0, B)
        T_seed = T_ref[None, :] + rng.uniform(-1.0, 1.0, (B, 1))

        jac_chunk = max(1, args.jac_budget // B)
        cache = {}
        t0 = time.perf_counter()
        out = batched_rce(c, P_b, T_s, T_seed, flux_precision=args.precision,
                          chunk_iters=args.chunk_iters, jac_chunk=jac_chunk,
                          _cache=cache)
        conv = np.asarray(out["converged"])  # device_get = relay-safe sync
        wall_total = time.perf_counter() - t0

        # second run with perturbed inputs: same compiled program, so this
        # wall time is the EXECUTION cost (compile = total - exec)
        T_s2 = T_s + rng.uniform(-1.0, 1.0, B)
        t0 = time.perf_counter()
        out2 = batched_rce(c, P_b * (1.0 + 1e-4), T_s2, T_seed,
                           flux_precision=args.precision,
                           chunk_iters=args.chunk_iters, jac_chunk=jac_chunk,
                           _cache=cache)
        conv2 = np.asarray(out2["converged"])
        wall_exec = time.perf_counter() - t0

        iters = np.asarray(out2["solve_iters"])
        rc = np.asarray(out2["rc_iters"])
        run = dict(
            B=B,
            wall_first_s=wall_total,
            wall_exec_s=wall_exec,
            compile_est_s=wall_total - wall_exec,
            columns_per_s=B / wall_exec,
            converged_frac=float(conv2.mean()),
            status_counts={int(k): int(v) for k, v in zip(
                *np.unique(np.asarray(out2["status"]), return_counts=True))},
            max_ratio_max=float(np.asarray(out2["max_ratio"]).max()),
            ratio_floor_max=float(np.asarray(out2["ratio_floor"]).max()),
            solve_iters=dict(min=int(iters.min()), median=float(np.median(iters)),
                             max=int(iters.max())),
            rc_iters=dict(min=int(rc.min()), median=float(np.median(rc)),
                          max=int(rc.max())),
            T_surf_range=[float(np.asarray(out2["T_surf"]).min()),
                          float(np.asarray(out2["T_surf"]).max())],
        )
        result["runs"].append(run)
        print(json.dumps(run), flush=True)
        json.dump(result, open(args.out, "w"), indent=1)

    json.dump(result, open(args.out, "w"), indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
