"""Column-throughput scaling harness (BASELINE.md targets).

Measures batched TOA-flux throughput (columns/s) versus device count on a
1-D ``columns`` mesh. On real hardware run once per slice size
(1 chip / 1 host / N hosts, with ``clima_tpu.parallel.initialize_distributed``
on multi-host); in this repo's CI it runs on the virtual CPU mesh
(JAX_PLATFORMS=cpu, xla_force_host_platform_device_count=N).

Usage:
    python scripts/scaling.py [--devices 1 2 4 8] [--columns-per-device 8]

Prints one JSON line per mesh size with columns/s and parallel efficiency
relative to the single-device run.
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
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--nz", type=int, default=20)
    args = ap.parse_args()

    import numpy as np
    import jax

    # honor JAX_PLATFORMS even when a site plugin overrides it (this
    # environment's sitecustomize pins an out-of-process TPU backend)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from __graft_entry__ import _template
    from clima_tpu.adiabat import AdiabatClimate
    from clima_tpu.parallel import make_mesh, batched_toa_fluxes

    t = _template(nz=args.nz, n_zenith=1, tag=f"scaling_nz{args.nz}")
    c = AdiabatClimate(t["species"], t["settings"], t["star"], t["datadir"])
    c.verbose = False

    n_avail = len(jax.devices())
    device_counts = args.devices or sorted(
        {n for n in (1, 2, 4, 8, n_avail) if n <= n_avail}
    )

    base_rate = None
    for nd in device_counts:
        mesh = make_mesh(nd)
        B = args.columns_per_device * nd
        P_i = np.full((B, c.sp.ng), 1.0e-15)
        P_i[:, c.species_names.index("H2O")] = 270.0e6
        P_i[:, c.species_names.index("CO2")] = np.linspace(200.0, 800.0, B)
        P_i[:, c.species_names.index("N2")] = 1.0e6
        T_surf = np.linspace(270.0, 300.0, B)

        # warmup/compile
        out = batched_toa_fluxes(c, T_surf, P_i, mesh=mesh)
        np.asarray(out[0])
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            out = batched_toa_fluxes(c, T_surf * (1 + 1e-6 * (i + 1)), P_i, mesh=mesh)
            np.asarray(out[0])  # device_get sync (see bench.py note)
            times.append(time.perf_counter() - t0)
        rate = B / min(times)
        if base_rate is None:
            base_rate = rate / nd
        eff = rate / (base_rate * nd)
        print(
            json.dumps(
                {
                    "devices": nd,
                    "columns": B,
                    "columns_per_s": rate,
                    "efficiency_vs_1dev": eff,
                }
            )
        )


if __name__ == "__main__":
    main()
