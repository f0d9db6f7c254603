"""End-to-end column-pipeline benchmark: full adiabat->RT columns/s/chip.

Sibling of bench.py (which times the RT hot path alone). One "column" is the
complete flagship forward pass: moist pseudoadiabat construction (with
event-split substeps), hydrostatic altitude solve, correlated-k opacity
assembly (RORR), two-stream IR + 4-zenith solar RT on the doubled radiative
grid (nz_r = 202), and TOA fluxes — the unit of work of every solver
residual evaluation (surface_temperature, RCE).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is vs 1e3 columns/s/chip (no reference number exists: the
Fortran reference evaluates this pipeline serially at O(1) columns/s).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _model, _p_batch
    from clima_tpu.parallel import make_column_fns

    c = _model(nz=100, n_zenith=4, tag="benchpipe")
    fns = make_column_fns(c)
    toa = fns["toa_fluxes"]

    B = int(os.environ.get("BENCH_COLUMNS", "64"))
    K = int(os.environ.get("BENCH_INNER", "4"))

    def pipeline_many(T_surf, P_i):
        # K genuinely distinct full-pipeline evaluations per dispatch
        # (sync amortization through the axon relay; see bench.py). T_surf
        # and P_i feed the profile, so every downstream stage recomputes.
        acc = 0.0
        for i in range(K):
            s = 1.0 + 1e-6 * i
            isr, olr = toa(T_surf * s, P_i * s)
            acc = acc + isr - olr
        return acc

    fn = jax.jit(jax.vmap(pipeline_many))

    T_surf_b = jnp.asarray(np.linspace(275.0, 295.0, B))
    P_i_b = jnp.asarray(_p_batch(c, B))

    out = fn(T_surf_b, P_i_b)  # warmup/compile
    np.asarray(out)

    n_iter = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = fn(T_surf_b * (1.0 + 1e-6 * i), P_i_b)
        np.asarray(out)
    dt = time.perf_counter() - t0

    rate = B * K * n_iter / dt
    print(
        json.dumps(
            {
                "metric": "column_pipeline_throughput",
                "value": rate,
                "unit": "columns/s/chip",
                "vs_baseline": rate / 1.0e3,
            }
        )
    )


if __name__ == "__main__":
    main()
