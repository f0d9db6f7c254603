"""Multi-process worker for the sharded column pipeline (DCN smoke).

The reference is single-process (SURVEY.md section 2.4); the TPU-native
framework scales over a 1-D ``columns`` mesh with ``jax.distributed``. This
worker exercises the real multi-process path — cluster init, a global mesh
spanning non-addressable devices, ``jax.make_array_from_process_local_data``
for the sharded inputs, one jitted vmapped column pipeline, and a
``process_allgather`` of the per-column TOA fluxes — on N localhost CPU
processes with 4 virtual devices each (the same program structure a real
multi-host TPU pod uses; only the transport differs).

Usage:
  python scripts/distributed_worker.py <process_id> <num_processes> \
      <coordinator addr:port> <outdir>

Writes <outdir>/out_<process_id>.npz with the gathered global ISR/OLR.
"""

import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coord, outdir = sys.argv[3], sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from clima_tpu.data import make_template_dir
    from clima_tpu.adiabat import AdiabatClimate
    from clima_tpu.parallel import initialize_distributed, make_mesh, make_column_fns

    initialize_distributed(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert len(jax.devices()) == 4 * nproc, "global device count wrong"

    tmpl = make_template_dir(os.path.join(outdir, f"tmpl_{pid}"), nz=12, n_zenith=1)
    c = AdiabatClimate(tmpl["species"], tmpl["settings"], tmpl["star"], tmpl["datadir"])
    c.verbose = False

    # deterministic global batch, identical on every process
    B = 2 * len(jax.devices())
    ng = c.sp.ng
    T_surf = np.linspace(270.0, 300.0, B)
    P_i = np.full((B, ng), 1.0e-15)
    P_i[:, c.species_names.index("H2O")] = 270.0e6
    P_i[:, c.species_names.index("CO2")] = np.linspace(100.0, 1000.0, B)
    P_i[:, c.species_names.index("N2")] = 1.0e6

    mesh = make_mesh()
    s_cols = NamedSharding(mesh, P("columns"))
    s_cols2 = NamedSharding(mesh, P("columns", None))

    def local_part(arr, sharding):
        return jax.make_array_from_process_local_data(sharding, arr)

    nloc = B // nproc
    T_g = local_part(T_surf[pid * nloc : (pid + 1) * nloc], s_cols)
    P_g = local_part(P_i[pid * nloc : (pid + 1) * nloc], s_cols2)

    fns = make_column_fns(c)
    fn = jax.jit(jax.vmap(fns["toa_fluxes"]))
    ISR, OLR = fn(T_g, P_g)
    ISR = multihost_utils.process_allgather(ISR, tiled=True)
    OLR = multihost_utils.process_allgather(OLR, tiled=True)

    np.savez(os.path.join(outdir, f"out_{pid}.npz"), ISR=ISR, OLR=OLR,
             T_surf=T_surf, P_i=P_i)
    print(f"process {pid}: wrote {B} columns", flush=True)


if __name__ == "__main__":
    main()
