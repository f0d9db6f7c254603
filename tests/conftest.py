import os

# Tests run on a virtual 8-device CPU mesh with float64 enabled, so the
# numerics can be validated at the reference's double precision while the
# multi-chip sharding path is exercised without TPU hardware.
#
# NOTE: this environment injects an `axon` TPU PJRT plugin via sitecustomize
# and sets JAX_PLATFORMS=axon; both the env var and the explicit config update
# are needed to reliably pin tests to the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
