"""Early-Mars style climate sweep (mirrors examples/EarlyMars.ipynb).

Surface temperature vs CO2 inventory for a cold early Mars under a faint
young Sun — the column sweep runs BATCHED on the device mesh instead of the
reference's serial Python loop.

    python examples/early_mars.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from clima_tpu.data import make_template_dir, write_settings_yaml
from clima_tpu.adiabat import AdiabatClimate
from clima_tpu.parallel import batched_surface_temperature, make_mesh


def main():
    import jax

    # RCE at the reference tolerance (max|F/F0| < 1e-5) wants float64 on CPU
    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)

    root = "examples/.template_mars"
    t = make_template_dir(root, nz=20, n_zenith=1)
    settings = os.path.join(root, "settings_mars.yaml")
    # Mars mass/radius + faint-young-Sun photon scale factor (templates/
    # AdiabatClimate/Mars/settings.yaml)
    write_settings_yaml(
        settings, nz=20, planet_mass=6.4169e26, planet_radius=3.3895e8,
        surface_albedo=0.2, n_zenith=1, photon_scale_factor=0.4286 * 0.75,
    )
    c = AdiabatClimate(t["species"], settings, t["star"], t["datadir"])
    c.verbose = False

    P_CO2_bars = np.array([0.1, 0.3, 0.5, 1.0, 2.0, 3.0])
    B = len(P_CO2_bars)
    P_i = np.full((B, c.sp.ng), 1.0e-15)
    P_i[:, c.species_names.index("H2O")] = 270.0e6
    P_i[:, c.species_names.index("CO2")] = P_CO2_bars * 1.0e6

    mesh = make_mesh()
    T, resid, conv, iters = batched_surface_temperature(
        c, P_i, T_guess=230.0, mesh=mesh
    )
    print(f"batched solve over {len(mesh.devices.flat)} device(s), {iters} iterations")
    for p, Ts, ok in zip(P_CO2_bars, np.asarray(T), np.asarray(conv)):
        print(f"  P_CO2 = {p:4.1f} bar  ->  T_surf = {Ts:7.2f} K   converged={bool(ok)}")


if __name__ == "__main__":
    main()
