"""Tutorial: the AdiabatClimate model (mirrors examples/Tutorial_AdiabatClimate.ipynb).

Runs against the synthetic opacity database; with the real
photochem_clima_data distribution, point ``datadir`` at it and use the
reference's template species/settings files unchanged.

    python examples/tutorial_adiabat_climate.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from clima_tpu.data import make_template_dir
from clima_tpu.adiabat import AdiabatClimate


def main():
    import jax

    # RCE at the reference tolerance (max|F/F0| < 1e-5) wants float64 on CPU
    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)

    t = make_template_dir("examples/.template_earth", nz=20, n_zenith=1)
    c = AdiabatClimate(t["species"], t["settings"], t["star"], t["datadir"])
    c.verbose = False

    # Earth-ish surface partial pressures (dynes/cm^2)
    P_i = np.full(c.sp.ng, 1.0e-15)
    P_i[c.species_names.index("H2O")] = 270.0e6  # a 270-bar ocean inventory
    P_i[c.species_names.index("CO2")] = 400.0e-6 * 1.0e6
    P_i[c.species_names.index("N2")] = 0.78e6

    # 1. Build a moist pseudoadiabat and get TOA fluxes
    ISR, OLR = c.TOA_fluxes(280.0, P_i)
    print(f"T_surf=280 K: ISR = {ISR/1e3:.1f} W/m^2, OLR = {OLR/1e3:.1f} W/m^2")

    # 2. Solve for the equilibrium surface temperature
    T_surf = c.surface_temperature(P_i, T_guess=280.0)
    print(f"surface_temperature: {T_surf:.2f} K")

    # 3. Full radiative-convective equilibrium, seeded from step 2
    converged = c.RCE(P_i, T_surf, c.T)
    print(f"RCE converged: {converged}; T_surf = {c.T_surf:.2f} K")
    print(f"convective layers: {int(np.sum(c.convecting_with_below))}/{c.nz}")

    # 4. Inspect the column
    for i in range(0, c.nz, 5):
        print(
            f"  P = {c.P[i]/1e6:9.3e} bar   T = {c.T[i]:7.2f} K   "
            f"fH2O = {c.f_i[i, c.species_names.index('H2O')]:.3e}"
        )

    # 5. Write it out
    c.out2atmosphere_txt("examples/earth_rce_atmosphere.txt", np.zeros(c.nz),
                         overwrite=True)
    print("wrote examples/earth_rce_atmosphere.txt")


if __name__ == "__main__":
    main()
