"""Standalone Radtran on a ModernEarth-like column.

Mirrors the reference's ``tests/test_radtran.f90`` workflow: build a
`Radtran` with an explicit gas+particle list and 8 zenith angles, call
`radiate` on a prescribed column with particles, print the TOA solar
downward flux, dump TOA spectra to disk, print `opacities2yaml`, and
round-trip custom optical properties (clima_radtran.f90:221-512).

Uses the synthetic opacity database (`clima_tpu.data`) since the real
photochem_clima_data archive is not redistributable here.
"""

import os
import sys
import tempfile

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)

from clima_tpu.data import make_template_dir
from clima_tpu.radtran import Radtran
from clima_tpu.physics import eqns


def build_radtran(root):
    t = make_template_dir(root, nz=50, n_zenith=8, particles=True)
    settings = os.path.join(root, "settings_me.yaml")
    with open(settings, "w") as f:
        f.write("""\
atmosphere-grid:
  bottom: 0.0
  top: 0.7e7
  number-of-layers: 50

planet:
  surface-pressure: 1.013
  planet-mass: 5.972e27
  planet-radius: 6.371e8
  surface-albedo: 0.15
  number-of-zenith-angles: 8

optical-properties:
  species:
    gases: [H2O, CO2, O2, N2, CH4]
    particles: [HCaer]
  k-method: RandomOverlapResortRebin
  opacities: {k-distributions: true, CIA: true, rayleigh: true, photolysis-xs: true,
    water-continuum: MT_CKD, particle-xs: [{name: HCaer, data: khare1984}]}
""")
    return Radtran.from_settings(
        settings, t["star"], num_zenith_angles=8, surface_albedo=0.15,
        nz=50, datadir=t["datadir"],
    ), t


def earth_column(nz=50, ng=5, T_surf=288.0):
    z, dz = eqns.vertical_grid(0.0, 0.7e7, nz)
    T = np.maximum(T_surf - 6.5e-5 * z, 200.0)
    import jax.numpy as jnp
    P, den = [np.asarray(x) for x in eqns.press_and_den(
        jnp.asarray(T), jnp.full(nz, 981.0), 1.013e6, jnp.asarray(dz),
        jnp.full(nz, 28.6))]
    mix = np.zeros((nz, ng))
    mix[:, 0] = 1e-2 * np.exp(-z / 2e5)      # H2O
    mix[:, 1] = 400e-6                        # CO2
    mix[:, 2] = 0.21                          # O2
    mix[:, 4] = 1.8e-6                        # CH4
    mix[:, 3] = np.clip(1.0 - mix[:, [0, 1, 2, 4]].sum(1), 0.0, 1.0)  # N2
    densities = mix * den[:, None]
    # one particle: haze at ~0.1 um, thin loading peaked aloft
    pdensities = (1.0e-2 * np.exp(-((z - 4e6) / 1e6) ** 2))[:, None]
    radii = np.full((nz, 1), 1.0e-5)
    return T_surf, T, P / 1.0e6, densities, dz, pdensities, radii


def main():
    root = os.environ.get("CLIMA_TPU_EXAMPLE_DIR") or tempfile.mkdtemp()
    rad, _ = build_radtran(root)
    T_surf, T, P, densities, dz, pdensities, radii = earth_column()

    rad.radiate(T_surf, T, P, densities, dz,
                pdensities=pdensities, radii=radii)
    f0 = float(rad.f_total[0])
    print(f"TOA solar fdn  = {float(rad.wrk_sol.fdn_n[-1]):.6e} mW/m^2")
    print(f"TOA OLR        = {float(rad.wrk_ir.fup_n[-1]):.6e} mW/m^2")
    print(f"net f_total[0] = {f0:.6e} mW/m^2")

    # dump TOA spectra (reference writes ModernEarth.dat binary; we use npz)
    out = os.path.join(root, "ModernEarth.npz")
    np.savez(
        out,
        sol_wavl=np.asarray(rad.sol.wavl),
        ir_wavl=np.asarray(rad.ir.wavl),
        fup_sol_toa=np.asarray(rad.wrk_sol.fup_a[-1]),
        fdn_sol_toa=np.asarray(rad.wrk_sol.fdn_a[-1]),
        fup_ir_toa=np.asarray(rad.wrk_ir.fup_a[-1]),
    )
    print("wrote", out)

    print("--- opacities2yaml ---")
    print(rad.opacities2yaml())

    # custom optical property round-trip (test_radtran.f90:86-104)
    nw_c, nP_c = 4, 6
    wv = np.linspace(float(rad.sol.wavl[0]), float(rad.ir.wavl[-1]), nw_c)
    Pc = np.logspace(6.0, 0.0, nP_c)  # dynes/cm^2, decreasing
    dtau_dz = np.full((nP_c, nw_c), 1e-8)
    w0 = np.full((nP_c, nw_c), 0.5)
    g0 = np.full((nP_c, nw_c), 0.3)
    rad.set_custom_optical_properties(wv, Pc, dtau_dz, w0, g0)
    rad.radiate(T_surf, T, P, densities, dz,
                pdensities=pdensities, radii=radii)
    print(f"with custom opacity: net f_total[0] = {float(rad.f_total[0]):.6e}")
    rad.unset_custom_optical_properties()
    rad.radiate(T_surf, T, P, densities, dz,
                pdensities=pdensities, radii=radii)
    assert np.allclose(float(rad.f_total[0]), f0, rtol=1e-6), \
        "unset_custom_optical_properties did not restore baseline"
    print("custom optical property round-trip OK")


if __name__ == "__main__":
    main()
