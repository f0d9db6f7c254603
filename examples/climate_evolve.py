"""Time-stepping `Climate` model on a ModernEarth-like column.

Mirrors the reference's ``tests/test_climate.f90`` workflow: build the
experimental `Climate` model (fixed-z grid, fixed composition from an
atmosphere.txt file), integrate dT/dt with radiative flux divergence +
mixing-length convective diffusion, streaming snapshots at log-spaced
output times (clima_climate.f90:23-69, clima_climate_integrate.f90:113-182).

Snapshots are written to an .npz stream instead of Fortran unformatted
records; `load_evolve_file` reads them back.
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# Climate.evolve is host-driven (adaptive scipy DOP853 calling a jitted RHS
# each step): on a remote TPU every RHS eval pays a host<->device sync, so
# this experimental model runs best on CPU with float64.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from clima_tpu.data import make_template_dir
from clima_tpu.climate import Climate, load_evolve_file


def make_inputs(root, nz=20):
    t = make_template_dir(root, nz=nz, n_zenith=1)
    settings = os.path.join(root, "settings_climate.yaml")
    with open(settings, "w") as f:
        f.write(f"""\
atmosphere-grid:
  bottom: 0.0
  top: 0.7e7
  number-of-layers: {nz}

planet:
  surface-pressure: 1.013
  planet-mass: 5.972e27
  planet-radius: 6.371e8
  surface-albedo: 0.3
  number-of-zenith-angles: 1

optical-properties:
  k-method: RandomOverlapResortRebin
  opacities: {{k-distributions: true, CIA: true, rayleigh: true,
    water-continuum: MT_CKD}}
""")
    # prescribed composition vs altitude (test_climate.f90 uses the
    # ModernEarth atmosphere.txt template)
    atm = os.path.join(root, "atmosphere.txt")
    nzf = 25
    z = np.linspace(0, 7.2e6, nzf)  # cm
    T = np.maximum(288.0 - 6.5e-5 * z, 210.0)
    P = 1.013 * np.exp(-z / 8.0e5)
    den = P * 1e6 / (1.380649e-16 * T)
    cols = {
        "alt": z / 1e5, "press": P, "den": den, "temp": T,
        "eddy": np.zeros(nzf),
        "H2O": 1e-2 * np.exp(-z / 2e5) + 1e-6, "CO2": np.full(nzf, 400e-6),
        "N2": np.full(nzf, 0.78), "H2": np.full(nzf, 1e-6),
        "CH4": np.full(nzf, 1.8e-6), "CO": np.full(nzf, 1e-7),
        "O2": np.full(nzf, 0.21),
    }
    with open(atm, "w") as f:
        f.write(" ".join(f"{k:>15}" for k in cols) + "\n")
        for i in range(nzf):
            f.write(" ".join(f"{cols[k][i]:15.7e}" for k in cols) + "\n")
    t["settings_climate"] = settings
    t["atmosphere"] = atm
    return t


def main():
    root = os.environ.get("CLIMA_TPU_EXAMPLE_DIR") or tempfile.mkdtemp()
    t = make_inputs(root)
    c = Climate(t["species"], t["settings_climate"], t["star"],
                t["atmosphere"], t["datadir"])
    c.verbose = True

    # 10 log-spaced output times (test_climate.f90 uses 100 to 1e10 s;
    # keep this example short)
    t_eval = np.logspace(4.0, 6.0, 10)
    out = os.path.join(root, "evolve_out.npz")
    ok = c.evolve(out, tstart=0.0, T_start=np.asarray(c.T_init),
                  t_eval=t_eval, overwrite=True)
    print("evolve converged:", ok)

    snaps = load_evolve_file(out)
    print(f"snapshots: {len(snaps['t'])} times, T shape {snaps['T'].shape}")
    print("T_surf(t):", np.array2string(snaps["T"][:, 0], precision=2))
    dT = np.abs(snaps["T"][-1] - snaps["T"][0]).max()
    print(f"max |T(t_end) - T(0)| = {dT:.3f} K")


if __name__ == "__main__":
    main()
