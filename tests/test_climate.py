"""Climate (time-stepping) model tests (scope of tests/test_climate.f90)."""

import numpy as np
import pytest

from clima_tpu.data import make_template_dir, write_settings_yaml
from clima_tpu.climate import Climate, load_evolve_file


@pytest.fixture(scope="module")
def template(tmp_path_factory):
    root = tmp_path_factory.mktemp("template_climate")
    t = make_template_dir(str(root), nz=20, n_zenith=1)
    # Climate settings need bottom/top/surface-pressure (ModernEarth style)
    import os

    settings = os.path.join(str(root), "settings_climate.yaml")
    with open(settings, "w") as f:
        f.write(
            """\
atmosphere-grid:
  bottom: 0.0
  top: 0.7e7
  number-of-layers: 20

planet:
  surface-pressure: 1.013
  planet-mass: 5.972e27
  planet-radius: 6.371e8
  surface-albedo: 0.3
  number-of-zenith-angles: 1

optical-properties:
  k-method: RandomOverlapResortRebin
  opacities: {k-distributions: true, CIA: true, rayleigh: true,
    water-continuum: MT_CKD}
"""
        )
    t["settings_climate"] = settings

    # atmosphere file on the grid
    atm = os.path.join(str(root), "atmosphere.txt")
    nzf = 25
    z = np.linspace(0, 7.2e6, nzf)  # cm
    T = np.maximum(288.0 - 6.5e-5 * z, 210.0)
    P = 1.013 * np.exp(-z / 8.0e5)
    den = P * 1e6 / (1.380649e-16 * T)
    cols = {
        "alt": z / 1e5, "press": P, "den": den, "temp": T, "eddy": np.zeros(nzf),
        "H2O": 1e-2 * np.exp(-z / 2e5) + 1e-6, "CO2": np.full(nzf, 400e-6),
        "N2": np.full(nzf, 0.78), "H2": np.full(nzf, 1e-6),
        "CH4": np.full(nzf, 1.8e-6), "CO": np.full(nzf, 1e-7),
        "O2": np.full(nzf, 0.21),
    }
    with open(atm, "w") as f:
        f.write(" ".join(f"{k:>15}" for k in cols) + "\n")
        for i in range(nzf):
            f.write(" ".join(f"{cols[k][i]:15.7e}" for k in cols) + "\n")
    t["atmosphere"] = atm
    return t


@pytest.fixture(scope="module")
def cl(template):
    c = Climate(
        template["species"], template["settings_climate"], template["star"],
        template["atmosphere"], template["datadir"],
    )
    c.verbose = False
    return c


def test_right_hand_side(cl):
    dTdt = cl.right_hand_side(cl.T_init)
    assert dTdt.shape == (cl.neq,)
    assert np.all(np.isfinite(dTdt))
    # heating rates should be physically small (K/s)
    assert np.max(np.abs(dTdt)) < 1.0


def test_evolve_short(cl, tmp_path):
    fn = str(tmp_path / "evolve.npz")
    t_eval = np.array([1.0e4, 5.0e4, 1.0e5])
    ok = cl.evolve(fn, 0.0, cl.T_init, t_eval, overwrite=True)
    assert ok
    out = load_evolve_file(fn)
    assert out["T"].shape == (3, cl.neq)
    assert np.all(np.isfinite(out["T"]))
    assert out["f_total"].shape == (3, cl.nz + 1)
    # temperatures stay physical over the short integration
    assert np.all(out["T"] > 100.0) and np.all(out["T"] < 500.0)


def test_device_rhs_matches_host(cl):
    """The pure-jnp device RHS is an exact transcription of right_hand_side."""
    import jax
    import jax.numpy as jnp

    d_host = cl.right_hand_side(cl.T_init)
    rhs, _ = cl._build_device_fns()
    d_dev = np.asarray(jax.jit(rhs)(jnp.asarray(cl.T_init)))
    # dTdt magnitudes are ~1e-5 K/s; atol 5e-15 is ~1e-10 of that scale
    np.testing.assert_allclose(d_dev, d_host, rtol=1e-10, atol=5e-15)


def test_evolve_device_matches_dop853(cl, tmp_path):
    """Device RK45 evolve agrees with host DOP853 within the tolerances."""
    t_eval = np.logspace(3.0, 4.5, 3)
    f1 = str(tmp_path / "host.npz")
    f2 = str(tmp_path / "dev.npz")
    assert cl.evolve(f1, 0.0, np.asarray(cl.T_init), t_eval, overwrite=True)
    assert cl.evolve(f2, 0.0, np.asarray(cl.T_init), t_eval, overwrite=True,
                     method="rk45_device")
    a, b = load_evolve_file(f1), load_evolve_file(f2)
    assert b["T"].shape == (3, cl.neq)
    # both integrators run at rtol=1e-4; trajectories agree to that order
    np.testing.assert_allclose(b["T"], a["T"], rtol=1e-4, atol=1e-3)
    for key in ["f_total", "fup_ir", "fdn_sol", "P"]:
        assert np.all(np.isfinite(b[key]))


def test_evolve_unknown_method(cl, tmp_path):
    import pytest as _pytest
    from clima_tpu.utils.errors import ClimaException

    with _pytest.raises(ClimaException):
        cl.evolve(str(tmp_path / "x.npz"), 0.0, np.asarray(cl.T_init),
                  np.array([10.0]), overwrite=True, method="rk99")
