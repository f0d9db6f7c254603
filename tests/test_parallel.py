"""Column-batch data parallelism tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from clima_tpu.data import make_template_dir
from clima_tpu.adiabat import AdiabatClimate
from clima_tpu.parallel import (
    batched_toa_fluxes,
    batched_surface_temperature,
    make_mesh,
)


@pytest.fixture(scope="module")
def c(tmp_path_factory):
    root = tmp_path_factory.mktemp("template_par")
    t = make_template_dir(str(root), nz=16, n_zenith=1)
    c = AdiabatClimate(t["species"], t["settings"], t["star"], t["datadir"])
    c.verbose = False
    return c


def P_batch(c, B):
    rng = np.random.default_rng(0)
    P_i = np.full((B, c.sp.ng), 1.0e-15)
    P_i[:, c.species_names.index("H2O")] = 270.0e6
    P_i[:, c.species_names.index("CO2")] = rng.uniform(100.0, 1000.0, B)
    P_i[:, c.species_names.index("N2")] = rng.uniform(0.5e6, 2.0e6, B)
    return P_i


def test_batched_toa_matches_scalar(c):
    B = 4
    P_i = P_batch(c, B)
    T_surf = np.linspace(270.0, 300.0, B)
    ISR, OLR = [np.asarray(x) for x in batched_toa_fluxes(c, T_surf, P_i)]
    assert ISR.shape == (B,)
    # compare with the host-path AdiabatClimate for one column
    ISR0, OLR0 = c.TOA_fluxes(T_surf[1], P_i[1])
    np.testing.assert_allclose(ISR[1], ISR0, rtol=1e-6)
    np.testing.assert_allclose(OLR[1], OLR0, rtol=1e-6)


def test_batched_toa_sharded(c):
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    mesh = make_mesh(8)
    B = 16
    P_i = P_batch(c, B)
    T_surf = np.linspace(260.0, 310.0, B)
    ISR_m, OLR_m = [np.asarray(x) for x in batched_toa_fluxes(c, T_surf, P_i, mesh=mesh)]
    ISR_s, OLR_s = [np.asarray(x) for x in batched_toa_fluxes(c, T_surf, P_i)]
    np.testing.assert_allclose(ISR_m, ISR_s, rtol=1e-10)
    np.testing.assert_allclose(OLR_m, OLR_s, rtol=1e-10)


def test_batched_surface_temperature(c):
    mesh = make_mesh(8)
    B = 8
    P_i = P_batch(c, B)
    T, resid, conv, iters = batched_surface_temperature(
        c, P_i, T_guess=280.0, mesh=mesh
    )
    T = np.asarray(T)
    assert np.asarray(conv).all()
    assert np.all((T > 150.0) & (T < 500.0))
    # cross-check one column against the host solver
    T_host = c.surface_temperature(P_i[0], T_guess=280.0)
    np.testing.assert_allclose(T[0], T_host, rtol=2e-3)
