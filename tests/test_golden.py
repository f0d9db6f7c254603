"""Golden self-consistency regression values.

There is no Fortran oracle in this environment, so these values were frozen
from the current validated implementation (f64, synthetic database, fixed
seeds). They guard future rounds against silent numerical drift: any change
that moves these beyond tolerance needs a deliberate update with
justification.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from clima_tpu.ops.twostream import two_stream_solar, two_stream_ir
from clima_tpu.ops.rorr import k_rorr_mix
from clima_tpu.physics import eqns, water, saturation


def test_golden_two_stream_solar():
    nz = 10
    tau = np.geomspace(1e-3, 1.0, nz)
    w0 = np.linspace(0.1, 0.9, nz)
    gt = np.full(nz, 0.5)
    am, sr, fup, fdn = [np.asarray(x) for x in two_stream_solar(
        jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt), 0.6, 0.25
    )]
    np.testing.assert_allclose(fup[0], 0.13888812489, rtol=1e-6)
    np.testing.assert_allclose(fdn[-1], 0.22044635844, rtol=1e-6)
    np.testing.assert_allclose(sr, 0.37850248848, rtol=1e-6)


def test_golden_two_stream_ir():
    nz = 10
    tau = np.geomspace(1e-2, 2.0, nz)
    w0 = np.full(nz, 0.3)
    gt = np.full(nz, 0.2)
    T = np.linspace(220.0, 290.0, nz + 1)
    bpl = np.asarray(eqns.planck_fcn(2.0e13, jnp.asarray(T)))
    fup, fdn = [np.asarray(x) for x in two_stream_ir(
        jnp.asarray(tau), jnp.asarray(w0), jnp.asarray(gt), 0.9, True, 1e-6,
        jnp.asarray(bpl)
    )]
    np.testing.assert_allclose(fup[0], 8.8928090786e-09, rtol=1e-5)
    np.testing.assert_allclose(fdn[-1], 1.3700079680e-08, rtol=1e-5)


def test_golden_rorr():
    nbin = 8
    g = (np.arange(nbin) + 0.5) / nbin
    tau_a = 1e-3 * np.exp(5.0 * g)
    tau_b = 2e-3 * np.exp(3.0 * g)
    wbin = np.full(nbin, 1.0 / nbin)
    wbin_e = np.concatenate([[0.0], np.cumsum(wbin)])
    out = np.asarray(k_rorr_mix(
        jnp.asarray(np.stack([np.tile(tau_a, (1, 1)), np.tile(tau_b, (1, 1))])),
        jnp.asarray(wbin_e),
    ))[0]
    np.testing.assert_allclose(out[0], 0.0061606019790, rtol=1e-5)
    np.testing.assert_allclose(out[-1], 0.1212308297981, rtol=1e-5)


def test_golden_water():
    np.testing.assert_allclose(float(water.sat_pressure_H2O(300.0)), 35183.75932293567, rtol=1e-8)
    np.testing.assert_allclose(float(water.latent_heat_H2O(300.0)), 24214868468.57129, rtol=1e-8)


@pytest.mark.parametrize("T,expect", [(250.0, 763.1852853300326), (300.0, 35183.75932293567)])
def test_water_svp_values(T, expect):
    got = float(water.sat_pressure_H2O(T))
    np.testing.assert_allclose(got, expect, rtol=1e-6)
