"""df64 flux assembly and the df64 RCE objective vs the f64 standard path.

This is the file ``radtran/radiate_df.py`` cites: the builders
``build_ir_parts_df`` / ``build_solar_parts_df`` must reproduce the f64
``radiate_ir`` / ``radiate_solar`` + ``_net_edge_parts`` assembly
(clima_radtran_radiate.f90:7-196 weighting semantics) on IDENTICAL f32
opacities — isolating the arithmetic, not input rounding — and the
``flux_precision="df64"`` branches of ``rce_device.build_rce_fns``
(objective, Jacobian mixing, assemble_f_total) must converge the device
solve at the reference tolerance xtol_rc = 1e-5
(clima_adiabat_solve.f90:620-646) with float32 arrays, matching the f64
host equilibrium.

All df64 execution runs under ``jax.enable_x64(False)`` so every array
really is a float32 pair, exactly as on TPU hardware.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clima_tpu.data import make_template_dir
from clima_tpu.adiabat import AdiabatClimate
from clima_tpu.adiabat.rce_device import build_rce_fns, batched_rce


@pytest.fixture(scope="module")
def c(tmp_path_factory):
    root = tmp_path_factory.mktemp("template_radiate_df")
    t = make_template_dir(str(root), nz=14, n_zenith=2, surface_albedo=0.25)
    c = AdiabatClimate(t["species"], t["settings"], t["star"], t["datadir"])
    c.verbose = False
    return c


def P_i_earth(c):
    P_i = np.full(c.sp.ng, 1.0e-15)
    P_i[c.species_names.index("H2O")] = 270.0e6
    P_i[c.species_names.index("CO2")] = 400.0
    P_i[c.species_names.index("N2")] = 1.0e6
    return P_i


def _val(x):
    return np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)


def _f32_opacity_and_state(c, T_in):
    """One column's f32 opacity + radiative-grid temps via the device
    objective's own machinery (x64 disabled)."""
    conv = np.zeros(c.nz, bool)
    with jax.enable_x64(False):
        fns = build_rce_fns(c, flux_precision="standard")
        xm, _, _, aux = fns["objective"](
            jnp.asarray(T_in, jnp.float32), jnp.asarray(conv),
            jnp.asarray(P_i_earth(c), jnp.float32),
        )
        opr32 = {k: np.asarray(v) for k, v in aux["opr"].items()}
        xm = np.asarray(xm)
    nzr = 2 * c.nz + 2
    T_r = np.repeat(xm[1:], 2)
    T_r = np.concatenate([T_r, T_r[-1:], T_r[-1:]])
    assert T_r.shape[0] == nzr
    return opr32, xm[0], T_r


def _f64_edge_parts(fup_a, fdn_a, freq, n):
    """Reference edge-parts assembly (rce_device._net_edge_parts) in numpy
    f64: net at physical edge 0 plus exact adjacent-edge deltas."""
    net = (np.asarray(fdn_a, np.float64) - np.asarray(fup_a, np.float64))
    net = net[0::2][:n]
    dfreq = (freq[:-1] - freq[1:]).astype(np.float64)
    base = np.sum(net[0] * dfreq)
    d = np.sum(np.diff(net, axis=0) * dfreq[None, :], axis=1)
    return base, d


def test_ir_parts_df_matches_f64_assembly(c):
    """df64 IR (base, d) == f64 radiate_ir assembly on the same f32 opacity
    to ~1e-8 of the gross flux; the plain f32 path is orders worse on d."""
    from clima_tpu.radtran.radiate import radiate_ir
    from clima_tpu.radtran.radiate_df import build_ir_parts_df

    n = c.nz + 1
    T_in = np.linspace(290.0, 205.0, n)
    opr32, T_surf, T_r = _f32_opacity_and_state(c, T_in)

    rad = c.rad
    ir_slice = (rad.ir.ind_start, rad.ir.ind_end)
    freq = np.asarray(rad.op.freq, np.float64)[ir_slice[0] : ir_slice[1] + 2]

    # f64 truth on the SAME f32 opacities
    opr64 = {k: jnp.asarray(v, jnp.float64) for k, v in opr32.items()}
    ir = radiate_ir(
        ir_slice, jnp.asarray(rad.op.freq), jnp.asarray(rad.op.kset.wbin),
        opr64, jnp.asarray(rad.surface_emissivity),
        bool(rad.has_hard_surface), float(rad.ir_tau_min),
        jnp.asarray(float(T_surf)), jnp.asarray(T_r),
    )
    base64, d64 = _f64_edge_parts(ir["fup_a"], ir["fdn_a"], freq, n)

    parts = build_ir_parts_df(
        ir_slice, rad.op.freq, rad.op.kset.wbin, rad.surface_emissivity,
        bool(rad.has_hard_surface), float(rad.ir_tau_min), n,
    )
    with jax.enable_x64(False):
        b_df, d_df = parts(
            {k: jnp.asarray(v, jnp.float32) for k, v in opr32.items()},
            jnp.asarray(np.float32(T_surf)), jnp.asarray(T_r, jnp.float32),
        )
        assert b_df.hi.dtype == jnp.float32
        from clima_tpu.radtran.radiate_df import from_f64  # noqa: F401
        # plain f32 comparison path
        ir32 = radiate_ir(
            ir_slice, jnp.asarray(rad.op.freq, jnp.float32),
            jnp.asarray(rad.op.kset.wbin, jnp.float32),
            {k: jnp.asarray(v, jnp.float32) for k, v in opr32.items()},
            jnp.asarray(rad.surface_emissivity, jnp.float32),
            bool(rad.has_hard_surface), float(rad.ir_tau_min),
            jnp.asarray(np.float32(T_surf)),
            jnp.asarray(T_r, jnp.float32),
        )
    base32, d32 = _f64_edge_parts(ir32["fup_a"], ir32["fdn_a"], freq, n)

    # scale: gross frequency-integrated flux
    gross = np.abs(
        np.sum(np.asarray(ir["fup_a"], np.float64)[0]
               * (freq[:-1] - freq[1:]))
    )
    err_df = max(abs(_val(b_df) - base64), np.abs(_val(d_df) - d64).max())
    err_32 = max(abs(base32 - base64), np.abs(d32 - d64).max())
    assert err_df < 3e-7 * gross, (err_df, gross)
    assert err_32 > 30 * err_df  # the cancellation the df64 path fixes


def test_solar_parts_df_matches_f64_assembly(c):
    from clima_tpu.radtran.radiate import radiate_solar
    from clima_tpu.radtran.radiate_df import build_solar_parts_df

    n = c.nz + 1
    T_in = np.linspace(290.0, 205.0, n)
    opr32, _, _ = _f32_opacity_and_state(c, T_in)

    rad = c.rad
    sol_slice = (rad.sol.ind_start, rad.sol.ind_end)
    freq = np.asarray(rad.op.freq, np.float64)[sol_slice[0] : sol_slice[1] + 2]
    photons = rad.photons_sol * rad.photon_scale_factor

    opr64 = {k: jnp.asarray(v, jnp.float64) for k, v in opr32.items()}
    sol = radiate_solar(
        sol_slice, jnp.asarray(rad.op.freq), jnp.asarray(rad.op.wavl),
        jnp.asarray(rad.op.kset.wbin), opr64,
        jnp.asarray(rad.surface_albedo), float(rad.diurnal_fac),
        jnp.asarray(photons), jnp.asarray(rad.zenith_u),
        jnp.asarray(rad.zenith_weights),
    )
    base64, d64 = _f64_edge_parts(sol["fup_a"], sol["fdn_a"], freq, n)

    parts = build_solar_parts_df(
        sol_slice, rad.op.freq, rad.op.kset.wbin, rad.surface_albedo,
        float(rad.diurnal_fac), photons, rad.zenith_u, rad.zenith_weights, n,
    )
    with jax.enable_x64(False):
        b_df, d_df = parts(
            {k: jnp.asarray(v, jnp.float32) for k, v in opr32.items()}
        )

    gross = np.abs(
        np.sum(np.asarray(sol["fdn_a"], np.float64)[-1]
               * (freq[:-1] - freq[1:]))
    )
    err_df = max(abs(_val(b_df) - base64), np.abs(_val(d_df) - d64).max())
    assert err_df < 3e-7 * gross, (err_df, gross)


@pytest.mark.slow
def test_rce_df64_converges_at_reference_tolerance(c):
    """The full device RCE with flux_precision='df64' and FLOAT32 arrays
    reaches max|F/F0| < 1e-5 and lands on the f64 host equilibrium — the
    use_df branches of rce_device (objective/Jacobian/assemble_f_total)
    executing end-to-end as they do on TPU hardware."""
    P_i = P_i_earth(c)
    assert c.xtol_rc == pytest.approx(1e-5)

    # f64 host equilibrium
    T_s0 = c.surface_temperature(P_i, T_guess=280.0)
    T_guess = c.T.copy()
    assert c.RCE(P_i, T_s0, T_guess)
    T_surf_host = float(c.T_surf)
    T_host = c.T.copy()

    with jax.enable_x64(False):
        out = batched_rce(
            c, P_i[None, :].astype(np.float32),
            np.float32(T_s0)[None], T_guess[None, :].astype(np.float32),
            flux_precision="df64",
        )
        converged = np.asarray(out["converged"])
        T_surf = np.asarray(out["T_surf"])
        T = np.asarray(out["T"])
        status = np.asarray(out["status"])
        assert T_surf.dtype == np.float32

    assert converged.all(), (
        f"status={status} max_ratio={np.asarray(out['max_ratio'])} "
        f"ratio_floor={np.asarray(out['ratio_floor'])}"
    )
    assert abs(float(T_surf[0]) - T_surf_host) < 0.05
    assert np.abs(T[0] - T_host).max() < 1.0
