"""Opacity assembly: k-tables + continua + particles -> (tau, w0, g) per bin.

Re-implements ``OpticalProperties_compute_opacity`` and ``k_rorr``
(``src/radtran/clima_radtran_types.f90:574-888``) as one fully vectorized
function: the reference's OpenMP loop over wavelength bins and its per-layer
interpolation loops become whole-tensor gathers; the doubled-grid
``pair_reuse`` cache is unnecessary (everything is vectorized — recomputing a
duplicated layer costs nothing extra on the VPU).

Input convention matches the reference facade: ground-up layer arrays
(index 0 = bottom). Output arrays are TOA-down (index 0 = top), as the
reference's result arrays are.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as const
from ..ops.rorr import k_rorr_mix, k_aee_mix
from ..ops.interp import hat_weights, pdot
from .data import OpticalData

__all__ = ["compute_opacity", "set_rorr_pallas_mode"]

# Fused-Pallas RORR dispatch, mirroring ops.twostream.set_pallas_mode:
# "auto" uses the sort-free rank kernel (ops.pallas_rorr) on TPU — ~1.5x the
# XLA lax.sort path at the flagship batch — and XLA elsewhere.
_RORR_PALLAS_MODE = "auto"


def set_rorr_pallas_mode(name: str):
    """Select the RORR backend: "auto" (Pallas on TPU), "never", "always".

    Takes effect at trace time: a live ``Radtran`` caches jitted programs,
    so call its ``_build_jit()`` (or construct a new one) after switching.
    """
    global _RORR_PALLAS_MODE
    if name not in ("auto", "never", "always"):
        raise ValueError(name)
    _RORR_PALLAS_MODE = name


def _use_pallas_rorr():
    if _RORR_PALLAS_MODE == "always":
        return True
    if _RORR_PALLAS_MODE == "never":
        return False
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _interp_table_T_log10(temp_grid, table, T):
    """Interpolate log10-xsection rows at temperatures T (nz,) with clamping.

    Returns log10 values (nz, nw). Matches interpolate_Xsection
    (types.f90:890-917): T clamped to the grid range, linear in log10 space.
    Gather-free (hat-basis matmul, ops.interp.hat_weights) and kept in log10
    for f32 safety: CIA/continuum terms combine xs ~ 1e-46 with density
    products ~ 1e38, both outside float32 range individually.
    """
    W = hat_weights(jnp.asarray(temp_grid), T)  # (nz, ntemp)
    return pdot(W, jnp.asarray(table))  # (nz, nw); full-f32 matmul (pdot)


def _safe_log10(x):
    return jnp.log10(jnp.maximum(x, 1e-300 if x.dtype == jnp.float64 else 1e-37))


def _interp_ktable(kt, log10P, T):
    """Bilinear k-table interpolation -> k (nz, ngauss, nw), linear units.

    Matches the clamped 2-D interpolation at types.f90:649-662, expressed as
    a hat-basis contraction: (nz, P)x(nz, T) weight matrices against the
    (G, P, T, W) table — one MXU matmul instead of 4 XLA gathers. The
    contraction order is forced: build the small (nz, P*T) bilinear-weight
    matrix first, then one (nz, PT) @ (PT, GW) matmul. (A single einsum lets
    XLA contract zp with gptw first, materializing an (nz, G, T, W) tensor
    ~40x larger than the output — measured 66 ms vs 9 ms at the flagship
    batch.)
    """
    Wp = hat_weights(jnp.asarray(kt.log10P), log10P)  # (nz, P)
    Wt = hat_weights(jnp.asarray(kt.temp), T)  # (nz, T)
    nz = Wp.shape[0]
    Wpt = (Wp[:, :, None] * Wt[:, None, :]).reshape(nz, -1)  # (nz, P*T)
    tab = jnp.asarray(kt.log10k)  # (G, P, T, W)
    G, P, Tn, Wn = tab.shape
    tab2d = jnp.transpose(tab, (1, 2, 0, 3)).reshape(P * Tn, G * Wn)
    logk = pdot(Wpt, tab2d).reshape(nz, G, Wn)
    return 10.0**logk  # (nz, G, W)


def _interp_ktable_t(kt, log10P, T):
    """As :func:`_interp_ktable` but with the contraction FLIPPED so the
    output is (G, W, nz) with nz on lanes — the layout the downstream RORR
    kernel and the (W, G, nz) opacity tensors want.

    Emitting (nz, G, W) and transposing costs a whole-tensor minor-axis
    relayout per species (~12 ms of the 37 ms opacity stage at the flagship
    batch — the dominant hidden cost found by the r4 roofline); here the
    matmul itself produces nz-minor: (G*W, PT) @ (PT, nz).
    """
    Wp = hat_weights(jnp.asarray(kt.log10P), log10P)  # (nz, P)
    Wt = hat_weights(jnp.asarray(kt.temp), T)  # (nz, T)
    nz = Wp.shape[0]
    WptT = (Wp.T[:, None, :] * Wt.T[None, :, :]).reshape(-1, nz)  # (P*T, nz)
    tab = jnp.asarray(kt.log10k)  # (G, P, T, W)
    G, P, Tn, Wn = tab.shape
    tabT = jnp.transpose(tab, (0, 3, 1, 2)).reshape(G * Wn, P * Tn)  # static
    logk = pdot(tabT, WptT).reshape(G, Wn, nz)
    return 10.0**logk  # (G, W, nz)


def _interp_particle(part, radii_z):
    """Interpolate particle optical data at radii (nz,) -> (w0, qext, gt) (nz, nw).

    Radii outside the table are clamped (interpolate_Particle, :947-983 — the
    reference flags an error; we clamp, and the facade validates on request).
    """
    W = hat_weights(jnp.asarray(part.radii), radii_z)  # (nz, nrad)
    gi = lambda tab: pdot(W, jnp.asarray(tab))
    return gi(part.w0), gi(part.qext), gi(part.gt)


def compute_opacity(op: OpticalData, P, T, densities, dz,
                    pdensities=None, radii=None, custom=None):
    """Assemble total optical properties.

    Parameters (ground-up, layer index 0 = bottom):
      P: (nz,) bars;  T: (nz,);  densities: (nz, ng) molecules/cm^3;
      dz: (nz,) cm;  pdensities/radii: (nz, np);  custom: optional dict with
      keys log10P (nPc, ascending, log10 dynes/cm^2), dtau_dz/w0/g0 (nPc, nw).

    Returns dict with TOA-down arrays:
      tau (nw, nbin, nz), w0 (nw, nbin, nz), g (nw, nz), tau_band (nw, nz).
    """
    nz = T.shape[0]
    nw = op.nw
    nbin = op.kset.nbin
    # Build TOA-down NATIVELY by flipping the small (nz,)-indexed inputs:
    # every assembly step is per-layer elementwise, so flipping here is
    # equivalent to flipping the outputs — but a lane-reversal relayout of
    # the (nw, nbin, nz) output tensors costs whole-tensor shuffles, while
    # these input flips touch nz-sized vectors.
    P = P[::-1]
    T = T[::-1]
    densities = densities[::-1]
    dz = dz[::-1]
    if pdensities is not None:
        pdensities = pdensities[::-1]
    if radii is not None:
        radii = radii[::-1]
    log10P = jnp.log10(P)
    cols = densities * dz[:, None]  # (nz, ng)

    # --- k-distributions: per-species tau at each gauss point ---
    # Assembled nz-MINOR from the start: _interp_ktable_t emits (G, W, nz)
    # straight from the interpolation matmul, which is exactly the RORR
    # kernel's native (nbin, lanes) layout after one reshape — no
    # whole-tensor minor-axis relayouts anywhere in the chain (they cost
    # ~12 ms of the 37 ms flagship-batch opacity stage before r4).
    nk = len(op.k)
    tau_ks_t = []
    for kt in op.k:
        kcoef = _interp_ktable_t(kt, log10P, T)  # (G, W, nz)
        tau_ks_t.append(kcoef * cols[:, kt.sp_ind][None, None, :])
    tau_ks_t = jnp.stack(tau_ks_t, axis=0)  # (nk, G, W, nz)

    # --- k-distribution mixing -> tau_kmix (W, G, nz) ---
    if op.kset.k_method == "AdaptiveEquivalentExtinction":
        # declared-but-unimplemented in the reference (types.f90:761-763);
        # implemented here as a sort-free fast path (ops.rorr.k_aee_mix)
        mixed = k_aee_mix(
            jnp.moveaxis(tau_ks_t, 1, -1), jnp.asarray(op.kset.wbin)
        )  # (nk-less: W, nz, G)
        tau_kmix = jnp.moveaxis(mixed, -1, 1)  # (W, G, nz)
    else:
        # RORR (k_rorr, types.f90:780-888). On TPU the fused sort-free rank
        # kernel keeps the whole species chain in VMEM (ops.pallas_rorr);
        # the XLA lax.sort path is the CPU default and cross-check oracle.
        if _use_pallas_rorr() and op.kset.nbin <= 16 and nk >= 2:
            from ..ops.pallas_rorr import k_rorr_mix_pallas_t

            mixed_t = k_rorr_mix_pallas_t(
                tau_ks_t.reshape(nk, nbin, nw * nz),
                op.kset.wbin, op.kset.wbin_e,
            )  # (G, W*nz)
        else:
            if _use_pallas_rorr() and op.kset.nbin > 16:
                # the rank kernel is O(nbin^4) per species pair; past
                # nbin=16 it loses to the XLA sort path (measured in
                # scripts/rorr_crossover.py, documented in PARITY.md), so
                # fall back — loudly, since the user asked for Pallas.
                import warnings

                warnings.warn(
                    f"Pallas RORR requested but nbin={op.kset.nbin} > 16: "
                    "falling back to the XLA sort-based k-mixing path "
                    "(the rank kernel is O(nbin^4) per pair and slower "
                    "past nbin=16; see PARITY.md).",
                    stacklevel=2,
                )
            mixed_t = jnp.moveaxis(
                k_rorr_mix(
                    jnp.moveaxis(tau_ks_t.reshape(nk, nbin, nw * nz), 1, -1),
                    jnp.asarray(op.kset.wbin_e),
                ),
                -1, 0,
            )  # (G, W*nz)
        # (G, W, nz) -> (W, G, nz): leading-dims transpose, nz stays minor
        tau_kmix = jnp.transpose(mixed_t.reshape(nbin, nw, nz), (1, 0, 2))

    # --- Rayleigh scattering ---
    tausg = jnp.zeros((nz, nw))
    for xs in op.ray:
        tausg = tausg + jnp.asarray(xs.xs_0d)[None, :] * cols[:, xs.sp_inds[0]][:, None]

    # --- continuum absorption: CIA + photolysis + water continuum ---
    # binary terms (xsection * density * density * dz) are accumulated in
    # log10 space: the factors individually over/underflow float32.
    taua = jnp.zeros((nz, nw))
    for xs in op.cia:
        j, jj = xs.sp_inds
        if xs.dim == 0:
            lgval = _safe_log10(jnp.asarray(xs.xs_0d))[None, :]
        else:
            lgval = _interp_table_T_log10(xs.temp, xs.log10_xs, T)
        lgcol = (
            _safe_log10(densities[:, j])
            + _safe_log10(densities[:, jj])
            + jnp.log10(dz)
        )
        taua = taua + 10.0 ** (lgval + lgcol[:, None])

    for xs in op.pxs + op.axs:
        j = xs.sp_inds[0]
        if xs.dim == 0:
            val = jnp.asarray(xs.xs_0d)[None, :]
        else:
            val = 10.0 ** _interp_table_T_log10(xs.temp, xs.log10_xs, T)
        taua = taua + val * cols[:, j][:, None]

    if op.cont is not None:
        LH2O = op.cont.LH2O
        lg_h2o = _interp_table_T_log10(op.cont.temp, op.cont.log10_xs_H2O, T)
        lg_for = _interp_table_T_log10(op.cont.temp, op.cont.log10_xs_foreign, T)
        foreign_col = jnp.sum(cols, axis=1) - cols[:, LH2O]
        lg_n_h2o = _safe_log10(densities[:, LH2O])
        taua = taua + 10.0 ** (lg_h2o + (lg_n_h2o + _safe_log10(cols[:, LH2O]))[:, None])
        taua = taua + 10.0 ** (lg_for + (lg_n_h2o + _safe_log10(foreign_col))[:, None])

    # --- custom optical properties (types.f90:429-572) ---
    if custom is not None:
        log10P_cgs = jnp.log10(P * 1.0e6)
        W = hat_weights(jnp.asarray(custom["log10P"]), log10P_cgs)
        gi = lambda tab: pdot(W, jnp.asarray(tab))
        tauc = gi(custom["dtau_dz"]) * dz[:, None]
        w0c = gi(custom["w0"])
        g0c = gi(custom["g0"])
    else:
        tiny = 1e-300 if jnp.zeros(()).dtype == jnp.float64 else 1e-37
        tauc = jnp.full((nz, nw), tiny)
        w0c = jnp.full((nz, nw), tiny)
        g0c = jnp.full((nz, nw), tiny)
    tausc = w0c * tauc

    # --- particles ---
    taup = jnp.zeros((nz, nw))
    tausp = jnp.zeros((nz, nw))
    gt_num = jnp.zeros((nz, nw))
    if op.part and pdensities is not None:
        for part in op.part:
            j = part.p_ind
            w0p, qextp, gtp = _interp_particle(part, radii[:, j])
            taup_1 = qextp * const.pi * (radii[:, j] ** 2 * pdensities[:, j] * dz)[:, None]
            tausp_1 = w0p * taup_1
            taup = taup + taup_1
            tausp = tausp + tausp_1
            gt_num = gt_num + gtp * tausp_1

    scat_tot = jnp.maximum(const.tau_min, tausp + tausg + tausc)
    gt = gt_num / scat_tot + g0c * tausc / scat_tot
    gt = jnp.minimum(gt, const.max_gt)

    # --- combine per gauss point ---
    # (W, nz) continua; tau_kmix (W, G, nz) — already gauss-before-z, so no
    # minor-axis transposes remain: only the cheap TOA-down lane flips
    tau_cont = (tausg + taua + taup + tauc).T  # (W, nz)
    tausum = (tausg + tausp + tausc).T  # (W, nz) scattering part
    tau = tau_cont[:, None, :] + tau_kmix  # (W, G, nz)
    w0 = jnp.where(
        tau <= const.tau_min,
        0.0,
        jnp.minimum(const.max_w0, tausum[:, None, :] / tau),
    )
    wbin = jnp.asarray(op.kset.wbin)
    tau_band = jnp.sum(tau * wbin[None, :, None], axis=1)  # (W, nz)

    # already TOA-down (inputs were flipped at entry)
    g = gt.T

    return dict(tau=tau, w0=w0, g=g, tau_band=tau_band)
