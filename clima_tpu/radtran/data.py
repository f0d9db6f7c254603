"""Optical property data: containers, HDF5 loaders, k-settings.

Mirrors the data model of ``src/radtran/clima_radtran_types.f90:23-141`` and
the load-time regridding of ``clima_radtran_types_create.f90``:

* k-tables: HDF5 ``weights/log10P/T/wavelengths/log10k[ngauss,npress,ntemp,nwav]``
  (:1265-1378); wavelengths define the master grid.
* CIA/generic xsections: ``log10xs`` (1-D or [ntemp, nwav]) sampled on the
  file's own wavelength grid, regridded to the master bins with
  addpnt/inter2 sentinel semantics (:1090-1263).
* Rayleigh: A/B/Delta coefficients from rayleigh.yaml + the Vardavas closed
  form evaluated per master bin (:1048-1088).
* photolysis xsections: ``photoabsorption`` regridded with
  interp_discrete_to_bins/FillValue (:1407-1468).
* Mie particles: ``w0/qext/g0[nrad, nwav]`` regridded with
  interp_discrete_to_bins/Constant; radii um->cm (:734-866).
* water continuum: ``log10xs_H2O/log10xs_foreign[ntemp, nwav]`` (:868-1046).
* wavelength channels: ``bins.h5`` ``sol_wavl``/``ir_wavl`` subranges of the
  master grid (:226-270, 647-687).

All tables are resampled onto the master wavelength grid at load time and
stored as plain numpy arrays; they enter jitted compute as constants.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np
import yaml

from ..ops.rebin import addpnt, inter2, interp_discrete_to_bins
from ..physics.eqns import rayleigh_vardavas, weights_to_bins
from .. import constants as const
from ..utils.errors import ClimaException

__all__ = [
    "Ktable",
    "Xsection",
    "ParticleXsection",
    "WaterContinuum",
    "Ksettings",
    "OpticalData",
    "ChannelInfo",
    "load_optical_data",
    "load_channel",
    "read_stellar_flux",
]

RDELTA = 1.0e-4
# Far-end sentinel for addpnt padding. The reference uses huge(); a smaller
# finite value avoids float overflow in the cumulative-integral inter2 while
# still covering any conceivable wavelength grid.
HUGE = 1.0e30


@dataclasses.dataclass
class Ktable:
    sp_ind: int
    weights: np.ndarray  # (ngauss,)
    weight_e: np.ndarray  # (ngauss+1,)
    log10P: np.ndarray  # (npress,) log10(bar)
    temp: np.ndarray  # (ntemp,)
    log10k: np.ndarray  # (ngauss, npress, ntemp, nw)

    @property
    def ngauss(self):
        return len(self.weights)


@dataclasses.dataclass
class Xsection:
    kind: str  # "CIA" | "rayleigh" | "absorption" | "photolysis"
    sp_inds: tuple
    dim: int  # 0 or 1
    xs_0d: Optional[np.ndarray] = None  # (nw,) linear units
    temp: Optional[np.ndarray] = None  # (ntemp,)
    log10_xs: Optional[np.ndarray] = None  # (ntemp, nw)


@dataclasses.dataclass
class ParticleXsection:
    p_ind: int
    dat_name: str
    radii: np.ndarray  # (nrad,) cm
    w0: np.ndarray  # (nrad, nw)
    qext: np.ndarray  # (nrad, nw)
    gt: np.ndarray  # (nrad, nw)


@dataclasses.dataclass
class WaterContinuum:
    model: str
    LH2O: int
    temp: np.ndarray  # (ntemp,)
    log10_xs_H2O: np.ndarray  # (ntemp, nw)
    log10_xs_foreign: np.ndarray  # (ntemp, nw)


@dataclasses.dataclass
class Ksettings:
    k_method: str
    nbin: int
    wbin: np.ndarray  # (nbin,)
    wbin_e: np.ndarray  # (nbin+1,)


@dataclasses.dataclass
class OpticalData:
    species_names: list
    particle_names: list
    nw: int
    wavl: np.ndarray  # (nw+1,) nm
    freq: np.ndarray  # (nw+1,) Hz
    kset: Ksettings
    k: list  # [Ktable]
    cia: list  # [Xsection]
    ray: list  # [Xsection]
    axs: list  # [Xsection]
    pxs: list  # [Xsection]
    part: list  # [ParticleXsection]
    cont: Optional[WaterContinuum]

    @property
    def nk(self):
        return len(self.k)

    def opacities2yaml(self) -> str:
        """Introspection string (clima_radtran_types.f90:328-426)."""
        out = []
        out.append(f"  k-method: {self.kset.k_method}")
        out.append("  opacities:")
        if self.k:
            names = ", ".join(self.species_names[kt.sp_ind] for kt in self.k)
            out.append(f"    k-distributions: [{names}]")
        if self.cia:
            names = ", ".join(
                f"{self.species_names[x.sp_inds[0]]}-{self.species_names[x.sp_inds[1]]}"
                for x in self.cia
            )
            out.append(f"    CIA: [{names}]")
        if self.ray:
            names = ", ".join(self.species_names[x.sp_inds[0]] for x in self.ray)
            out.append(f"    rayleigh: [{names}]")
        if self.pxs:
            names = ", ".join(self.species_names[x.sp_inds[0]] for x in self.pxs)
            out.append(f"    photolysis-xs: [{names}]")
        if self.cont is not None:
            out.append(f"    water-continuum: {self.cont.model}")
        if self.part:
            items = ", ".join(
                "{name: %s, data: %s}" % (self.particle_names[p.p_ind], p.dat_name)
                for p in self.part
            )
            out.append(f"    particle-xs: [{items}]")
        return "\n".join(out)


@dataclasses.dataclass
class ChannelInfo:
    channel_type: str  # "solar" | "ir"
    ind_start: int  # 0-based bin index into master grid
    ind_end: int  # inclusive
    nw: int
    wavl: np.ndarray
    freq: np.ndarray


# ----------------------------------------------------------------------------
# HDF5 readers
# ----------------------------------------------------------------------------


def _h5():
    import h5py

    return h5py


def _regrid_log10xs_rows(wavl, wav_f_nm, rows, fill):
    """addpnt sentinels + inter2 regrid of log10 xsection rows onto the bins."""
    out = np.zeros((rows.shape[0], len(wavl) - 1))
    for i in range(rows.shape[0]):
        x = wav_f_nm.copy()
        y = rows[i].copy()
        x, y = addpnt(x, y, x[0] * (1.0 - RDELTA), fill)
        x, y = addpnt(x, y, 0.0, fill)
        x, y = addpnt(x, y, x[-1] * (1.0 + RDELTA), fill)
        x, y = addpnt(x, y, HUGE, fill)
        out[i] = inter2(wavl, x, y)
    return out


def read_ktable(filename: str, sp_ind: int):
    """Read a k-distribution HDF5 file; returns (Ktable, master wavl in nm)."""
    h5py = _h5()
    with h5py.File(filename, "r") as f:
        weights = f["weights"][:].astype(np.float64)
        log10P = f["log10P"][:].astype(np.float64)
        temp = f["T"][:].astype(np.float64)
        wavl = f["wavelengths"][:].astype(np.float64) * 1.0e3  # um -> nm
        log10k = f["log10k"][:].astype(np.float64)
    weight_e = np.asarray(weights_to_bins(weights))
    kt = Ktable(
        sp_ind=sp_ind,
        weights=weights,
        weight_e=weight_e,
        log10P=log10P,
        temp=temp,
        log10k=log10k,
    )
    if log10k.shape != (len(weights), len(log10P), len(temp), len(wavl) - 1):
        raise ClimaException(f'"log10k" has the wrong shape in "{filename}"')
    return kt, wavl


def read_h5_xsection(filename: str, kind: str, sp_inds: tuple, wavl: np.ndarray) -> Xsection:
    h5py = _h5()
    with h5py.File(filename, "r") as f:
        if "log10xs" not in f:
            raise ClimaException(f'{filename}: dataset "log10xs" does not exist')
        log10xs = f["log10xs"][:].astype(np.float64)
        wav_f = f["wavelengths"][:].astype(np.float64) * 1.0e3  # um->nm
        dim = log10xs.ndim - 1
        if dim == 0:
            xs = _regrid_log10xs_rows(wavl, wav_f, log10xs[None, :], const.log10tiny)[0]
            return Xsection(kind=kind, sp_inds=sp_inds, dim=0, xs_0d=10.0**xs)
        elif dim == 1:
            temp = f["T"][:].astype(np.float64)
            rows = _regrid_log10xs_rows(wavl, wav_f, log10xs, const.log10tiny)
            return Xsection(
                kind=kind, sp_inds=sp_inds, dim=1, temp=temp, log10_xs=rows
            )
        raise ClimaException(f"Issue reading {filename}")


def read_particle_xsection(filename: str, p_ind: int, dat_name: str, wavl) -> ParticleXsection:
    h5py = _h5()
    with h5py.File(filename, "r") as f:
        wv = f["wavelengths"][:].astype(np.float64) * 1.0e3  # um->nm
        radii = f["radii"][:].astype(np.float64) / 1.0e4  # um->cm
        w0 = f["w0"][:].astype(np.float64)
        qext = f["qext"][:].astype(np.float64)
        g0 = f["g0"][:].astype(np.float64)
    nrad = len(radii)
    nw = len(wavl) - 1
    w0_o = np.zeros((nrad, nw))
    qe_o = np.zeros((nrad, nw))
    g0_o = np.zeros((nrad, nw))
    for i in range(nrad):
        w0_o[i] = interp_discrete_to_bins(wavl, wv, w0[i], "Constant")
        qe_o[i] = interp_discrete_to_bins(wavl, wv, qext[i], "Constant")
        g0_o[i] = interp_discrete_to_bins(wavl, wv, g0[i], "Constant")
    return ParticleXsection(
        p_ind=p_ind, dat_name=dat_name, radii=radii, w0=w0_o, qext=qe_o, gt=g0_o
    )


def read_water_continuum(model: str, filename: str, species_names, wavl) -> WaterContinuum:
    if "H2O" not in species_names:
        raise ClimaException('"H2O" must be a species to include the "continuum" opacity')
    if len(species_names) <= 1:
        raise ClimaException(
            'There must be more than 1 species in order to use the "continuum" opacity'
        )
    h5py = _h5()
    with h5py.File(filename, "r") as f:
        wav_f = f["wavelengths"][:].astype(np.float64) * 1.0e3
        temp = f["T"][:].astype(np.float64)
        xs_h2o = f["log10xs_H2O"][:].astype(np.float64)
        xs_for = f["log10xs_foreign"][:].astype(np.float64)
    return WaterContinuum(
        model=model,
        LH2O=species_names.index("H2O"),
        temp=temp,
        log10_xs_H2O=_regrid_log10xs_rows(wavl, wav_f, xs_h2o, const.log10tiny),
        log10_xs_foreign=_regrid_log10xs_rows(wavl, wav_f, xs_for, const.log10tiny),
    )


def read_photolysis_xsection(filename: str, sp: str, sp_ind: int, wavl) -> Xsection:
    h5py = _h5()
    if not os.path.exists(filename):
        raise ClimaException(f'Species "{sp}" does not have photolysis xsection data')
    with h5py.File(filename, "r") as f:
        wv = f["wavelengths"][:].astype(np.float64)
        xs = f["photoabsorption"][:].astype(np.float64)
    xs = np.log10(np.maximum(xs, 1e-300))
    out = interp_discrete_to_bins(wavl, wv, xs, "FillValue", const.log10tiny)
    return Xsection(kind="photolysis", sp_inds=(sp_ind,), dim=0, xs_0d=10.0**out)


def read_rayleigh(filename: str, sp: str, sp_ind: int, wavl) -> Xsection:
    with open(filename) as f:
        root = yaml.safe_load(f)
    if sp not in root:
        raise ClimaException(f'Species "{sp}" has no Rayleigh data in {filename}')
    d = root[sp]["data"]
    wbin_centers = wavl[:-1]
    xs = np.array(
        [
            float(rayleigh_vardavas(d["A"], d["B"], d["Delta"], w))
            for w in wbin_centers
        ]
    )
    return Xsection(kind="rayleigh", sp_inds=(sp_ind,), dim=0, xs_0d=xs)


def read_stellar_flux(star_file: str, wavl: np.ndarray) -> np.ndarray:
    """Read stellar flux txt (wv nm, flux mW/m2/nm) -> per-bin mW/m2/Hz.

    Mirrors ``read_stellar_flux`` (clima_radtran_types_create.f90:9-78).
    """
    data = np.loadtxt(star_file, skiprows=1)
    wv = data[:, 0].astype(np.float64)
    fl = data[:, 1].astype(np.float64)
    x, y = addpnt(wv, fl, wv[0] * (1.0 - RDELTA), 0.0)
    x, y = addpnt(x, y, 0.0, 0.0)
    x, y = addpnt(x, y, x[-1] * (1.0 + RDELTA), 0.0)
    x, y = addpnt(x, y, HUGE, 0.0)
    flux = inter2(wavl, x, y)  # mW/m2/nm per bin
    wavl_av = 0.5 * (wavl[:-1] + wavl[1:])
    return flux * (((wavl_av * 1.0e-9) * wavl_av) / const.c_light)  # mW/m2/Hz


# ----------------------------------------------------------------------------
# Assembly (create_OpticalProperties, clima_radtran_types_create.f90:272-645)
# ----------------------------------------------------------------------------


def load_optical_data(datadir: str, species_names, particle_names, sop) -> OpticalData:
    species_names = list(species_names)
    particle_names = list(particle_names)

    # --- k-distributions ---
    if sop.k_distributions_bool:
        klist = [
            s
            for s in species_names
            if os.path.exists(os.path.join(datadir, "kdistributions", s + ".h5"))
        ]
        if not klist:
            raise ClimaException(
                "No k-distribution data was found, but at least one k-distribution is needed."
            )
    elif sop.k_distributions:
        klist = list(sop.k_distributions)
    else:
        raise ClimaException(
            "You must specify at least one k-distribution in the settings file."
        )

    ktables = []
    wavl = None
    for s in klist:
        if s not in species_names:
            raise ClimaException(
                f'Species "{s}" in optical property "k-distributions" is not in the list of species.'
            )
        kt, wavl_s = read_ktable(
            os.path.join(datadir, "kdistributions", s + ".h5"), species_names.index(s)
        )
        if wavl is None:
            wavl = wavl_s
        else:
            if len(wavl_s) != len(wavl) or not np.allclose(wavl_s, wavl, rtol=1e-7):
                raise ClimaException(
                    f'Species "{s}" has wavelength bins that do not match other species'
                )
        ktables.append(kt)
    for kt in ktables[1:]:
        if kt.ngauss != ktables[0].ngauss or not np.allclose(
            kt.weights, ktables[0].weights, rtol=1e-12
        ):
            raise ClimaException("All k-coeff bin weights must match.")

    kset = Ksettings(
        k_method=sop.k_method,
        nbin=ktables[0].ngauss,
        wbin=ktables[0].weights,
        wbin_e=ktables[0].weight_e,
    )
    # Note: "AdaptiveEquivalentExtinction" is declared-but-unimplemented in
    # the reference (clima_radtran_types.f90:761-763); here it is a working
    # sort-free mixing method (clima_tpu.ops.rorr.k_aee_mix).

    # --- CIA ---
    cia = []
    cia_names = []
    if sop.cia_bool:
        for s1 in species_names:
            for s2 in species_names:
                name = f"{s1}-{s2}"
                fn = os.path.join(datadir, "CIA", name + ".h5")
                if os.path.exists(fn) and not (
                    sop.water_continuum is not None and "H2O" in (s1, s2)
                ):
                    cia_names.append(name)
    elif sop.cia:
        cia_names = list(sop.cia)
    for name in cia_names:
        parts = _parse_cia_pair(name, species_names)
        fn = os.path.join(datadir, "CIA", name + ".h5")
        cia.append(read_h5_xsection(fn, "CIA", parts, wavl))
        if sop.water_continuum is not None and "H2O" in name.split("-"):
            raise ClimaException(
                f'Optical property "water-continuum" is set, but CIA "{name}" is also set.'
            )

    # --- Rayleigh ---
    ray = []
    if sop.rayleigh_bool or sop.rayleigh:
        fn = os.path.join(datadir, "rayleigh", "rayleigh.yaml")
        with open(fn) as f:
            rayroot = yaml.safe_load(f)
        if sop.rayleigh_bool:
            rlist = [s for s in rayroot.keys() if s in species_names]
        else:
            rlist = list(sop.rayleigh)
        for s in rlist:
            if s not in species_names:
                raise ClimaException(
                    f'Species "{s}" in optical property "rayleigh" is not in the list of species.'
                )
            ray.append(read_rayleigh(fn, s, species_names.index(s), wavl))

    # --- photolysis xsections ---
    pxs = []
    if sop.photolysis_bool:
        plist = [
            s
            for s in species_names
            if os.path.exists(os.path.join(datadir, "xsections", s + ".h5"))
        ]
    elif sop.photolysis_xs:
        plist = list(sop.photolysis_xs)
    else:
        plist = []
    for s in plist:
        if s not in species_names:
            raise ClimaException(
                f'Species "{s}" in optical property "photolysis-xs" is not in the list of species.'
            )
        pxs.append(
            read_photolysis_xsection(
                os.path.join(datadir, "xsections", s + ".h5"), s, species_names.index(s), wavl
            )
        )

    # --- particles ---
    part = []
    if sop.particle_xs:
        for p in sop.particle_xs:
            if p["name"] not in particle_names:
                raise ClimaException(
                    f'Species "{p["name"]}" in optical property "particle-xs" is not in the list of particles.'
                )
            fn = os.path.join(
                datadir, "aerosol_xsections", p["dat"], "mie_" + p["dat"] + ".h5"
            )
            part.append(
                read_particle_xsection(fn, particle_names.index(p["name"]), p["dat"], wavl)
            )

    # --- water continuum ---
    cont = None
    if sop.water_continuum is not None:
        fn = os.path.join(datadir, "water_continuum", sop.water_continuum + ".h5")
        if not os.path.exists(fn):
            raise ClimaException(f'Continuum "{sop.water_continuum}" is not avaliable.')
        cont = read_water_continuum(sop.water_continuum, fn, species_names, wavl)

    freq = const.c_light / (wavl * 1.0e-9)
    return OpticalData(
        species_names=species_names,
        particle_names=particle_names,
        nw=len(wavl) - 1,
        wavl=wavl,
        freq=freq,
        kset=kset,
        k=ktables,
        cia=cia,
        ray=ray,
        axs=[],
        pxs=pxs,
        part=part,
        cont=cont,
    )


def _parse_cia_pair(pair_str: str, species_names):
    """Parse 'A-B' into species indices (types_create.f90:689-732)."""
    matches = []
    for p in range(1, len(pair_str) - 1):
        if pair_str[p] != "-":
            continue
        left, right = pair_str[:p], pair_str[p + 1 :]
        if left in species_names and right in species_names:
            matches.append((species_names.index(left), species_names.index(right)))
    if len(matches) == 0:
        raise ClimaException(
            f'Could not parse CIA species pair "{pair_str}" into two known species.'
        )
    if len(matches) > 1:
        raise ClimaException(f'CIA species pair "{pair_str}" is ambiguous.')
    return matches[0]


def load_channel(datadir: str, channel_type: str, wavelength_bins_file, op: OpticalData) -> ChannelInfo:
    """Build an RT channel as a subrange of the master grid (types_create.f90:226-270)."""
    h5py = _h5()
    filename = wavelength_bins_file or os.path.join(datadir, "kdistributions", "bins.h5")
    key = "sol_wavl" if channel_type == "solar" else "ir_wavl"
    with h5py.File(filename, "r") as f:
        wavl = f[key][:].astype(np.float64) * 1.0e3  # um->nm
    ind1 = int(np.argmin(np.abs(wavl[0] - op.wavl)))
    ind2 = int(np.argmin(np.abs(wavl[-1] - op.wavl)))
    seg = op.wavl[ind1 : ind2 + 1]
    if len(wavl) != len(seg) or not np.allclose(wavl, seg, rtol=1e-7):
        raise ClimaException(
            f'The wavelength bins "{filename}" are not compatible with the k-distribution wavelength bins.'
        )
    freq = const.c_light / (wavl * 1.0e-9)
    return ChannelInfo(
        channel_type=channel_type,
        ind_start=ind1,
        ind_end=ind2 - 1,
        nw=len(wavl) - 1,
        wavl=wavl,
        freq=freq,
    )
