"""Instrument-file loaders: bandpass profiles and beam b_ell from files.

Compatibility with the reference's instrument archives (written by
commander_instrument.py: ``<det>/bandpassx`` [GHz], ``<det>/bandpass``
per detector; read by comm_bp_mod.f90) and HEALPix-style b_l FITS tables
(comm_B_bl_mod.f90 file input).
"""
from __future__ import annotations

import numpy as np

from .bandpass import Bandpass

GHZ = 1e9


def load_bandpass_hdf(path: str, det: str, unit: str = "uK_cmb",
                      profile_type: str = "LFI") -> Bandpass:
    """Read one detector's bandpass from a Commander instrument HDF file.

    profile_type selects the reference's per-experiment response and
    trimming conventions (comm_bp_mod.f90:99-116); thresholds applied via
    trim_profile."""
    import h5py

    from .bandpass import trim_profile

    with h5py.File(path, "r") as f:
        nu = np.asarray(f[f"{det}/bandpassx"], np.float64)
        tau = np.asarray(f[f"{det}/bandpass"], np.float64)
    if nu.max() < 1e7:      # stored in GHz
        nu = nu * GHZ
    good = tau > 0
    nu, tau = trim_profile(nu[good], tau[good], profile_type)
    return Bandpass(nu=nu, tau=tau, unit=unit, profile_type=profile_type)


def average_bandpass(bps: list[Bandpass], unit: str = "uK_cmb") -> Bandpass:
    """Band-average bandpass over detectors (the reference's band-level
    profile when per-detector ones exist)."""
    nu = bps[0].nu
    tau = np.mean([np.interp(nu, b.nu, b.tau, left=0, right=0) for b in bps],
                  axis=0)
    return Bandpass(nu=nu, tau=tau, unit=unit,
                    profile_type=bps[0].profile_type)


def load_beam_bl_fits(path: str, lmax: int) -> np.ndarray:
    """Read a b_ell FITS table (TT[,EE,BB[,TE]] columns) -> (lmax+1, ncol).

    Uses the minimal FITS reader (io.fits) on the BINTABLE; pads/truncates
    to lmax."""
    from ..io import fits as fitsio

    with open(path, "rb") as f:
        buf = f.read()
    hdr0, off = fitsio._parse_header(buf, 0)
    if hdr0.get("NAXIS", 0):
        n = 1
        for i in range(1, hdr0["NAXIS"] + 1):
            n *= hdr0.get(f"NAXIS{i}", 1)
        nbytes = n * abs(hdr0.get("BITPIX", 8)) // 8
        off += ((nbytes + 2880 - 1) // 2880) * 2880
    hdr, off = fitsio._parse_header(buf, off)
    nrows = hdr["NAXIS2"]
    ncols = hdr["TFIELDS"]
    dtypes = []
    for i in range(1, ncols + 1):
        tf = str(hdr[f"TFORM{i}"]).strip()
        repeat = int(tf[:-1]) if tf[:-1] else 1
        code = tf[-1]
        dtypes.append((f"c{i}", fitsio._TFORM_DTYPES[code], (repeat,)))
    rec = np.frombuffer(buf, dtype=np.dtype(dtypes), count=nrows, offset=off)
    cols = np.stack([rec[f"c{i}"].astype(np.float64).reshape(-1)
                     for i in range(1, ncols + 1)], axis=-1)
    out = np.zeros((lmax + 1, cols.shape[1]))
    n = min(lmax + 1, cols.shape[0])
    out[:n] = cols[:n]
    return out


# ---------------------------------------------------------------------------
# TOD instrument (RIMO) files: per-detector sidelobe/main-beam alms
# (BAND_TOD_RIMO; read by load_instrument_file, comm_tod_mod.f90:334-380;
# written by commander_instrument.py add_alms: real-packed alms at
# index l^2+l+m with m<0 slots holding sqrt(2)-scaled imaginary parts)
# ---------------------------------------------------------------------------

def _realpacked_to_complex(vals: np.ndarray, lmax: int, mmax: int):
    """Real-packed alms (lfi.complex2realAlms layout) -> complex (nl, nm).

    vals[l^2+l+m] = sqrt(2) Re a_lm (m>0), vals[l^2+l-m] = sqrt(2) Im a_lm,
    vals[l^2+l] = a_l0 (real). Returns (lmax+1, mmax+1) complex128."""
    out = np.zeros((lmax + 1, mmax + 1), np.complex128)
    for l in range(lmax + 1):
        base = l * l + l
        out[l, 0] = vals[base]
        for m in range(1, min(l, mmax) + 1):
            out[l, m] = (vals[base + m] + 1j * vals[base - m]) / np.sqrt(2.0)
    return out


def _complex_to_realpacked(alm: np.ndarray):
    """Inverse of _realpacked_to_complex: (nl, nm) complex -> (nl^2,) real."""
    nl, nm = alm.shape
    lmax = nl - 1
    vals = np.zeros((lmax + 1) ** 2)
    for l in range(lmax + 1):
        base = l * l + l
        vals[base] = alm[l, 0].real
        for m in range(1, min(l, nm - 1) + 1):
            vals[base + m] = np.sqrt(2.0) * alm[l, m].real
            vals[base - m] = np.sqrt(2.0) * alm[l, m].imag
    return vals


def load_rimo_tod(path: str, dets: list[str]):
    """Per-detector TOD instrument data from a Commander RIMO HDF file.

    Returns dict det -> {'sl': (sllmax+1, slmmax+1) complex sidelobe beam
    alms, 'beam': main-beam alms or None, 'fwhm': arcmin, 'centFreq': GHz,
    'elip', 'psi_ell', 'mbeam_eff'} mirroring load_instrument_file
    (comm_tod_mod.f90:334-380)."""
    import h5py

    out = {}
    with h5py.File(path, "r") as f:
        for det in dets:
            g = f[det]
            d = {}
            for k in ("fwhm", "elip", "psi_ell", "mbeam_eff", "centFreq"):
                d[k] = float(np.asarray(g[k])) if k in g else 0.0
            for field in ("sl", "beam"):
                if field in g and f"{field}lmax" in g:
                    lmax = int(np.asarray(g[f"{field}lmax"]).reshape(-1)[0])
                    mmax = int(np.asarray(g[f"{field}mmax"]).reshape(-1)[0])
                    vals = np.asarray(g[f"{field}/T"], np.float64).reshape(-1)
                    d[field] = _realpacked_to_complex(vals, lmax, mmax)
                else:
                    d[field] = None
            out[det] = d
    return out


def write_rimo_tod(path: str, dets: dict):
    """Write a format-compatible RIMO file (test fixtures / converters).

    dets: det -> dict with optional 'sl'/'beam' complex (nl, nm) alms and
    scalar fields; layout matches commander_instrument.py add_alms."""
    import h5py

    with h5py.File(path, "w") as f:
        for det, d in dets.items():
            for k in ("fwhm", "elip", "psi_ell", "mbeam_eff", "centFreq"):
                f.create_dataset(f"{det}/{k}", data=float(d.get(k, 0.0)))
            for field in ("sl", "beam"):
                alm = d.get(field)
                if alm is None:
                    continue
                alm = np.asarray(alm)
                f.create_dataset(f"{det}/{field}/T",
                                 data=_complex_to_realpacked(alm))
                f.create_dataset(f"{det}/{field}lmax", data=[alm.shape[0] - 1])
                f.create_dataset(f"{det}/{field}mmax", data=[alm.shape[1] - 1])
            if "bandpassx" in d:
                f.create_dataset(f"{det}/bandpassx", data=d["bandpassx"])
                f.create_dataset(f"{det}/bandpass", data=d["bandpass"])
