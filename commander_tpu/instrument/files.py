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
