"""HDF5 chain files: Commander-compatible sample storage + resume.

TPU-native counterpart of ``comm_output_mod.f90`` (init_chain_file :30-90,
output_FITS_sample/output_hdf_sample :91-374) and the resume logic of
``comm_signal_mod.f90`` initialize_from_chain (:237-432) and the driver's
restart scan (commander.f90:160-174).

Layout (mirrors the reference chain files so Commander chain consumers can
read ours):
    /000001/<comp>/alm     (nmaps, nalm_packed) float64  [packed real alms]
    /000001/<comp>/map     (nmaps, npix)  [optional]
    /000001/<comp>/Dl      (nmaps, lmax+1)
    /000001/<comp>/specind (npar, ...)    [spectral parameters]
    /000001/gain           (nband,)
    /000001/bp_delta       (nband,)
    /parameters/...        model metadata
Sample groups are zero-padded 6-digit indices like the reference.

The packed-alm convention follows Commander: for each (l, m>=0) complex
coefficient, real coefficients a(l, m) = sqrt(2) Re, a(l, -m) = sqrt(2) Im
(m=0: plain real), index i = l^2 + l + m — the HEALPix "real alm" layout the
reference writes (comm_output_mod alm output).
"""
from __future__ import annotations

import os
from typing import Optional

import h5py
import numpy as np


def pack_alm_real(alm: np.ndarray, lmax: int) -> np.ndarray:
    """Complex (..., lmax+1, mmax+1) -> packed real (..., (lmax+1)^2)
    with index i = l^2 + l + m, m in [-l, l]."""
    shape = alm.shape[:-2]
    out = np.zeros(shape + ((lmax + 1) ** 2,), dtype=np.float64)
    for l in range(lmax + 1):
        base = l * l + l
        out[..., base] = alm[..., l, 0].real
        ms = np.arange(1, l + 1)
        out[..., base + ms] = np.sqrt(2.0) * alm[..., l, 1:l + 1].real
        out[..., base - ms] = np.sqrt(2.0) * alm[..., l, 1:l + 1].imag
    return out


def unpack_alm_real(packed: np.ndarray, lmax: int) -> np.ndarray:
    """Inverse of pack_alm_real."""
    shape = packed.shape[:-1]
    out = np.zeros(shape + (lmax + 1, lmax + 1), dtype=np.complex128)
    for l in range(lmax + 1):
        base = l * l + l
        out[..., l, 0] = packed[..., base]
        ms = np.arange(1, l + 1)
        out[..., l, 1:l + 1] = (packed[..., base + ms]
                                + 1j * packed[..., base - ms]) / np.sqrt(2.0)
    return out


class ChainFile:
    """Append-only chain writer/reader (one file per chain, like
    chain_c0001.h5)."""

    def __init__(self, path: str, mode: str = "a"):
        self.path = path
        self.f = h5py.File(path, mode)

    def close(self):
        self.f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    @staticmethod
    def sample_name(i: int) -> str:
        return f"{i:06d}"

    def last_sample(self) -> int:
        """Highest complete sample index present (0 if none) — the restart
        discovery of init_chain_file (comm_output_mod.f90:30-90)."""
        idx = [int(k) for k in self.f.keys() if k.isdigit()]
        return max(idx) if idx else 0

    def write_sample(self, i: int, comps: dict, gains=None, bp_deltas=None,
                     extra: Optional[dict] = None):
        """comps: {name: {'alm': complex (S,nl,nm), 'Dl': (S,nl),
        'specind': array, 'map': (S,P)}} — alm packed on write."""
        g = self.f.require_group(self.sample_name(i))
        for name, fields in comps.items():
            cg = g.require_group(name)
            for k, v in fields.items():
                if v is None:
                    continue
                v = np.asarray(v)
                if k == "alm":
                    lmax = v.shape[-2] - 1
                    v = pack_alm_real(v, lmax)
                    cg.attrs["lmax"] = lmax
                if k in cg:
                    del cg[k]
                cg.create_dataset(k, data=v)
        if gains is not None:
            if "gain" in g:
                del g["gain"]
            g.create_dataset("gain", data=np.asarray(gains))
        if bp_deltas is not None:
            if "bp_delta" in g:
                del g["bp_delta"]
            g.create_dataset("bp_delta", data=np.asarray(bp_deltas))
        if extra:
            eg = g.require_group("aux")
            for k, v in extra.items():
                if k in eg:
                    del eg[k]
                eg.create_dataset(k, data=np.asarray(v))
        self.f.flush()

    def read_sample(self, i: int) -> dict:
        g = self.f[self.sample_name(i)]
        out = {"comps": {}}
        for name, item in g.items():
            if name == "gain":
                out["gain"] = np.asarray(item)
            elif name == "bp_delta":
                out["bp_delta"] = np.asarray(item)
            elif name == "aux":
                out["aux"] = {k: np.asarray(v) for k, v in item.items()}
            else:
                fields = {}
                for k, v in item.items():
                    arr = np.asarray(v)
                    if k == "alm":
                        arr = unpack_alm_real(arr, int(item.attrs["lmax"]))
                    fields[k] = arr
                out["comps"][name] = fields
        return out

    def write_tod_state(self, i: int, band_label: str, tod: dict):
        """Per-band TOD instrument state under <samp>/tod/<band> — the
        reference's tod%dumpToHDF chain output (comm_output_mod.f90:91-374;
        gain and xi_n = (sigma0, fknee, alpha) per scan x det, plus per-det
        monopoles), so restart resumes the SAMPLED TOD state rather than
        the archive warm start (tod%initHDF)."""
        g = self.f.require_group(f"{self.sample_name(i)}/tod/{band_label}")
        for k, v in tod.items():
            if v is None:
                continue
            if k in g:
                del g[k]
            g.create_dataset(k, data=np.asarray(v))
        self.f.flush()

    def read_tod_state(self, i: int) -> dict:
        """{band_label: {field: array}} stored by write_tod_state (empty
        when the sample predates TOD-state checkpointing)."""
        path = f"{self.sample_name(i)}/tod"
        if path not in self.f:
            return {}
        out = {}
        for band, item in self.f[path].items():
            out[band] = {k: np.asarray(v) for k, v in item.items()}
        return out

    def write_metadata(self, meta: dict):
        pg = self.f.require_group("parameters")
        for k, v in meta.items():
            pg.attrs[k] = v

    def read_metadata(self) -> dict:
        if "parameters" not in self.f:
            return {}
        return dict(self.f["parameters"].attrs)
