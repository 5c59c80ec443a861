"""Experiment-data converter: L2 exchange HDF -> Commander TOD archives.

TPU-framework counterpart of ``commander3/todscripts/lfitohdf5.py``: the
reference script reads per-operational-day Level-2 HDF files
(``LFI_0<freq>_<horn>_L2_002_OD<od>.h5`` with ``Time/OBT`` + ``AHF_info/
PID``/``PID_start``/``PID_end`` pointing-period boundaries and per-detector
``<det>/{theta, phi, psi, flag, tod}`` streams, lfitohdf5.py:116-221), cuts
each stream into pointing periods, pixelizes the angles, huffman-compresses
the differentials, and emits the archive layout read by
``comm_tod_mod.f90`` read_tod.

This converter accepts the same per-OD layout (or any HDF laid out that
way) and produces archives via ``loader.write_archive`` (which owns the
huffman encoding) plus the reference filelist format, so real experiment
data can be ingested end-to-end:

    convert_l2_to_archive(od_files, dets, nside, fsamp, out_dir)

Velocity/position auxiliaries: per-period ``vsun`` is taken from
``common/vsun`` when present (lfitohdf5 interpolates a satellite-velocity
FITS; providing it per OD file is the caller's contract here), else zeros;
``satpos`` likewise from ``common/satpos``.
"""
from __future__ import annotations

import os

import numpy as np

from ..sphere import healpix
from .loader import write_archive


def _ang2pix(nside, theta, phi):
    return np.asarray(healpix.ang2pix_ring(nside, np.asarray(theta),
                                           np.asarray(phi)), np.int64)


def read_l2_od(path: str, dets):
    """One OD exchange file -> list of per-pointing-period dicts.

    Layout (lfitohdf5.py:116-221): Time/OBT (N,), AHF_info/{PID,
    PID_start, PID_end}; per det <det>/{theta, phi, psi, flag, tod} (N,).
    Optional common/{vsun (3,), satpos (2,)} per file."""
    import h5py

    periods = []
    with h5py.File(path, "r") as f:
        obt = np.asarray(f["Time/OBT"])
        pids = np.asarray(f["AHF_info/PID"])
        p0 = np.asarray(f["AHF_info/PID_start"])
        p1 = np.asarray(f["AHF_info/PID_end"])
        vsun = (np.asarray(f["common/vsun"]) if "common/vsun" in f
                else np.zeros(3))
        satpos = (np.asarray(f["common/satpos"]) if "common/satpos" in f
                  else np.zeros(2))
        streams = {d: {k: np.asarray(f[f"{d}/{k}"])
                       for k in ("theta", "phi", "psi", "flag", "tod")}
                   for d in dets}
        for i, pid in enumerate(pids):
            sel = (obt >= p0[i]) & (obt < p1[i])
            n = int(sel.sum())
            if n < 2:
                continue
            periods.append(dict(
                pid=int(pid), n=n, vsun=vsun, satpos=satpos,
                det={d: {k: v[k][sel] for k in v} for d, v in
                     streams.items()}))
    return periods


def convert_l2_to_archive(od_files, dets, nside: int, fsamp: float,
                          out_dir: str, band_label: str = "band",
                          npsi: int = 4096):
    """Convert L2 exchange files into Commander archives + a filelist.

    Returns the filelist path. One archive per OD file (the reference
    groups ODs, lfitohdf5.py:116); scan ids are the L2 pointing-period
    PIDs; filelist weights are ntod (the load-balance weight of
    get_scan_ids, comm_tod_mod.f90:643-799)."""
    os.makedirs(out_dir, exist_ok=True)
    entries = []
    for od_path in od_files:
        periods = read_l2_od(od_path, dets)
        if not periods:
            continue
        scans = []
        for p in periods:
            nd = len(dets)
            nt = p["n"]
            pix = np.zeros((nd, nt), np.int64)
            psi = np.zeros((nd, nt))
            flag = np.zeros((nd, nt), np.int64)
            tod = np.zeros((nd, nt))
            for d, det in enumerate(dets):
                s = p["det"][det]
                pix[d] = _ang2pix(nside, s["theta"], s["phi"])
                psi[d] = np.mod(s["psi"], 2 * np.pi)
                flag[d] = s["flag"].astype(np.int64)
                tod[d] = s["tod"]
            scans.append(dict(pix=pix, psi=psi, flag=flag, tod=tod,
                              vsun=p["vsun"], satpos=p["satpos"]))
        name = os.path.splitext(os.path.basename(od_path))[0] + "_arch.h5"
        apath = os.path.join(out_dir, name)
        write_archive(apath, nside, fsamp, list(dets), scans, npsi=npsi)
        # write_archive numbers scans 1..n within the file; map back to
        # the L2 PIDs through the filelist scan ids
        for j, p in enumerate(periods):
            th = float(np.mean(periods[j]["det"][dets[0]]["theta"]))
            ph = float(np.mean(periods[j]["det"][dets[0]]["phi"]))
            entries.append((j + 1, name, p["n"], th, ph))
    flist = os.path.join(out_dir, f"filelist_{band_label}.txt")
    with open(flist, "w") as fh:
        fh.write(f"{len(entries)}\n")
        for sid, name, w, th, ph in entries:
            fh.write(f"{sid} {name} {w:.1f} {th:.5f} {ph:.5f}\n")
    return flist
