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


# ---------------------------------------------------------------------------
# LiteBIRD / genesys-sim converter (todscripts/litebird/litebirdtohdf5.py)
# ---------------------------------------------------------------------------

def convert_litebird_to_archive(det_files, dets, nside: int, fsamp: float,
                                out_dir: str, band_label: str = "LFT_40",
                                chunk_seconds: float = 3600.0,
                                npsi: int = 4096, polang=None, mbang=None,
                                vsun=None):
    """LiteBIRD-style per-detector simulation streams -> archives.

    Counterpart of todscripts/litebird/litebirdtohdf5.py: one HDF per
    detector holding full-segment {theta, phi, psi, tod} streams
    (:51-66), cut into fixed chunk_seconds pointing periods (:21-23),
    angles pixelized, per-detector polarization angles recorded in
    /common/polang (:31-36), everything differential+huffman encoded.

    det_files: {det_name: path} per-detector HDFs with datasets
    theta/phi/psi/tod (full segment, equal lengths); or {det_name: dict}
    with the same keys as arrays (tests). Returns the filelist path."""
    import h5py

    os.makedirs(out_dir, exist_ok=True)
    streams = {}
    for d in dets:
        src = det_files[d]
        if isinstance(src, dict):
            streams[d] = {k: np.asarray(src[k])
                          for k in ("theta", "phi", "psi", "tod")}
        else:
            with h5py.File(src, "r") as f:
                streams[d] = {k: np.asarray(f[k])
                              for k in ("theta", "phi", "psi", "tod")}
    n = min(len(s["tod"]) for s in streams.values())
    nsamp = max(int(chunk_seconds * fsamp), 1)
    nchunk = max(n // nsamp, 1)
    scans = []
    from ..sphere.healpix import pix2ang_ring
    th_all, ph_all = pix2ang_ring(nside)
    entries = []
    name = f"{band_label}_arch.h5"
    for c in range(nchunk):
        sl = slice(c * nsamp, min((c + 1) * nsamp, n))
        nt = sl.stop - sl.start
        nd = len(dets)
        rec = dict(pix=np.zeros((nd, nt), np.int64),
                   psi=np.zeros((nd, nt)),
                   flag=np.zeros((nd, nt), np.int64),
                   tod=np.zeros((nd, nt)),
                   vsun=np.asarray(vsun if vsun is not None
                                   else np.zeros(3)))
        for di, d in enumerate(dets):
            s = streams[d]
            rec["pix"][di] = _ang2pix(nside, s["theta"][sl], s["phi"][sl])
            rec["psi"][di] = np.mod(s["psi"][sl], 2 * np.pi)
            rec["tod"][di] = s["tod"][sl]
        scans.append(rec)
        p0 = int(rec["pix"][0, 0])
        entries.append((c + 1, name, nt, float(th_all[p0]),
                        float(ph_all[p0])))
    write_archive(os.path.join(out_dir, name), nside, fsamp, list(dets),
                  scans, npsi=npsi, polang=polang, mbang=mbang)
    flist = os.path.join(out_dir, f"filelist_{band_label}.txt")
    with open(flist, "w") as fh:
        fh.write(f"{len(entries)}\n")
        for sid, nm, w, th, ph in entries:
            fh.write(f"{sid} {nm} {w:.1f} {th:.5f} {ph:.5f}\n")
    return flist


# ---------------------------------------------------------------------------
# WMAP differential-horn converter (todscripts/wmap/fits_to_h5.py)
# ---------------------------------------------------------------------------

# J2000 celestial -> galactic rotation (the hp.Rotator(coord=['C','G'])
# matrix used at fits_to_h5.py:266-278)
_CEL2GAL = np.array([
    [-0.0548755604, -0.8734370902, -0.4838350155],
    [+0.4941094279, -0.4448296300, +0.7469822445],
    [-0.8676661490, -0.1980763734, +0.4559837762]])


def _q2m(q):
    """Quaternions (N, 4) [x,y,z,w] -> rotation matrices (N, 3, 3)
    (fits_to_h5.py:280-339 Q2M)."""
    q = np.asarray(q, np.float64)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    q1, q2, q3, q4 = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    m = np.empty((len(q), 3, 3))
    m[:, 0, 0] = q1 * q1 - q2 * q2 - q3 * q3 + q4 * q4
    m[:, 0, 1] = 2 * (q1 * q2 + q3 * q4)
    m[:, 0, 2] = 2 * (q1 * q3 - q2 * q4)
    m[:, 1, 0] = 2 * (q1 * q2 - q3 * q4)
    m[:, 1, 1] = -q1 * q1 + q2 * q2 - q3 * q3 + q4 * q4
    m[:, 1, 2] = 2 * (q2 * q3 + q1 * q4)
    m[:, 2, 0] = 2 * (q1 * q3 + q2 * q4)
    m[:, 2, 1] = 2 * (q2 * q3 - q1 * q4)
    m[:, 2, 2] = -q1 * q1 - q2 * q2 + q3 * q3 + q4 * q4
    return m


def quat_to_pointing(quat, dir_los, dir_pol, nside):
    """Spacecraft attitude quaternions + horn line-of-sight -> galactic
    (pix, psi) streams.

    quat: (N, 4) per-sample attitude (caller interpolates frame
    quaternions to the TOD rate like q_interp, fits_to_h5.py:377-419);
    dir_los/dir_pol: (3,) horn boresight and polarization axes in the
    spacecraft frame. psi is the angle of the polarization direction
    from galactic north in the tangent plane (gamma_from_pol,
    fits_to_h5.py:340-375)."""
    M = _q2m(quat)                              # body -> celestial
    d_cel = M @ np.asarray(dir_los, np.float64)
    p_cel = M @ np.asarray(dir_pol, np.float64)
    d_gal = d_cel @ _CEL2GAL.T
    p_gal = p_cel @ _CEL2GAL.T
    d_gal /= np.linalg.norm(d_gal, axis=-1, keepdims=True)
    theta = np.arccos(np.clip(d_gal[:, 2], -1.0, 1.0))
    phi = np.mod(np.arctan2(d_gal[:, 1], d_gal[:, 0]), 2 * np.pi)
    pix = _ang2pix(nside, theta, phi)
    # local east / north basis at each pointing
    st = np.maximum(np.sqrt(d_gal[:, 0] ** 2 + d_gal[:, 1] ** 2), 1e-12)
    east = np.stack([-d_gal[:, 1] / st, d_gal[:, 0] / st,
                     np.zeros(len(d_gal))], -1)
    north = (np.array([0.0, 0.0, 1.0]) - d_gal * d_gal[:, 2:3]) \
        / st[:, None]
    # project pol axis into the tangent plane
    p_t = p_gal - d_gal * np.sum(p_gal * d_gal, -1, keepdims=True)
    psi = np.arctan2(np.sum(p_t * east, -1), np.sum(p_t * north, -1))
    return pix, np.mod(psi, 2 * np.pi)


def _flags_to_tod_rate(flags, ntod):
    """'previous' interpolation of per-frame flags onto the TOD sampling
    (fits_to_h5.py:113-118)."""
    flags = np.asarray(flags)
    t0 = np.arange(len(flags))
    t = np.linspace(t0.min(), t0.max(), ntod)
    idx = np.minimum(np.searchsorted(t0, t, side="right") - 1,
                     len(flags) - 1)
    return flags[np.maximum(idx, 0)]


def convert_wmap_to_archive(days, dets, nside: int, fsamp: float,
                            out_dir: str, band_label: str = "K1",
                            n_per_day: int = 1, npsi: int = 4096,
                            x_im=None, fknee: float = 0.1,
                            alpha: float = -1.0):
    """WMAP differential-horn day records -> Commander diff archives.

    Counterpart of todscripts/wmap/fits_to_h5.py write_file_parallel
    (:54-235): per day, the frame-major TOD matrix is interleaved to a
    flat stream (:75-78), per-frame DA flags are 'previous'-interpolated
    to the TOD rate (:113-118), horn-A/B pointing/psi streams are
    pixelized/wrapped, every stream is split into n_per_day pointing
    periods, differential-encoded and huffman-compressed.

    days: list of per-day dicts with, per detector label d in `dets`,
      'tod'  {d: (nframes, nsamp_per_frame)}  uncalibrated TOD frames
      'daflags' (nframes,) int quality flags
      'gain' {d: float} gain guesses (scalars row, :72)
      and EITHER precomputed 'pixA'/'psiA'/'pixB'/'psiB' (ntod,) streams
      (per horn, shared across the DA's detectors like pix_A[j//4]) OR
      'quat' (ntod, 4) attitude + 'losA'/'losB'/'polA'/'polB' (3,) axes
      (routed through quat_to_pointing). Optional 'vsun' (3,).

    Returns the filelist path."""
    os.makedirs(out_dir, exist_ok=True)
    from .loader import write_archive_diff

    entries = []
    x_im = np.zeros(len(dets)) if x_im is None else np.asarray(x_im)
    for day_i, day in enumerate(days):
        if "pixA" in day:
            pixA, psiA = np.asarray(day["pixA"]), np.asarray(day["psiA"])
            pixB, psiB = np.asarray(day["pixB"]), np.asarray(day["psiB"])
        else:
            pixA, psiA = quat_to_pointing(day["quat"], day["losA"],
                                          day["polA"], nside)
            pixB, psiB = quat_to_pointing(day["quat"], day["losB"],
                                          day["polB"], nside)
        ntod_day = len(pixA)
        scans = []
        splits = np.array_split(np.arange(ntod_day), n_per_day)
        for chunk in splits:
            nd, nt = len(dets), len(chunk)
            rec = dict(pixA=np.zeros((nd, nt), np.int64),
                       psiA=np.zeros((nd, nt)),
                       pixB=np.zeros((nd, nt), np.int64),
                       psiB=np.zeros((nd, nt)),
                       flag=np.zeros((nd, nt), np.int64),
                       tod=np.zeros((nd, nt)),
                       vsun=np.asarray(day.get("vsun", np.zeros(3))),
                       scalars=np.zeros((nd, 4)),
                       x_im=x_im)
            for d, det in enumerate(dets):
                frames = np.asarray(day["tod"][det], np.float64)
                # interleave frame-major TOD: tod[n::nsamp] = TOD[:, n]
                flat = frames.reshape(-1, order="C") \
                    if frames.ndim == 1 else frames.ravel(order="C")
                flat = flat[:ntod_day]
                flags = _flags_to_tod_rate(day["daflags"], ntod_day)
                rec["pixA"][d] = pixA[chunk]
                rec["psiA"][d] = np.mod(psiA[chunk], 2 * np.pi)
                rec["pixB"][d] = pixB[chunk]
                rec["psiB"][d] = np.mod(psiB[chunk], 2 * np.pi)
                rec["flag"][d] = flags[chunk].astype(np.int64)
                rec["tod"][d] = flat[chunk]
                g = float(day.get("gain", {}).get(det, 1.0))
                rec["scalars"][d] = [g, float(flat[chunk].std() or 1.0),
                                     fknee, alpha]
            scans.append(rec)
        name = f"wmap_{band_label}_{day_i + 1:06d}_arch.h5"
        write_archive_diff(os.path.join(out_dir, name), nside, fsamp,
                           list(dets), scans, npsi=npsi)
        from ..sphere.healpix import pix2ang_ring
        th_all, ph_all = pix2ang_ring(nside)
        for j, chunk in enumerate(splits):
            p0 = int(pixA[chunk[0]])
            entries.append((j + 1, name, len(chunk), float(th_all[p0]),
                            float(ph_all[p0])))
    flist = os.path.join(out_dir, f"filelist_{band_label}.txt")
    with open(flist, "w") as fh:
        fh.write(f"{len(entries)}\n")
        for sid, name, w, th, ph in entries:
            fh.write(f"{sid} {name} {w:.1f} {th:.5f} {ph:.5f}\n")
    return flist
