"""Commander TOD HDF5 archive reader/writer.

Format compatibility with the reference's TOD archives (written by
commander_tools/tod_tools/commander_tod.py + todscripts/lfitohdf5.py, read
by comm_tod_mod.f90 read_tod/read_hdf_scan):

    /common/{fsamp, nside, npsi, det, polang, mbang, [pids]}
    /NNNNNN/common/{ntod, time, vsun, satpos, hufftree, huffsymb}
    /NNNNNN/<det>/{pix, psi, flag, tod, scalars}

pix/psi/flag are differential-encoded + Huffman-compressed bitstreams
(leading padding byte); psi is quantized to npsi bins before encoding;
scalars = [gain, sigma0, fknee, alpha]. The loader buckets scans to the
maximum ntod with masks (static shapes for jit) and returns a TodBlock.
"""
from __future__ import annotations

import numpy as np
import h5py
import jax.numpy as jnp

from . import huffman
from .model import TodBlock, TodState


def write_archive(path: str, nside: int, fsamp: float, det_names: list,
                  scans: list, npsi: int = 4096, polang=None, mbang=None):
    """scans: list of dicts with keys
    {'pix' (Nd, Nt), 'psi' (Nd, Nt), 'flag' (Nd, Nt), 'tod' (Nd, Nt),
     'vsun' (3,), optional 'scalars' (Nd, 4)}. polang/mbang: per-det
    polarization / main-beam angles (radians; litebirdtohdf5.py:31-36)."""
    with h5py.File(path, "w") as f:
        f.create_dataset("common/fsamp", data=fsamp)
        f.create_dataset("common/nside", data=[nside])
        f.create_dataset("common/npsi", data=[npsi])
        f.create_dataset("common/det", data=np.bytes_(", ".join(det_names)))
        f.create_dataset("common/polang",
                         data=np.zeros(len(det_names)) if polang is None
                         else np.asarray(polang, np.float64))
        f.create_dataset("common/mbang",
                         data=np.zeros(len(det_names)) if mbang is None
                         else np.asarray(mbang, np.float64))
        f.create_dataset("common/pids", data=np.arange(1, len(scans) + 1))
        for i, sc in enumerate(scans):
            pid = f"{i + 1:06d}"
            nd, nt = sc["pix"].shape
            # shared tree over all detectors' diff streams of this scan
            diffs = []
            psi_bin = (np.round(np.asarray(sc["psi"]) / (2 * np.pi / npsi))
                       .astype(np.int64) % npsi)
            for d in range(nd):
                diffs.append(np.diff(np.asarray(sc["pix"][d], np.int64),
                                     prepend=0))
                diffs.append(np.diff(psi_bin[d], prepend=0))
                diffs.append(np.diff(np.asarray(sc["flag"][d], np.int64),
                                     prepend=0))
            tree, symb = huffman.build_tree(np.concatenate(diffs))
            f.create_dataset(f"{pid}/common/ntod", data=[nt])
            f.create_dataset(f"{pid}/common/time", data=[0.0, 0.0, 0.0])
            f.create_dataset(f"{pid}/common/vsun", data=np.asarray(sc["vsun"]))
            f.create_dataset(f"{pid}/common/satpos",
                             data=np.asarray(sc.get("satpos", [0.0, 0.0])))
            f.create_dataset(f"{pid}/common/hufftree", data=tree)
            f.create_dataset(f"{pid}/common/huffsymb", data=symb)
            for d, det in enumerate(det_names):
                g = f"{pid}/{det}"
                f.create_dataset(
                    g + "/pix", data=np.void(huffman.encode(diffs[3 * d],
                                                            tree, symb)))
                f.create_dataset(
                    g + "/psi", data=np.void(huffman.encode(diffs[3 * d + 1],
                                                            tree, symb)))
                f.create_dataset(
                    g + "/flag", data=np.void(huffman.encode(diffs[3 * d + 2],
                                                             tree, symb)))
                f.create_dataset(g + "/tod",
                                 data=np.asarray(sc["tod"][d], np.float32))
                sca = sc.get("scalars")
                f.create_dataset(g + "/scalars",
                                 data=np.asarray(sca[d]) if sca is not None
                                 else np.array([1.0, 1.0, 0.1, -1.0]))


def _decode_stream(ds, tree, symb, ntod):
    raw = bytes(np.void(ds[()]).tobytes() if isinstance(ds[()], np.void)
                else ds[()].tobytes())
    vals = huffman.decode(raw, tree, symb, n_expected=ntod)
    return np.cumsum(vals)


def read_archive(path: str, flag_mask: int = 0, bad_flag_bits: int = 0,
                 scan_ids=None, dets=None):
    """Load an archive into (TodBlock, TodState seed, meta dict).

    Scans are padded to max ntod; padded samples have mask 0. Samples whose
    flag has any bit of bad_flag_bits set are masked — iand(flag, flag0)!=0,
    comm_tod_mod.f90:1331 — so bad_flag_bits=0 (the BAND_TOD_FLAG default)
    masks nothing. scan_ids restricts to those 1-based PIDs; dets restricts
    to a detector subset (BAND_TOD_DETECTOR_LIST)."""
    with h5py.File(path, "r") as f:
        fsamp = float(np.asarray(f["common/fsamp"]))
        nside = int(np.asarray(f["common/nside"])[0])
        npsi = int(np.asarray(f["common/npsi"])[0])
        all_dets = [s.strip() for s in
                    f["common/det"][()].decode().split(",")]
        dets = [d for d in all_dets if dets is None or d in dets]
        sel = [all_dets.index(d) for d in dets]
        polang = (np.asarray(f["common/polang"])[sel]
                  if "common/polang" in f else np.zeros(len(dets)))
        pids = sorted(k for k in f.keys() if k.isdigit())
        if scan_ids is not None:
            want = {int(s) for s in scan_ids}
            have = {int(p) for p in pids}
            missing = sorted(want - have)
            if missing:
                raise KeyError(
                    f"archive {path!r} is missing requested scan ids "
                    f"{missing} (archive holds {sorted(have)[:5]}... "
                    f"{len(have)} scans)")
            pids = [p for p in pids if int(p) in want]
        if not pids:
            raise ValueError(f"archive {path!r} contains no scan groups")
        ntods = [int(np.asarray(f[f"{p}/common/ntod"])[0]) for p in pids]
        nt_max = max(ntods)
        Ns, Nd = len(pids), len(dets)
        tod = np.zeros((Ns, Nd, nt_max), np.float64)
        pix = np.zeros((Ns, Nd, nt_max), np.int32)
        psi = np.zeros((Ns, Nd, nt_max), np.float64)
        mask = np.zeros((Ns, Nd, nt_max), np.float64)
        vsun = np.zeros((Ns, 3), np.float64)
        satpos = np.zeros((Ns, 2), np.float64)
        scal = np.ones((Ns, Nd, 4), np.float64)
        for s, p in enumerate(pids):
            nt = ntods[s]
            tree = np.asarray(f[f"{p}/common/hufftree"], np.int64)
            symb = np.asarray(f[f"{p}/common/huffsymb"], np.int64)
            vsun[s] = np.asarray(f[f"{p}/common/vsun"])
            if f"{p}/common/satpos" in f:
                satpos[s] = np.asarray(f[f"{p}/common/satpos"])[:2]
            for d, det in enumerate(dets):
                g = f[f"{p}/{det}"]
                pix[s, d, :nt] = _decode_stream(g["pix"], tree, symb, nt)
                pbin = _decode_stream(g["psi"], tree, symb, nt) % npsi
                psi[s, d, :nt] = pbin * (2 * np.pi / npsi)
                flags = _decode_stream(g["flag"], tree, symb, nt)
                good = (flags & bad_flag_bits) == 0
                mask[s, d, :nt] = good
                tod[s, d, :nt] = np.asarray(g["tod"])[:nt]
                if "scalars" in g:
                    scal[s, d] = np.asarray(g["scalars"])
    block = TodBlock(tod=jnp.asarray(tod), pix=jnp.asarray(pix),
                     psi=jnp.asarray(psi), mask=jnp.asarray(mask),
                     vsun=jnp.asarray(vsun), fsamp=fsamp,
                     satpos=jnp.asarray(satpos))
    state = TodState(gain=jnp.asarray(scal[..., 0]),
                     sigma0=jnp.asarray(scal[..., 1]),
                     fknee=jnp.asarray(scal[..., 2]),
                     alpha=jnp.asarray(scal[..., 3]),
                     n_corr=jnp.zeros_like(block.tod))
    meta = dict(nside=nside, npsi=npsi, dets=dets, fsamp=fsamp,
                polang=polang)
    return block, state, meta


# ---------------------------------------------------------------------------
# Differential-horn (WMAP-style) archives
# ---------------------------------------------------------------------------

def write_archive_diff(path: str, nside: int, fsamp: float,
                       det_names: list, scans: list, npsi: int = 4096):
    """Write a differential (two-horn) TOD archive.

    WMAP-layout per-detector streams (todscripts/wmap/fits_to_h5.py:
    190-215: pixA/pixB/psiA/psiB/flag datasets per band group, huffman-
    compressed differentials; read back by comm_tod_WMAP_mod), carried in
    the same container layout as the LFI archives here:

        /common/{fsamp, nside, npsi, det, polang, mbang, pids}
        /NNNNNN/common/{ntod, time, vsun, hufftree, huffsymb}
        /NNNNNN/<det>/{pixA, psiA, pixB, psiB, flag, tod, scalars, x_im}

    scans: dicts {'pixA','psiA','pixB','psiB','flag','tod' (Nd, Nt),
    'vsun' (3,), optional 'scalars' (Nd, 4), optional 'x_im' (Nd,)}."""
    with h5py.File(path, "w") as f:
        f.create_dataset("common/fsamp", data=fsamp)
        f.create_dataset("common/nside", data=[nside])
        f.create_dataset("common/npsi", data=[npsi])
        f.create_dataset("common/det", data=np.bytes_(", ".join(det_names)))
        f.create_dataset("common/polang", data=np.zeros(len(det_names)))
        f.create_dataset("common/mbang", data=np.zeros(len(det_names)))
        f.create_dataset("common/pids", data=np.arange(1, len(scans) + 1))
        f.create_dataset("common/diff_horn", data=[1])
        for i, sc in enumerate(scans):
            pid = f"{i + 1:06d}"
            nd, nt = sc["pixA"].shape
            diffs = []
            binsA = (np.round(np.asarray(sc["psiA"]) / (2 * np.pi / npsi))
                     .astype(np.int64) % npsi)
            binsB = (np.round(np.asarray(sc["psiB"]) / (2 * np.pi / npsi))
                     .astype(np.int64) % npsi)
            for d in range(nd):
                diffs.append(np.diff(np.asarray(sc["pixA"][d], np.int64),
                                     prepend=0))
                diffs.append(np.diff(binsA[d], prepend=0))
                diffs.append(np.diff(np.asarray(sc["pixB"][d], np.int64),
                                     prepend=0))
                diffs.append(np.diff(binsB[d], prepend=0))
                diffs.append(np.diff(np.asarray(sc["flag"][d], np.int64),
                                     prepend=0))
            tree, symb = huffman.build_tree(np.concatenate(diffs))
            f.create_dataset(f"{pid}/common/ntod", data=[nt])
            f.create_dataset(f"{pid}/common/time", data=[0.0, 0.0, 0.0])
            f.create_dataset(f"{pid}/common/vsun",
                             data=np.asarray(sc["vsun"]))
            f.create_dataset(f"{pid}/common/hufftree", data=tree)
            f.create_dataset(f"{pid}/common/huffsymb", data=symb)
            for d, det in enumerate(det_names):
                g = f"{pid}/{det}"
                for k, j in (("pixA", 0), ("psiA", 1), ("pixB", 2),
                             ("psiB", 3), ("flag", 4)):
                    f.create_dataset(
                        g + "/" + k,
                        data=np.void(huffman.encode(diffs[5 * d + j],
                                                    tree, symb)))
                f.create_dataset(g + "/tod",
                                 data=np.asarray(sc["tod"][d], np.float32))
                sca = sc.get("scalars")
                f.create_dataset(g + "/scalars",
                                 data=np.asarray(sca[d]) if sca is not None
                                 else np.array([1.0, 1.0, 0.1, -1.0]))
                xim = sc.get("x_im")
                f.create_dataset(g + "/x_im",
                                 data=float(xim[d]) if xim is not None
                                 else 0.0)


def read_archive_diff(path: str, bad_flag_bits: int = 0, scan_ids=None,
                      dets=None):
    """Load a differential archive into (DiffTodBlock, TodState seed,
    meta). Mirrors read_archive for the two-horn layout; meta carries the
    per-det imbalance parameters x_im (comm_tod_WMAP_mod x_im)."""
    from .differential import DiffTodBlock

    with h5py.File(path, "r") as f:
        fsamp = float(np.asarray(f["common/fsamp"]))
        nside = int(np.asarray(f["common/nside"])[0])
        npsi = int(np.asarray(f["common/npsi"])[0])
        all_dets = [s.strip() for s in
                    f["common/det"][()].decode().split(",")]
        dets = [d for d in all_dets if dets is None or d in dets]
        pids = sorted(k for k in f.keys() if k.isdigit())
        if scan_ids is not None:
            want = {int(s) for s in scan_ids}
            pids = [p for p in pids if int(p) in want]
        if not pids:
            raise ValueError(f"archive {path!r} contains no scan groups")
        ntods = [int(np.asarray(f[f"{p}/common/ntod"])[0]) for p in pids]
        nt_max = max(ntods)
        Ns, Nd = len(pids), len(dets)
        tod = np.zeros((Ns, Nd, nt_max), np.float64)
        pixA = np.zeros((Ns, Nd, nt_max), np.int32)
        psiA = np.zeros((Ns, Nd, nt_max), np.float64)
        pixB = np.zeros((Ns, Nd, nt_max), np.int32)
        psiB = np.zeros((Ns, Nd, nt_max), np.float64)
        mask = np.zeros((Ns, Nd, nt_max), np.float64)
        vsun = np.zeros((Ns, 3), np.float64)
        scal = np.ones((Ns, Nd, 4), np.float64)
        x_im = np.zeros((Nd,), np.float64)
        for s, p in enumerate(pids):
            nt = ntods[s]
            tree = np.asarray(f[f"{p}/common/hufftree"], np.int64)
            symb = np.asarray(f[f"{p}/common/huffsymb"], np.int64)
            vsun[s] = np.asarray(f[f"{p}/common/vsun"])
            for d, det in enumerate(dets):
                g = f[f"{p}/{det}"]
                pixA[s, d, :nt] = _decode_stream(g["pixA"], tree, symb, nt)
                psiA[s, d, :nt] = (_decode_stream(g["psiA"], tree, symb, nt)
                                   % npsi) * (2 * np.pi / npsi)
                pixB[s, d, :nt] = _decode_stream(g["pixB"], tree, symb, nt)
                psiB[s, d, :nt] = (_decode_stream(g["psiB"], tree, symb, nt)
                                   % npsi) * (2 * np.pi / npsi)
                flags = _decode_stream(g["flag"], tree, symb, nt)
                mask[s, d, :nt] = (flags & bad_flag_bits) == 0
                tod[s, d, :nt] = np.asarray(g["tod"])[:nt]
                if "scalars" in g:
                    scal[s, d] = np.asarray(g["scalars"])
                if "x_im" in g:
                    x_im[d] = float(np.asarray(g["x_im"]))
    block = DiffTodBlock(tod=jnp.asarray(tod), pixA=jnp.asarray(pixA),
                         psiA=jnp.asarray(psiA), pixB=jnp.asarray(pixB),
                         psiB=jnp.asarray(psiB), mask=jnp.asarray(mask),
                         vsun=jnp.asarray(vsun), fsamp=fsamp)
    state = TodState(gain=jnp.asarray(scal[..., 0]),
                     sigma0=jnp.asarray(scal[..., 1]),
                     fknee=jnp.asarray(scal[..., 2]),
                     alpha=jnp.asarray(scal[..., 3]),
                     n_corr=jnp.zeros_like(block.tod))
    meta = dict(nside=nside, npsi=npsi, dets=dets, fsamp=fsamp, x_im=x_im)
    return block, state, meta


# ---------------------------------------------------------------------------
# Filelists + weighted scan distribution (BAND_TOD_FILELIST;
# comm_tod_mod.f90:643-799 get_scan_ids)
# ---------------------------------------------------------------------------

def read_filelist(path: str, first_scan: int = 1,
                  last_scan: int = 2 ** 31 - 1):
    """Reference filelist format: first line is the entry count, then
    per line 'scanid filename weight theta phi' (spin-axis angles).
    Returns dict with scanid/filename/weight/spin arrays, restricted to
    [first_scan, last_scan]."""
    sids, names, weights, spins = [], [], [], []
    with open(path) as f:
        lines = [ln.split() for ln in f if ln.strip()]
    n = int(lines[0][0])
    for parts in lines[1:n + 1]:
        sid = int(parts[0])
        if sid < first_scan or sid > last_scan:
            continue
        sids.append(sid)
        names.append(parts[1].strip('"'))
        weights.append(float(parts[2]) if len(parts) > 2 else 1.0)
        spins.append((float(parts[3]), float(parts[4]))
                     if len(parts) > 4 else (0.0, 0.0))
    if not sids:
        raise ValueError(f"No accepted scans in filelist {path!r} "
                         f"(first/last = {first_scan}/{last_scan})")
    return dict(scanid=np.asarray(sids), filename=names,
                weight=np.asarray(weights), spin=np.asarray(spins))


def distribute_scans(weights, spin, nproc: int):
    """Static load balancing of scans over nproc shards: sort by spin-axis
    angle relative to the first scan (so each shard sees a contiguous sky
    patch, which keeps its observed-pixel set compact), then fill shards
    np-1..1 to ~w_tot/np each, pushing >1.2x overshoots to the neighbor —
    the exact assignment loop of get_scan_ids (comm_tod_mod.f90:731-768).
    Returns an int array proc[i] in [0, nproc)."""
    n = len(weights)
    weights = np.asarray(weights, np.float64)
    spin = np.asarray(spin, np.float64)
    th, ph = spin[:, 0], spin[:, 1]
    ax = np.stack([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                   np.cos(th)], axis=-1)
    # symmetry axis = mean of cross products with the first axis
    v = np.cross(ax[0], ax)
    v[v[:, 2] < 0] *= -1.0
    nv = np.linalg.norm(v, axis=-1)
    v0 = (v[nv > 0] / nv[nv > 0, None]).sum(0) if (nv > 0).any() \
        else np.array([0.0, 0.0, 1.0])
    v0 /= max(np.linalg.norm(v0), 1e-30)
    sid = np.arccos(np.clip(ax @ ax[0], -1.0, 1.0))
    sid[np.cross(ax[0], ax) @ v0 < 0] *= -1.0
    order = np.argsort(sid, kind="stable")
    # contiguous blocks in spin order, boundaries at equal cumulative
    # weight: same intent as the reference's fill loop (which walks the
    # sid-sorted list filling each core to w_tot/np with a 1.2x overshoot
    # push), but robust when scans are few or heavy — the reference's
    # overshoot push can starve low-rank cores in that regime
    cum = np.cumsum(weights[order]) - 0.5 * weights[order]
    w_tot = weights.sum()
    shard_of_sorted = np.minimum(
        (cum / w_tot * nproc).astype(np.int64), nproc - 1)
    proc = np.zeros(n, np.int64)
    # reference fills np-1 downward, leaving the remainder on rank 0
    proc[order] = (nproc - 1) - shard_of_sorted
    return proc


def load_band_tod(filelist_path: str, data_dir: str | None = None,
                  bad_flag_bits: int = ~0, dets=None, first_scan: int = 1,
                  last_scan: int = 2 ** 31 - 1, shard: int = 0,
                  nshard: int = 1):
    """BAND_TOD_FILELIST -> (TodBlock, TodState, meta): read the filelist,
    distribute scans by weight (get_scan_ids), read this shard's scans from
    their archives (huffman pointing decode; scalars as the warm start the
    reference takes from read_hdf_scan), and bucket to one padded TodBlock.
    """
    import os

    fl = read_filelist(filelist_path, first_scan, last_scan)
    proc = distribute_scans(fl["weight"], fl["spin"], nshard)
    mine = np.nonzero(proc == shard)[0]
    if mine.size == 0:
        raise ValueError(f"shard {shard}/{nshard} received no scans")
    by_file: dict = {}
    for i in mine:
        by_file.setdefault(fl["filename"][i], []).append(int(fl["scanid"][i]))
    blocks, states, meta = [], [], None
    for fname, sids in sorted(by_file.items()):
        path = fname if os.path.isabs(fname) else \
            os.path.join(data_dir or os.path.dirname(filelist_path), fname)
        blk, st, m = read_archive(path, bad_flag_bits=bad_flag_bits,
                                  scan_ids=sids, dets=dets)
        blocks.append(blk)
        states.append(st)
        if meta is None:
            meta = m
        elif (m["nside"] != meta["nside"] or m["dets"] != meta["dets"]
              or m["fsamp"] != meta["fsamp"] or m["npsi"] != meta["npsi"]):
            raise ValueError(f"inconsistent archives in {filelist_path!r}: "
                             f"{m} vs {meta}")
    nt = max(b.ntod for b in blocks)

    def cat(field, pad_val=0):
        outs = []
        for b in blocks:
            a = np.asarray(getattr(b, field))
            outs.append(np.pad(a, [(0, 0)] * (a.ndim - 1)
                               + [(0, nt - a.shape[-1])],
                               constant_values=pad_val))
        return jnp.asarray(np.concatenate(outs, axis=0))

    block = TodBlock(tod=cat("tod"), pix=cat("pix"), psi=cat("psi"),
                     mask=cat("mask"),
                     vsun=jnp.asarray(np.concatenate(
                         [np.asarray(b.vsun) for b in blocks], axis=0)),
                     fsamp=blocks[0].fsamp,
                     satpos=jnp.asarray(np.concatenate(
                         [np.asarray(b.satpos) for b in blocks], axis=0)))
    state = TodState(
        gain=jnp.concatenate([s.gain for s in states], axis=0),
        sigma0=jnp.concatenate([s.sigma0 for s in states], axis=0),
        fknee=jnp.concatenate([s.fknee for s in states], axis=0),
        alpha=jnp.concatenate([s.alpha for s in states], axis=0),
        n_corr=jnp.zeros_like(block.tod))
    meta["nscan"] = block.nscan
    return block, state, meta
