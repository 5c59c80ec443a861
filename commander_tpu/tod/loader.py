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
                  scans: list, npsi: int = 4096):
    """scans: list of dicts with keys
    {'pix' (Nd, Nt), 'psi' (Nd, Nt), 'flag' (Nd, Nt), 'tod' (Nd, Nt),
     'vsun' (3,), optional 'scalars' (Nd, 4)}."""
    with h5py.File(path, "w") as f:
        f.create_dataset("common/fsamp", data=fsamp)
        f.create_dataset("common/nside", data=[nside])
        f.create_dataset("common/npsi", data=[npsi])
        f.create_dataset("common/det", data=np.bytes_(", ".join(det_names)))
        f.create_dataset("common/polang", data=np.zeros(len(det_names)))
        f.create_dataset("common/mbang", data=np.zeros(len(det_names)))
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
            f.create_dataset(f"{pid}/common/satpos", data=[0.0, 0.0])
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


def read_archive(path: str, flag_mask: int = 0, bad_flag_bits: int = ~0):
    """Load an archive into (TodBlock, TodState seed, meta dict).

    Scans are padded to max ntod; padded samples have mask 0. Samples whose
    flag has any bit of bad_flag_bits set are masked (BAND_TOD_FLAG in the
    reference parameter files)."""
    with h5py.File(path, "r") as f:
        fsamp = float(np.asarray(f["common/fsamp"]))
        nside = int(np.asarray(f["common/nside"])[0])
        npsi = int(np.asarray(f["common/npsi"])[0])
        dets = [s.strip() for s in
                f["common/det"][()].decode().split(",")]
        pids = sorted(k for k in f.keys() if k.isdigit())
        ntods = [int(np.asarray(f[f"{p}/common/ntod"])[0]) for p in pids]
        nt_max = max(ntods)
        Ns, Nd = len(pids), len(dets)
        tod = np.zeros((Ns, Nd, nt_max), np.float64)
        pix = np.zeros((Ns, Nd, nt_max), np.int32)
        psi = np.zeros((Ns, Nd, nt_max), np.float64)
        mask = np.zeros((Ns, Nd, nt_max), np.float64)
        vsun = np.zeros((Ns, 3), np.float64)
        scal = np.ones((Ns, Nd, 4), np.float64)
        for s, p in enumerate(pids):
            nt = ntods[s]
            tree = np.asarray(f[f"{p}/common/hufftree"], np.int64)
            symb = np.asarray(f[f"{p}/common/huffsymb"], np.int64)
            vsun[s] = np.asarray(f[f"{p}/common/vsun"])
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
                     vsun=jnp.asarray(vsun), fsamp=fsamp)
    state = TodState(gain=jnp.asarray(scal[..., 0]),
                     sigma0=jnp.asarray(scal[..., 1]),
                     fknee=jnp.asarray(scal[..., 2]),
                     alpha=jnp.asarray(scal[..., 3]),
                     n_corr=jnp.zeros_like(block.tod))
    meta = dict(nside=nside, npsi=npsi, dets=dets, fsamp=fsamp)
    return block, state, meta
