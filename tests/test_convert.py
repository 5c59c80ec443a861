"""L2-exchange -> archive converter (tod/convert.py), the lfitohdf5.py
counterpart: synthetic L2 OD files are converted and ingested through the
standard archive loader, streams intact."""
import os

import numpy as np
import h5py
import jax.numpy as jnp

from commander_tpu.sphere import healpix
from commander_tpu.tod.convert import convert_l2_to_archive, read_l2_od
from commander_tpu.tod.loader import load_band_tod

NSIDE = 8
DETS = ["27M", "27S"]


def _write_l2(path, n_per=512, npid=3, seed=0):
    """Synthetic L2 exchange OD file (lfitohdf5.py:116-221 layout)."""
    rng = np.random.default_rng(seed)
    N = n_per * npid + 40
    obt = np.arange(N, dtype=np.float64)
    pid_start = np.array([i * n_per for i in range(npid)], np.float64)
    pid_end = np.array([(i + 1) * n_per for i in range(npid)], np.float64)
    with h5py.File(path, "w") as f:
        f.create_dataset("Time/OBT", data=obt)
        f.create_dataset("AHF_info/PID", data=np.arange(1, npid + 1))
        f.create_dataset("AHF_info/PID_start", data=pid_start)
        f.create_dataset("AHF_info/PID_end", data=pid_end)
        f.create_dataset("common/vsun", data=[0.0, 3e4, 0.0])
        f.create_dataset("common/satpos", data=[120.0, 1.5])
        for d in DETS:
            th = np.mod(0.3 + 0.001 * obt + rng.uniform(0, 0.01), np.pi)
            ph = np.mod(0.01 * obt, 2 * np.pi)
            f.create_dataset(f"{d}/theta", data=th)
            f.create_dataset(f"{d}/phi", data=ph)
            f.create_dataset(f"{d}/psi", data=np.mod(0.05 * obt, 2 * np.pi))
            f.create_dataset(f"{d}/flag", data=np.zeros(N, np.int64))
            f.create_dataset(f"{d}/tod", data=rng.standard_normal(N))
    return path


def test_read_l2_od(tmp_path):
    p = _write_l2(str(tmp_path / "od1.h5"))
    periods = read_l2_od(p, DETS)
    assert len(periods) == 3
    assert periods[0]["n"] == 512
    assert set(periods[0]["det"]) == set(DETS)


def test_convert_and_ingest(tmp_path):
    od1 = _write_l2(str(tmp_path / "LFI_030_OD0091.h5"), seed=1)
    od2 = _write_l2(str(tmp_path / "LFI_030_OD0092.h5"), seed=2)
    out = str(tmp_path / "archives")
    flist = convert_l2_to_archive([od1, od2], DETS, NSIDE, fsamp=30.0,
                                  out_dir=out, band_label="030")
    block, state, meta = load_band_tod(flist)
    assert meta["nside"] == NSIDE
    assert block.nscan == 6 and block.ndet == 2
    assert float(block.satpos[0, 0]) == 120.0
    # pixel streams survive the huffman round trip exactly: recompute from
    # the L2 angles for one period and match a loaded scan
    periods = read_l2_od(od1, DETS)
    s0 = periods[0]["det"][DETS[0]]
    pix_ref = np.asarray(healpix.ang2pix_ring(
        NSIDE, s0["theta"], s0["phi"]), np.int64)
    loaded = np.asarray(block.pix[:, 0, :512])
    assert any(np.array_equal(loaded[i], pix_ref) for i in range(6))
    # ingested block drives a TOD pass
    import jax
    from commander_tpu.tod.process import TodConfig, process_tod
    cfg = TodConfig(nside=NSIDE, nu=30e9)
    pvec = jnp.asarray(healpix.pix2vec_ring(NSIDE))
    sky = jnp.zeros((1, 12 * NSIDE * NSIDE))
    st, prod = process_tod(cfg, block, state, sky, pvec,
                           jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(prod["map"])).all()
