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


# ---------------------------------------------------------------------------
# WMAP differential-horn converter (todscripts/wmap/fits_to_h5.py
# counterpart): day records -> diff archives -> DiffTodBlock -> WMAP pass
# ---------------------------------------------------------------------------

def _wmap_day(nside, ntod=1024, nframes=64, seed=0):
    """Synthetic WMAP-style day: frame-major TOD + per-frame flags +
    quaternion attitude for the two horns."""
    rng = np.random.default_rng(seed)
    nsamp = ntod // nframes
    # slowly-rotating attitude quaternions (axis precesses)
    t = np.linspace(0, 6 * np.pi, ntod)
    ax = np.stack([np.sin(0.1 * t), np.cos(0.1 * t),
                   0.5 * np.ones_like(t)], -1)
    ax /= np.linalg.norm(ax, axis=-1, keepdims=True)
    quat = np.concatenate([np.sin(t / 2)[:, None] * ax,
                           np.cos(t / 2)[:, None]], -1)
    day = dict(
        tod={d: rng.standard_normal((nframes, nsamp)) for d in
             ("K113", "K114")},
        daflags=(rng.uniform(size=nframes) < 0.05).astype(np.int64),
        gain={"K113": 0.9, "K114": 1.1},
        quat=quat,
        losA=np.array([0.94, 0.0, 0.34]),
        losB=np.array([-0.94, 0.0, 0.34]),
        polA=np.array([0.0, 1.0, 0.0]),
        polB=np.array([0.0, 1.0, 0.0]),
        vsun=np.array([0.0, 3e4, 0.0]))
    return day


def test_wmap_convert_roundtrip(tmp_path):
    from commander_tpu.tod.convert import convert_wmap_to_archive
    from commander_tpu.tod.loader import read_archive_diff
    nside = 8
    dets = ["K113", "K114"]
    days = [_wmap_day(nside, seed=1), _wmap_day(nside, seed=2)]
    out = str(tmp_path / "wmap")
    flist = convert_wmap_to_archive(days, dets, nside, fsamp=12.0,
                                    out_dir=out, band_label="K1",
                                    n_per_day=2, x_im=[0.01, -0.02])
    # filelist: 2 files x 2 periods
    with open(flist) as f:
        lines = f.read().splitlines()
    assert int(lines[0]) == 4
    arch = os.path.join(out, lines[1].split()[1])
    block, state, meta = read_archive_diff(arch, bad_flag_bits=1)
    assert meta["nside"] == nside
    np.testing.assert_allclose(meta["x_im"], [0.01, -0.02])
    # gain guesses land in the scalars row
    np.testing.assert_allclose(np.asarray(state.gain[0]), [0.9, 1.1])
    # flagged frames are masked through the huffman roundtrip
    assert 0 < float(np.asarray(block.mask).mean()) < 1.0
    # pointing streams survive exactly: recompute horn A for day 1
    from commander_tpu.tod.convert import quat_to_pointing
    day = _wmap_day(nside, seed=1)
    pixA, psiA = quat_to_pointing(day["quat"], day["losA"], day["polA"],
                                  nside)
    half = len(pixA) // 2
    np.testing.assert_array_equal(np.asarray(block.pixA[0, 0]),
                                  pixA[:half])
    npsi = meta["npsi"]
    dpsi = np.abs(np.asarray(block.psiA[0, 0]) - np.mod(psiA[:half],
                                                        2 * np.pi))
    dpsi = np.minimum(dpsi, 2 * np.pi - dpsi)
    assert dpsi.max() < 2 * np.pi / npsi  # psi to quantization accuracy
    # the loaded block drives the WMAP differential pass
    import jax
    from commander_tpu.sphere import healpix as hpx
    from commander_tpu.tod.differential import process_tod_diff
    from commander_tpu.tod.process import TodConfig
    cfg = TodConfig(nside=nside, nu=23e9)
    pvec = jnp.asarray(hpx.pix2vec_ring(nside))
    sky = jnp.zeros((1, 12 * nside * nside))
    st, prod = process_tod_diff(cfg, block, state, sky, pvec,
                                jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(prod["map"])).all()


def test_litebird_convert_roundtrip(tmp_path):
    """LiteBIRD-style per-detector segment streams -> archive -> loader,
    with per-det polarization angles surviving into the meta."""
    from commander_tpu.tod.convert import convert_litebird_to_archive
    from commander_tpu.tod.loader import load_band_tod
    nside, fsamp = 8, 4.0
    rng = np.random.default_rng(3)
    n = 256
    t = np.arange(n) / fsamp
    dets = ["0001a", "0001b"]
    det_files = {}
    for i, d in enumerate(dets):
        det_files[d] = dict(
            theta=np.mod(0.4 + 0.01 * t + 0.001 * i, np.pi),
            phi=np.mod(0.5 * t, 2 * np.pi),
            psi=np.mod(0.2 * t + i, 2 * np.pi),
            tod=rng.standard_normal(n))
    out = str(tmp_path / "lb")
    flist = convert_litebird_to_archive(
        det_files, dets, nside, fsamp, out, band_label="LFT_40",
        chunk_seconds=16.0, polang=np.radians([0.0, 90.0]))
    block, state, meta = load_band_tod(flist)
    assert block.nscan == 4 and block.ndet == 2       # 256 / (16 s * 4 Hz)
    np.testing.assert_allclose(meta["polang"], np.radians([0.0, 90.0]))
    # pixel stream roundtrips exactly
    pix_ref = np.asarray(healpix.ang2pix_ring(
        nside, det_files[dets[0]]["theta"][:64],
        det_files[dets[0]]["phi"][:64]), np.int64)
    np.testing.assert_array_equal(np.asarray(block.pix[0, 0]), pix_ref)
