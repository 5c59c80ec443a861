"""FEBeCoP effective-beam stamp files (reference HDF layout) + ang2pix.

Reference: read_febecop_beam (comm_ptsrc_comp_mod.f90:796-880) reads
``[label/]<center_pix>/indices`` + ``/values`` groups keyed by the
ang2pix_ring center pixel of each source.
"""
import h5py
import numpy as np
import jax.numpy as jnp

from commander_tpu.sphere import healpix
from commander_tpu.sampling import joint as J


def test_ang2pix_roundtrip():
    for nside in (4, 16, 64):
        th, ph = healpix.pix2ang_ring(nside)
        pix = healpix.ang2pix_ring(nside, th, ph)
        np.testing.assert_array_equal(pix, np.arange(12 * nside * nside))


def _write_febecop(path, nside_fb, centers, fwhm_arcmin, labels):
    vec = healpix.pix2vec_ring(nside_fb)
    with h5py.File(path, "w") as f:
        for lab in labels:
            g0 = f.create_group(lab)
            for c in centers:
                d = vec @ vec[c]
                idx = np.argpartition(-d, 80)[:80]
                theta = np.arccos(np.clip(d[idx], -1, 1))
                sig = np.deg2rad(fwhm_arcmin / 60) / np.sqrt(8 * np.log(2))
                val = np.exp(-0.5 * (theta / sig) ** 2)
                g = g0.create_group(str(int(c)))
                g.create_dataset("indices", data=idx.astype(np.int64))
                g.create_dataset("values", data=val)


def test_febecop_loader_matches_gaussian_stamps(tmp_path):
    nside = 16
    rng = np.random.default_rng(0)
    src_pix = rng.choice(12 * nside * nside, 5, replace=False)
    th, ph = healpix.pix2ang_ring(nside)
    fwhm = 240.0
    labels = ["b30", "b44"]
    F_src = np.ones((2, 5))
    path = str(tmp_path / "febecop.h5")
    centers = healpix.ang2pix_ring(nside, th[src_pix], ph[src_pix])
    _write_febecop(path, nside, centers, fwhm, labels)

    ps = J.febecop_stamp_ptsrc(path, nside, th[src_pix], ph[src_pix],
                               F_src, nside_febecop=nside,
                               band_labels=labels, npatch=80)
    ps_g = J.gaussian_stamp_ptsrc(nside, src_pix, F_src,
                                  np.full(2, fwhm), npatch=80)
    # project unit amplitudes through both stamp sets; maps should agree
    # closely (same Gaussian profile, same normalization)
    p = jnp.ones(5)
    m_f = np.asarray(J._ptsrc_fwd(ps, p, 12 * nside * nside))
    m_g = np.asarray(J._ptsrc_fwd(ps_g, p, 12 * nside * nside))
    num = np.abs(m_f - m_g).max()
    den = np.abs(m_g).max()
    assert num / den < 0.05


def test_febecop_loader_degrade(tmp_path):
    """Beam file at higher resolution than the analysis nside."""
    nside, nside_fb = 8, 16
    th, ph = healpix.pix2ang_ring(nside)
    src_pix = np.asarray([100, 300])
    centers = healpix.ang2pix_ring(nside_fb, th[src_pix], ph[src_pix])
    path = str(tmp_path / "fb_hi.h5")
    _write_febecop(path, nside_fb, centers, 360.0, ["b30"])
    ps = J.febecop_stamp_ptsrc(path, nside, th[src_pix], ph[src_pix],
                               np.ones((1, 2)), nside_febecop=nside_fb,
                               band_labels=["b30"], npatch=40)
    m = np.asarray(J._ptsrc_fwd(ps, jnp.ones(2), 12 * nside * nside))
    assert np.isfinite(m).all() and m.max() > 0
    # stamp peaks near the source pixels
    for i, sp in enumerate(src_pix):
        peak = np.argmax(m[0, 0] * (np.arange(m.shape[-1]) >= 0))
        assert m[0, 0, sp] > 0.2 * m[0, 0].max()
