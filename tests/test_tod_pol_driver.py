"""Polarized TOD end-to-end through the driver: IQU binning feeds the
amplitude system and injected E-mode signal is recovered.

Reference: the 3x3-per-pixel mapmaking of comm_tod_mapmaking_mod.f90:34-299
with pol weights cos2psi/sin2psi from project_sky
(comm_tod_pointing_mod.f90:31)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from commander_tpu.io.params import Params, lower_params
from commander_tpu.sphere import sht
from commander_tpu.sphere.alm import random_alm_white, triangle_mask
from commander_tpu.tod.loader import write_archive
from commander_tpu.tod.model import project_sky, orbital_dipole
from commander_tpu.sphere import healpix

REF_PARAM = "/root/reference/tutorial/param_tutorial.txt"
NSIDE, LMAX = 16, 32
SIGMA0 = 2.0
NDET, NSCAN, NTOD = 2, 8, 4096


def _make_pol_sky(seed=9):
    """IQU sky with a known E-mode spectrum (B = 0)."""
    nl = LMAX + 1
    plan = sht.get_plan(NSIDE, LMAX, spin2=True)
    ell = np.arange(nl, dtype=float)
    clT = np.zeros(nl)
    clT[2:] = 500.0 / (ell[2:] * (ell[2:] + 1.0))
    clE = np.zeros(nl)
    clE[2:] = 200.0 / (ell[2:] * (ell[2:] + 1.0))
    kT, kE = jax.random.split(jax.random.PRNGKey(seed))
    tri = jnp.asarray(triangle_mask(nl, nl))
    aT = np.asarray(random_alm_white(kT, (nl, nl)) * tri) \
        * np.sqrt(clT)[:, None]
    aE = np.asarray(random_alm_white(kE, (nl, nl)) * tri) \
        * np.sqrt(clE)[:, None]
    T = np.asarray(sht.alm2map(plan, jnp.asarray(aT)[None]))[0]
    Q, U = sht.alm2map_spin2(plan, jnp.asarray(aE)[None],
                             jnp.zeros_like(jnp.asarray(aE))[None])
    return np.stack([T, np.asarray(Q)[0], np.asarray(U)[0]]), aE


def _write_pol_fixture(tmpdir):
    sky, aE = _make_pol_sky()
    rng = np.random.default_rng(4)
    npix = 12 * NSIDE * NSIDE
    t = np.arange(NTOD)
    pix = np.zeros((NSCAN, NDET, NTOD), np.int64)
    psi = np.zeros((NSCAN, NDET, NTOD))
    for s in range(NSCAN):
        for d in range(NDET):
            start = rng.integers(0, npix)
            pix[s, d] = (start + (t * (d + 2 + s)) // 3) % npix
            # psi must cover angles diversely per pixel for the 3x3
            # pixel systems to be invertible
            psi[s, d] = (0.9 * d + 1.1 * s
                         + 2 * np.pi * t / 777.0) % (2 * np.pi)
    vsun = np.tile(np.array([0.0, 3.0e4, 0.0]), (NSCAN, 1))
    pvec = jnp.asarray(healpix.pix2vec_ring(NSIDE))
    s_sky = np.asarray(project_sky(jnp.asarray(sky), jnp.asarray(pix),
                                   jnp.asarray(psi), True))
    s_orb = np.asarray(orbital_dipole(jnp.asarray(vsun), pvec, 30e9,
                                      jnp.asarray(pix)))
    tod = s_sky + s_orb + SIGMA0 * rng.standard_normal(s_sky.shape)
    scans = [dict(pix=pix[s], psi=psi[s], flag=np.zeros_like(pix[s]),
                  tod=tod[s], vsun=vsun[s],
                  scalars=np.tile([1.0, SIGMA0, 0.05, -1.5], (NDET, 1)))
             for s in range(NSCAN)]
    apath = os.path.join(tmpdir, "tod_00.h5")
    write_archive(apath, NSIDE, 30.0, ["27M", "27S"], scans)
    flist = os.path.join(tmpdir, "filelist.txt")
    with open(flist, "w") as fh:
        fh.write(f"{NSCAN}\n" + "\n".join(
            f"{s + 1} tod_00.h5 1.0 1.5 {s * 0.7:.2f}"
            for s in range(NSCAN)) + "\n")
    return sky, aE, flist


@pytest.mark.skipif(not os.path.exists(REF_PARAM), reason="reference absent")
def test_pol_tod_driver_recovers_emode(tmp_path_factory):
    from commander_tpu import run as run_mod
    from commander_tpu.io.chain import ChainFile

    data_dir = str(tmp_path_factory.mktemp("tod_pol"))
    out = str(tmp_path_factory.mktemp("chains_pol"))
    sky, aE, flist = _write_pol_fixture(data_dir)

    cfg = lower_params(Params.load(REF_PARAM))
    cfg.comps = [c for c in cfg.comps if c.label == "cmb"]
    cfg.comps[0].polarized = True
    cfg.bands = cfg.bands[:1]
    b = cfg.bands[0]
    b.polarized = True
    b.tod_type = "LFI"
    b.tod_filelist = os.path.basename(flist)
    b.tod_rimo = None
    b.sample_bandpass = False

    state, chain_path = run_mod.run(cfg, nside=NSIDE, lmax=LMAX,
                                    synthetic=True, niter=3, outdir=out,
                                    verbose=False, tod=True, pol=True,
                                    data_dir=data_dir)
    with ChainFile(chain_path, "r") as ch:
        s = ch.read_sample(ch.last_sample())
    alm = s["comps"]["cmb"]["alm"]            # (3, nl, nm) T, E, B
    assert alm.shape[0] == 3
    # E-mode correlation with the injected realization (2 <= l <= 12 where
    # TOD S/N is decent at this depth)
    nl = LMAX + 1
    w = np.zeros((nl, nl))
    w[2:13, :13] = 1.0
    aE_fit = alm[1] * w
    aE_true = aE * w
    num = np.abs(np.vdot(aE_true, aE_fit))
    den = np.sqrt(np.vdot(aE_true, aE_true).real
                  * np.vdot(aE_fit, aE_fit).real)
    corr = num / max(den, 1e-30)
    assert corr > 0.8, f"E-mode correlation {corr}"
    # B should carry much less power than E (input B = 0)
    pE = np.vdot(aE_fit, aE_fit).real
    pB = np.vdot(alm[2] * w, alm[2] * w).real
    assert pB < 0.5 * pE, (pB, pE)
