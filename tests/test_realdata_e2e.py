"""End-to-end run from on-disk archives (the non-synthetic driver path).

Writes band maps / noise / mask FITS files the way a real reduction would
deliver them (initialize_data_mod reads the same trio per band,
comm_data_mod.f90:74-140), points the parameter file's bands at them, and
runs the Gibbs chain — verifying the file-based data path recovers the
injected sky.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from commander_tpu.io import fits as fitsio
from commander_tpu.io.chain import ChainFile
from commander_tpu.io.params import Params, lower_params
from commander_tpu.run import run
from commander_tpu.sphere import sht
from commander_tpu.sphere.alm import random_alm_white, triangle_mask

REF_PARAM = "/root/reference/tutorial/param_tutorial.txt"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_PARAM),
                                reason="reference absent")


def test_file_based_run_recovers_sky(tmp_path_factory):
    nside, lmax = 8, 16
    nl = lmax + 1
    npix = 12 * nside * nside
    data_dir = str(tmp_path_factory.mktemp("archive"))
    out = str(tmp_path_factory.mktemp("chains_files"))

    cfg = lower_params(Params.load(REF_PARAM))
    cfg.comps = [c for c in cfg.comps if c.label in ("cmb", "synch")]

    # inject a band-limited sky through the same beams the driver will use
    rng = np.random.default_rng(5)
    plan = sht.get_plan(nside, lmax)
    ell = np.arange(nl, dtype=float)
    cl = np.zeros(nl)
    cl[2:] = 300.0 / (ell[2:] * (ell[2:] + 1.0))
    a_true = np.asarray(random_alm_white(jax.random.PRNGKey(3), (1, nl, nl))
                        * jnp.asarray(triangle_mask(nl, nl))) \
        * np.sqrt(cl)[None, :, None]
    from commander_tpu.instrument.beam import gaussian_bl, pixel_window

    rms_val = 3.0
    for i, b in enumerate(cfg.bands):
        bl = gaussian_bl(b.beam_fwhm_arcmin or 60.0, lmax) \
            * pixel_window(nside, lmax)
        sky = np.asarray(sht.alm2map(plan, jnp.asarray(
            a_true * bl[None, :, None])))
        m = sky[0] + rng.normal(0, rms_val, npix)
        fitsio.write_map(os.path.join(data_dir, f"map_{i}.fits"),
                         m[None, :], unit="uK_cmb")
        fitsio.write_map(os.path.join(data_dir, f"rms_{i}.fits"),
                         np.full((1, npix), rms_val), unit="uK_cmb")
        b.mapfile = f"map_{i}.fits"
        b.noisefile = f"rms_{i}.fits"
        b.maskfile = "fullsky"
        # this fixture injects through Gaussian beams; the tutorial's b_l
        # FITS files are not part of it (non-synthetic runs abort on a
        # missing BAND_BEAM_B_L_FILE by design)
        b.beamfile = None

    cfg.cg_tol, cfg.cg_maxiter = 1e-9, 500
    state, chain_path = run(cfg, nside=nside, lmax=lmax, synthetic=False,
                            niter=3, outdir=out, verbose=False,
                            data_dir=data_dir)
    with ChainFile(chain_path, "r") as ch:
        s = ch.read_sample(3)
        a_cmb = np.asarray(s["comps"]["cmb"]["alm"])
    # all bands see the same (CMB-unit) sky: the cmb component should
    # carry it at low ell where S/N >> 1
    L = 10
    corr = np.corrcoef(a_cmb[0, 2:L, :L].real.ravel(),
                       a_true[0, 2:L, :L].real.ravel())[0, 1]
    assert corr > 0.95
