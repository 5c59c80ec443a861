"""Per-source spectral-index sampling + Powell optimize
(samplePtsrcSpecInd, comm_ptsrc_comp_mod.f90:1492-1971)."""
import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from commander_tpu.sampling import joint as J
from commander_tpu.sphere import healpix

NSIDE = 16
NPIX = 12 * NSIDE * NSIDE
NBAND, NSRC = 4, 6
NU = np.array([30.0, 44.0, 70.0, 100.0])
NU0 = 30.0


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    src_pix = rng.choice(NPIX, NSRC, replace=False)
    fwhms = np.full(NBAND, 120.0)
    unit = J.gaussian_stamp_ptsrc(NSIDE, src_pix, np.ones((NBAND, NSRC)),
                                  fwhms, nmaps=1, npatch=32)
    nur = NU / NU0
    alpha_true = rng.uniform(-1.0, 0.5, NSRC)
    amps_true = rng.uniform(80.0, 150.0, NSRC)
    ps_true = J.restamp_ptsrc(unit, jnp.asarray(nur),
                              jnp.asarray(alpha_true))
    sky = np.asarray(J._ptsrc_fwd(ps_true, jnp.asarray(amps_true), NPIX))
    rms = 0.5
    data = sky + rms * rng.standard_normal(sky.shape)
    inv_rms2 = np.full(sky.shape, 1.0 / rms ** 2)
    return (unit, nur, alpha_true, amps_true, jnp.asarray(data),
            jnp.asarray(inv_rms2))


def test_sample_ptsrc_alpha_recovers():
    unit, nur, alpha_true, amps_true, data, inv2 = _setup()
    # residual with all sources modeled at WRONG alphas
    alpha0 = np.full(NSRC, -0.25)
    ps0 = J.restamp_ptsrc(unit, jnp.asarray(nur), jnp.asarray(alpha0))
    res = data - J._ptsrc_fwd(ps0, jnp.asarray(amps_true), NPIX)
    grid = jnp.linspace(-2.0, 1.5, 96)
    key = jax.random.PRNGKey(1)
    draws = []
    alphas = jnp.asarray(alpha0)
    for it in range(6):
        key, k = jax.random.split(key)
        ps_c = J.restamp_ptsrc(unit, jnp.asarray(nur), alphas)
        res = data - J._ptsrc_fwd(ps_c, jnp.asarray(amps_true), NPIX)
        alphas = J.sample_ptsrc_alpha(k, unit, jnp.asarray(nur), res,
                                      jnp.asarray(amps_true), alphas,
                                      inv2, grid)
        draws.append(np.asarray(alphas))
    est = np.mean(draws[2:], axis=0)
    assert np.max(np.abs(est - alpha_true)) < 0.25, (est, alpha_true)


def test_optimize_ptsrc_powell():
    unit, nur, alpha_true, amps_true, data, inv2 = _setup(seed=3)
    alpha0 = np.zeros(NSRC)
    amps0 = amps_true * 0.7
    ps0 = J.restamp_ptsrc(unit, jnp.asarray(nur), jnp.asarray(alpha0))
    res = data - J._ptsrc_fwd(ps0, jnp.asarray(amps0), NPIX)
    amps, alphas = J.optimize_ptsrc(unit, nur, res, jnp.asarray(amps0),
                                    jnp.asarray(alpha0), inv2)
    assert np.max(np.abs(alphas - alpha_true)) < 0.15, (alphas, alpha_true)
    assert np.max(np.abs(amps / amps_true - 1.0)) < 0.1


REF_PARAM = "/root/reference/tutorial/param_tutorial.txt"


@pytest.mark.skipif(not os.path.exists(REF_PARAM), reason="reference absent")
def test_driver_samples_catalog_alpha(tmp_path):
    """Catalog alphas with alpha_rms > 0 move during the Gibbs run and are
    written to the chain."""
    from commander_tpu.io.chain import ChainFile
    from commander_tpu.io.fits import write_map
    from commander_tpu.io.params import Params, lower_params
    from commander_tpu import run as run_mod

    cfg = lower_params(Params.load(REF_PARAM))
    cfg.comps = [c for c in cfg.comps
                 if c.label in ("cmb", "radio")]
    cfg.sample_specind = True
    cat = tmp_path / "cat.dat"
    cat.write_text(
        "10.0  20.0  100.0  5.0  -0.3  0.0  0.5 0.0 1.0 src1\n"
        "200.0 -45.0  50.0  2.0   0.2  0.0  0.5 0.0 1.0 src2\n")
    rms8 = np.full((1, 12 * 64), 2.0, np.float32)
    write_map(str(tmp_path / "rms8.fits"), rms8)
    for c in cfg.comps:
        if c.cclass == "ptsrc":
            c.catalog = "cat.dat"
        c.template_file = None
    for b in cfg.bands:
        b.mapfile = None
        b.noisefile = "rms8.fits"
        b.maskfile = None
        b.beamfile = None
        b.sample_bandpass = False
        b.tod_type = "none"
    out = str(tmp_path / "chains")
    state, chain_path = run_mod.run(cfg, nside=8, lmax=16, synthetic=True,
                                    niter=3, outdir=out, verbose=False,
                                    data_dir=str(tmp_path))
    with ChainFile(chain_path, "r") as ch:
        s = ch.read_sample(ch.last_sample())
    assert "ptsrc_alpha" in s["aux"]
    al = s["aux"]["ptsrc_alpha"]
    assert al.shape == (2,)
    # alpha_rms=0.5 frees them; the draws must have moved off the catalog
    assert not np.allclose(al, [-0.3, 0.2])
