"""End-to-end driver tests: CLI pipeline on the reference tutorial config."""
import os

import numpy as np
import pytest

from commander_tpu.io.chain import ChainFile
from commander_tpu.io.params import Params, lower_params
from commander_tpu.run import run

REF_PARAM = "/root/reference/tutorial/param_tutorial.txt"


@pytest.fixture(scope="module")
def cfg():
    c = lower_params(Params.load(REF_PARAM))
    c = type(c)(**{**c.__dict__})
    return c


@pytest.mark.skipif(not os.path.exists(REF_PARAM), reason="reference absent")
def test_synthetic_gibbs_end_to_end(cfg, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("chains"))
    state, chain_path = run(cfg, nside=8, lmax=16, synthetic=True, niter=4,
                            outdir=out, verbose=False)
    with ChainFile(chain_path, "r") as ch:
        assert ch.last_sample() == 4
        s = ch.read_sample(4)
        assert set(s["comps"]) >= {"cmb", "synch", "dust"}
        chi2 = float(s["aux"]["chisq"])
        ndof = 3 * 12 * 64  # nband * npix
        # chi2/ndof ~ 1 within 5 sigma (sigma ~ sqrt(2/ndof))
        assert abs(chi2 / ndof - 1.0) < 5 * np.sqrt(2.0 / ndof) + 0.1

    # resume: continue the same chain; driver rejects the last sample and
    # re-runs it (commander.f90:160-174 semantics)
    state2, _ = run(cfg, nside=8, lmax=16, synthetic=True, niter=6,
                    outdir=out, verbose=False)
    with ChainFile(chain_path, "r") as ch:
        assert ch.last_sample() == 6


@pytest.mark.skipif(not os.path.exists(REF_PARAM), reason="reference absent")
def test_fits_map_roundtrip(tmp_path):
    from commander_tpu.io import fits as fitsio
    rng = np.random.default_rng(0)
    m = rng.standard_normal((3, 12 * 16 * 16))
    path = str(tmp_path / "map.fits")
    fitsio.write_map(path, m, unit="uK_cmb")
    r = fitsio.read_map(path)
    assert r.shape == m.shape
    np.testing.assert_allclose(r, m, atol=1e-6, rtol=1e-6)
    # nested write/read roundtrips through the ordering conversion
    fitsio.write_map(path, m, nest=True)
    r2 = fitsio.read_map(path)
    np.testing.assert_allclose(r2, m, atol=1e-6, rtol=1e-6)


@pytest.mark.skipif(not os.path.exists(REF_PARAM), reason="reference absent")
def test_tod_integrated_loop(cfg, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("chains_tod"))
    state, chain_path = run(cfg, nside=8, lmax=16, synthetic=True, niter=3,
                            outdir=out, verbose=False, tod=True)
    with ChainFile(chain_path, "r") as ch:
        assert ch.last_sample() == 3
        s = ch.read_sample(3)
        assert np.isfinite(float(s["aux"]["chisq"]))
        assert float(s["aux"]["chisq"]) > 0


@pytest.mark.skipif(not os.path.exists(REF_PARAM), reason="reference absent")
def test_driver_ptsrc_flux_recovery(cfg):
    from commander_tpu.run import build_model
    from commander_tpu.sampling import joint as J
    (plan, sys, diffuse, bps, cl_cfg, cl0, meta, truth, pcfgs, ts, ps,
     cl_cfgs) = build_model(cfg, nside=8, lmax=16, synthetic=True)
    assert ps is not None and ts is not None
    x, res = J.sample_joint(sys, plan, ts, ps, key=None, tol=1e-9,
                            maxiter=1500)
    p_rec = np.asarray(x.p)
    p_true = meta["ptsrc_true"]
    assert np.corrcoef(p_rec, p_true)[0, 1] > 0.99
    assert np.abs(p_rec - p_true).mean() / p_true.mean() < 0.05
