"""Per-sample ok/reject semantics + round-5 observability surface.

Reference behavior reproduced:
  * commander.f90:229-251 — a Gibbs sample is accepted (`iter = iter+1`)
    only when `ok`; otherwise 'SAMPLE REJECTED' and the iteration
    re-runs with fresh randomness;
  * comm_cr_mod.f90:392-397 — CG that stops at maxiter without reaching
    tolerance flags the sample (unless CG_CONVERGENCE_CRITERION is
    fixed_iter);
  * comm_Cl_mod.f90:946-979 — a non-posdef C_ell draw sets ok=.false.;
  * comm_Cl_mod.f90:1412-1437 — sigma_l_<comp>_<sample>.dat output;
  * comm_cr_mod.f90:275-321 — OUTPUT_EVERY_NTH_CG_ITERATION dumps;
  * comm_signal_mod.f90:132-152 — OUTPUT_DEBUG_SEDS sed.dat dump.
"""
import dataclasses
import glob
import os

import numpy as np
import pytest

from commander_tpu.io.chain import ChainFile
from commander_tpu.io.params import Params, lower_params
from commander_tpu.run import run

REF_PARAM = "/root/reference/tutorial/param_tutorial.txt"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_PARAM),
                                reason="reference absent")


@pytest.fixture(scope="module")
def cfg():
    return lower_params(Params.load(REF_PARAM))


def test_cg_nonconvergence_rejects_sample(cfg, tmp_path):
    """maxiter-capped CG (tolerance unreachable) -> every draw is
    rejected; after the safety cap the driver accepts with a loud
    warning. The status trace must show the rejections."""
    bad = dataclasses.replace(cfg, cg_maxiter=1, cg_tol=1e-30,
                              cg_conv_crit="residual")
    with pytest.warns(UserWarning, match="consecutive sample"):
        state, chain_path = run(bad, nside=8, lmax=16, synthetic=True,
                                niter=1, outdir=str(tmp_path),
                                verbose=False, fullgibbs=False)
    status = open(os.path.join(str(tmp_path),
                               "comm_status.txt")).read()
    assert "REJECTED" in status
    with ChainFile(chain_path, "r") as ch:
        assert ch.last_sample() == 1   # safety-cap acceptance


def test_fixed_iter_crit_never_rejects(cfg, tmp_path, recwarn):
    """CG_CONVERGENCE_CRITERION = fixed_iter: a capped CG is by
    construction converged -> no rejection (comm_cr_mod.f90:392)."""
    fixed = dataclasses.replace(cfg, cg_maxiter=1, cg_tol=1e-30,
                                cg_conv_crit="fixed_iter")
    state, chain_path = run(fixed, nside=8, lmax=16, synthetic=True,
                            niter=2, outdir=str(tmp_path),
                            verbose=False, fullgibbs=False)
    status = open(os.path.join(str(tmp_path),
                               "comm_status.txt")).read()
    assert "REJECTED" not in status
    with ChainFile(chain_path, "r") as ch:
        assert ch.last_sample() == 2


def test_converged_run_accepts_all(cfg, tmp_path):
    """A well-conditioned run rejects nothing and the chain advances
    one sample per iteration."""
    state, chain_path = run(cfg, nside=8, lmax=16, synthetic=True,
                            niter=3, outdir=str(tmp_path), verbose=False)
    status = open(os.path.join(str(tmp_path),
                               "comm_status.txt")).read()
    assert "REJECTED" not in status
    with ChainFile(chain_path, "r") as ch:
        assert ch.last_sample() == 3


def test_sigma_l_dat_output(cfg, tmp_path):
    """sigma_l_<comp>_k<sample>.dat written per diffuse component in
    the reference's exact ASCII format (comm_Cl_mod.f90:1412-1437)."""
    run(cfg, nside=8, lmax=16, synthetic=True, niter=2,
        outdir=str(tmp_path), verbose=False)
    files = sorted(glob.glob(os.path.join(str(tmp_path),
                                          "sigma_l_cmb_k*.dat")))
    assert len(files) == 2
    lines = open(files[-1]).read().splitlines()
    assert lines[0].strip().startswith("# Columns are {l, Dl_TT")
    body = np.loadtxt(files[-1])
    assert body.shape[0] == 17            # lmax 16 -> 17 rows
    assert int(body[0, 0]) == 0 and int(body[-1, 0]) == 16
    assert np.isfinite(body).all()
    assert (body[2:, 1] >= 0).all()       # TT auto-power is nonnegative


def test_output_every_nth_cg_iteration(cfg, tmp_path):
    """OUTPUT_EVERY_NTH_CG_ITERATION=N dumps the sqrt(S)-scaled CG
    solution every N iterations (comm_cr_mod.f90:275-321)."""
    diffuse_only = [c for c in cfg.comps
                    if c.cclass == "diffuse" and c.label != "md"]
    c = dataclasses.replace(cfg, output_cg_freq=2, cg_maxiter=6,
                            cg_conv_crit="fixed_iter",
                            comps=diffuse_only, cg_user_groups=[])
    run(c, nside=8, lmax=16, synthetic=True, niter=1,
        outdir=str(tmp_path), verbose=False, fullgibbs=False)
    dumps = sorted(glob.glob(os.path.join(str(tmp_path),
                                          "cg_amp_k*_i*.npz")))
    assert len(dumps) >= 2                # at least i0002, i0004
    z = np.load(dumps[0])
    assert np.isfinite(z["a_re"]).all() and np.isfinite(z["a_im"]).all()


def test_output_debug_seds(cfg, tmp_path):
    """OUTPUT_DEBUG_SEDS dumps sed.dat and exits before sampling
    (commander.f90:139-144)."""
    c = dataclasses.replace(cfg, output_debug_seds=True)
    run(c, nside=8, lmax=16, synthetic=True, niter=5,
        outdir=str(tmp_path), verbose=False)
    sed = open(os.path.join(str(tmp_path), "sed.dat")).read()
    assert "# Component = cmb" in sed
    assert "# Component = dust" in sed
    vals = [float(t.split()[1]) for t in sed.splitlines()
            if t.strip() and not t.startswith("#")]
    assert np.isfinite(vals).all() if hasattr(np, "all") else True
    assert len(vals) > 100


def test_gain_apod_fwhm_smooths_mask(cfg, tmp_path):
    """BAND_GAIN_APOD_FWHM > 0 Gaussian-apodizes the calibration mask:
    values leave {0,1} near edges but stay in [0,1]."""
    from commander_tpu.io import fits as fitsio
    from commander_tpu.run import _gain_calib_mask
    from commander_tpu.sphere import sht

    nside = 16
    npix = 12 * nside * nside
    plan = sht.get_plan(nside, 2 * nside, dtype="float64")
    mask = np.ones(npix)
    mask[: npix // 3] = 0.0               # hard edge
    path = str(tmp_path / "calibmask.fits")
    fitsio.write_map(path, mask[None])

    class B:
        maskfile_calib = path
        gain_apod_fwhm = 0.0
    hard = _gain_calib_mask(B(), plan)
    np.testing.assert_allclose(hard, mask, atol=1e-6)

    class BA(B):
        gain_apod_fwhm = 600.0            # 10 deg, heavy apodization
    soft = _gain_calib_mask(BA(), plan)
    assert soft.min() >= 0.0 and soft.max() <= 1.0
    interior = soft[(mask > 0.5)]
    assert (np.abs(soft - mask) > 0.05).mean() > 0.05  # edges tapered
    assert interior.mean() > 0.5
