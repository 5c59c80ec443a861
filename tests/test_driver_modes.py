"""Driver operation modes: resample-CMB, per-pixel spectral indices, and
the alm-field index sampler dispatch.

Reference: RESAMPLE_CMB / sample_joint_alm_Cl x3 (commander.f90:222-226),
COMP_LMAX_IND dispatch in sample_nonlin_params (comm_nonlin_mod.f90:92-193).
"""
import os

import numpy as np
import pytest

from commander_tpu.io.chain import ChainFile
from commander_tpu.io.params import Params, lower_params
from commander_tpu.run import run

REF_PARAM = "/root/reference/tutorial/param_tutorial.txt"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_PARAM),
                                reason="reference absent")


def _cfg():
    return lower_params(Params.load(REF_PARAM))


def test_resample_cmb_mode(tmp_path_factory):
    cfg = _cfg()
    cfg.resample_cmb = True
    out = str(tmp_path_factory.mktemp("chains_resamp"))
    state, chain_path = run(cfg, nside=8, lmax=16, synthetic=True, niter=3,
                            outdir=out, verbose=False)
    with ChainFile(chain_path, "r") as ch:
        assert ch.last_sample() == 3
        s = ch.read_sample(3)
        assert np.isfinite(float(s["aux"]["chisq"]))


def test_pixind_mode(tmp_path_factory):
    cfg = _cfg()
    cfg.sample_specind = True
    # force one component onto the per-pixel local sampler
    for c in cfg.comps:
        if c.cclass == "diffuse":
            c.lmax_ind = -1
    out = str(tmp_path_factory.mktemp("chains_pixind"))
    state, chain_path = run(cfg, nside=8, lmax=16, synthetic=True, niter=2,
                            outdir=out, verbose=False, pixind=True)
    with ChainFile(chain_path, "r") as ch:
        s = ch.read_sample(2)
        # at least one component carries a theta map
        has_map = any(k.startswith("theta_map")
                      for comp in s["comps"].values() for k in comp)
        assert has_map
        assert np.isfinite(float(s["aux"]["chisq"]))


def test_alm_ind_sampler_dispatch(tmp_path_factory):
    cfg = _cfg()
    cfg.sample_specind = True
    # tutorial comp02 (synch) has COMP_LMAX_IND = 100 -> alm sampler
    assert any(c.lmax_ind and c.lmax_ind > 0 for c in cfg.comps
               if c.cclass == "diffuse")
    out = str(tmp_path_factory.mktemp("chains_almind"))
    state, chain_path = run(cfg, nside=8, lmax=16, synthetic=True, niter=2,
                            outdir=out, verbose=False)
    with ChainFile(chain_path, "r") as ch:
        s = ch.read_sample(2)
        has_map = any(k.startswith("theta_map")
                      for comp in s["comps"].values() for k in comp)
        assert has_map


def test_te_cl_polarized_mode(tmp_path_factory):
    """TE-coupled C_ell sampling in the polarized driver (--te-cl):
    matrix S^1/2 feeds the CG; TT/EE/BB bins stay consistent."""
    cfg = _cfg()
    cfg.comps = [c for c in cfg.comps if c.label in ("cmb", "synch")]
    for b in cfg.bands:
        b.polarized = True
    out = str(tmp_path_factory.mktemp("chains_te"))
    state, chain_path = run(cfg, nside=8, lmax=16, synthetic=True, niter=3,
                            outdir=out, verbose=False, pol=True, te_cl=True)
    with ChainFile(chain_path, "r") as ch:
        s = ch.read_sample(3)
        assert np.isfinite(float(s["aux"]["chisq"]))
    bins = np.asarray(state.cl_bins)
    assert bins.shape[1] == 3
    assert np.all(np.isfinite(bins)) and np.all(bins >= 0)


def test_wmap_differential_tod_band(tmp_path_factory):
    """BAND_TOD_TYPE = WMAP routes through the differential-horn pipeline
    (process_WMAP_tod, comm_tod_WMAP_mod.f90:142-485)."""
    cfg = _cfg()
    for b in cfg.bands:
        b.tod_type = "WMAP"
    cfg.enable_tod = True
    out = str(tmp_path_factory.mktemp("chains_wmap"))
    state, chain_path = run(cfg, nside=8, lmax=16, synthetic=True, niter=2,
                            outdir=out, verbose=False, tod=True)
    with ChainFile(chain_path, "r") as ch:
        s = ch.read_sample(2)
        assert np.isfinite(float(s["aux"]["chisq"]))


def test_smoothing_scale_pixind(tmp_path_factory):
    """Per-pixel index sampling on a smoothed + degraded scale
    (SMOOTHING_SCALE_* machinery; res_smooth/rms_smooth of the reference)
    — theta maps come back at native nside, postproc-smoothed."""
    cfg = _cfg()
    cfg.sample_specind = True
    cfg.comps = [c for c in cfg.comps if c.label in ("cmb", "synch")]
    for c in cfg.comps:
        if c.label == "synch":
            c.lmax_ind = -1
            c.indices["beta"]["smoothing_scale"] = 1
    cfg.smoothing_scales = [dict(fwhm=600.0, fwhm_postproc=600.0, lmax=8,
                                 nside=4)]
    out = str(tmp_path_factory.mktemp("chains_ss"))
    state, chain_path = run(cfg, nside=8, lmax=16, synthetic=True, niter=2,
                            outdir=out, verbose=False, pixind=True)
    with ChainFile(chain_path, "r") as ch:
        s = ch.read_sample(2)
    tm = s["comps"]["synch"].get("theta_map0")
    assert tm is not None and tm.shape[-1] == 12 * 8 * 8
    assert np.all(np.isfinite(tm))
    # postproc smoothing leaves a smooth field: neighbouring-pixel scatter
    # well below the full prior range
    assert np.std(np.diff(tm)) < 0.5 * (tm.max() - tm.min() + 1e-6) + 0.05


def test_poltype_split_specind(tmp_path_factory):
    """COMP_*_POLTYPE >= 2 draws the spectral index separately per Stokes
    group ({T},{Q+U}) with the POL lnL type and applies per-Stokes mixing
    (the reference's per-poltype theta arrays,
    comm_diffuse_comp_mod.f90:67,378-390)."""
    cfg = _cfg()
    cfg.comps = [c for c in cfg.comps if c.label in ("cmb", "synch")]
    cfg.sample_specind = True
    for b in cfg.bands:
        b.polarized = True
    for c in cfg.comps:
        if c.label == "synch":
            c.lmax_ind = -1          # local (fullsky) sampler
            c.indices["beta"]["poltype"] = 2
            c.indices["beta"]["lnl_type_pol"] = "chisq"
    out = str(tmp_path_factory.mktemp("chains_poltype"))
    state, chain_path = run(cfg, nside=8, lmax=16, synthetic=True, niter=2,
                            outdir=out, verbose=False, pol=True)
    with ChainFile(chain_path, "r") as ch:
        s = ch.read_sample(2)
        synch = s["comps"]["synch"]
        assert "specind_pol0" in synch           # one Q+U group value
        pol_vals = np.asarray(synch["specind_pol0"])
        assert pol_vals.shape == (1,)
        assert np.all(np.isfinite(pol_vals))
        assert np.all(np.isfinite(np.asarray(synch["specind"])))
        assert np.isfinite(float(s["aux"]["chisq"]))


def test_almsamp_pixreg_mode(tmp_path_factory):
    # ALMSAMP_PIXREG: the alm-field sampler runs over pixel-region means
    # (the region branch of sample_specind_alm, comm_nonlin_mod.f90:420-607)
    cfg = _cfg()
    cfg.sample_specind = True
    cfg.almsamp_pixreg = True
    assert any(c.lmax_ind and c.lmax_ind > 0 for c in cfg.comps
               if c.cclass == "diffuse")
    for c in cfg.comps:
        if c.cclass == "diffuse" and c.lmax_ind and c.lmax_ind > 0:
            for name in c.indices:
                c.indices[name]["num_pixreg"] = 4
                c.indices[name]["fix_pixreg"] = "2"
    out = str(tmp_path_factory.mktemp("chains_pixreg"))
    state, chain_path = run(cfg, nside=8, lmax=16, synthetic=True, niter=2,
                            outdir=out, verbose=False)
    with ChainFile(chain_path, "r") as ch:
        s = ch.read_sample(2)
        has_map = any(k.startswith("theta_map")
                      for comp in s["comps"].values() for k in comp)
        assert has_map
        assert np.isfinite(float(s["aux"]["chisq"]))


def test_pixreg_ids_modes():
    from commander_tpu.run import _pixreg_ids
    from commander_tpu.sphere import sht

    plan = sht.get_plan(8, 16)
    npix = 12 * 8 * 8
    # coarse-pixel mode: npr = 12*2^2 = 48 -> every fine pixel maps to its
    # nside-2 parent; each region has npix/48 pixels
    ids = _pixreg_ids(plan, {}, 48)
    assert ids.shape == (npix,)
    assert ids.min() == 0 and ids.max() == 47
    assert np.all(np.bincount(ids, minlength=48) == npix // 48)
    # latitude-band fallback: npr = 5 equal-count bands in RING order
    ids5 = _pixreg_ids(plan, {}, 5)
    assert ids5.max() == 4
    assert np.all(np.diff(ids5) >= 0)   # monotone in ring-ordered pixel index


def test_init_chain_warm_start(tmp_path_factory):
    # INIT_CHAIN = 'file.h5:samp' warm start from another run's chain
    # (initialize_from_chain, comm_signal_mod.f90:237-432)
    cfg = _cfg()
    out1 = str(tmp_path_factory.mktemp("chains_src"))
    state1, chain1 = run(cfg, nside=8, lmax=16, synthetic=True, niter=2,
                         outdir=out1, verbose=False)
    with ChainFile(chain1, "r") as ch:
        src = ch.read_sample(2)
    cfg2 = _cfg()
    cfg2.init_chain = f"{chain1}:2"
    cfg2.num_gibbs_iter = 1
    out2 = str(tmp_path_factory.mktemp("chains_dst"))
    # capture the warm-start state by running zero additional smoothing:
    # one iteration starting FROM the loaded alms
    state2, chain2 = run(cfg2, nside=8, lmax=16, synthetic=True, niter=1,
                         outdir=out2, verbose=False)
    with ChainFile(chain2, "r") as ch:
        assert ch.last_sample() == 1
        s = ch.read_sample(1)
        assert np.isfinite(float(s["aux"]["chisq"]))


def test_output_input_model_mode(tmp_path_factory):
    # OUTPUT_INPUT_MODEL: model written as sample 999999, no Gibbs sampling
    # (commander.f90:132-137)
    cfg = _cfg()
    cfg.output_input_model = True
    out = str(tmp_path_factory.mktemp("chains_inmodel"))
    state, chain_path = run(cfg, nside=8, lmax=16, synthetic=True, niter=5,
                            outdir=out, verbose=False)
    with ChainFile(chain_path, "r") as ch:
        s = ch.read_sample(999999)
        assert any("alm" in c for c in s["comps"].values())
        # no regular samples were produced
        import h5py
        names = [k for k in ch.f.keys() if k != "parameters"]
        assert names == ["999999"]
