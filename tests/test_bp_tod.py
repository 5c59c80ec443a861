"""TOD-chi^2 bandpass Metropolis step.

Reference: sample_bp (comm_tod_bandpass_mod.f90:28-82) accepts/rejects a
proposed bandpass shift on the chi^2 of the band's TOD residuals evaluated
with sky models at the current and proposed shifts (proposal flow in
commander.f90:299-335).
"""
import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from commander_tpu.sampling.mh import accept_bandpass_tod
from commander_tpu.sphere import healpix
from commander_tpu.tod.process import TodConfig, init_tod_state, tod_chisq
from commander_tpu.tod.sim import simulate_tod

REF_PARAM = "/root/reference/tutorial/param_tutorial.txt"


def test_accept_bandpass_tod_prefers_lower_chisq():
    key = jax.random.PRNGKey(0)
    # enormous chi2 difference -> deterministic accept / reject
    d, acc = accept_bandpass_tod(key, 1e6, 1e3, 0.0, 2e8)
    assert bool(acc) and float(d) == 2e8
    d, acc = accept_bandpass_tod(key, 1e3, 1e6, 0.0, 2e8)
    assert not bool(acc) and float(d) == 0.0


def test_tod_chisq_minimized_at_true_sky():
    nside = 8
    npix = 12 * nside * nside
    rng = np.random.default_rng(0)
    sky_true = rng.normal(0, 30.0, (1, npix))
    block, truth = simulate_tod(nside, sky_true, nscan=2, ndet=2, ntod=1024,
                                sigma0=1.0, gain0=1.0, seed=1)
    tstate = init_tod_state(block)
    Ns, Nd = block.tod.shape[:2]
    tstate = dataclasses.replace(
        tstate, gain=jnp.full((Ns, Nd), truth["gain"]),
        sigma0=jnp.full((Ns, Nd), truth["sigma0"]),
        n_corr=jnp.asarray(truth["ncorr"]))
    cfg = TodConfig(nside=nside, nu=30e9)
    pvec = jnp.asarray(healpix.pix2vec_ring(nside))
    c_true = float(tod_chisq(cfg, block, tstate, jnp.asarray(sky_true), pvec))
    # a perturbed sky (mimicking a wrong bandpass shift scaling the
    # foreground) must give larger chi2
    c_wrong = float(tod_chisq(cfg, block, tstate,
                              jnp.asarray(sky_true * 1.05), pvec))
    ndof = float(np.sum(np.asarray(block.mask)))
    assert abs(c_true / ndof - 1.0) < 0.1
    assert c_wrong > c_true


@pytest.mark.skipif(not os.path.exists(REF_PARAM), reason="reference absent")
def test_driver_bandpass_mh_smoke(tmp_path_factory):
    from commander_tpu.io.params import Params, lower_params
    from commander_tpu.run import run

    cfg = lower_params(Params.load(REF_PARAM))
    for b in cfg.bands:
        b.sample_bandpass = True
        b.bandpass_type = "LFI"          # force non-delta bandpasses
        b.bandpassfile = "synthetic"
    out = str(tmp_path_factory.mktemp("chains_bp"))
    state, chain_path = run(cfg, nside=8, lmax=16, synthetic=True, niter=2,
                            outdir=out, verbose=False, tod=True)
    from commander_tpu.io.chain import ChainFile
    with ChainFile(chain_path, "r") as ch:
        s = ch.read_sample(2)
        assert "bp_delta" in s["aux"]
        assert np.all(np.isfinite(np.asarray(s["aux"]["bp_delta"])))
