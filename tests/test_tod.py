"""TOD layer tests: parameter recovery from synthetic time streams."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commander_tpu.sphere import healpix
from commander_tpu.tod import model as M
from commander_tpu.tod.process import TodConfig, init_tod_state, process_tod
from commander_tpu.tod.sim import simulate_tod

NSIDE = 8
NPIX = 12 * NSIDE * NSIDE


@pytest.fixture(scope="module")
def sim():
    rng = np.random.default_rng(0)
    sky = rng.standard_normal((1, NPIX)) * 50.0 + 100.0
    block, truth = simulate_tod(NSIDE, sky, nscan=10, ndet=2, ntod=4096,
                                sigma0=0.5, gain0=1.07, alpha=-1.5,
                                fknee=0.3, seed=1)
    return sky, block, truth


def test_project_sky_gather(sim):
    sky, block, truth = sim
    s = M.project_sky(jnp.asarray(sky), block.pix, block.psi, False)
    np.testing.assert_allclose(np.asarray(s), truth["s_sky"], atol=1e-10)


def test_sample_ncorr_statistics(sim):
    sky, block, truth = sim
    # residual with perfect gain/sky knowledge: ncorr + white
    resid = block.tod - truth["gain"] * (jnp.asarray(truth["s_sky"])
                                         + jnp.asarray(truth["s_orb"]))
    draws = []
    for s in range(6):
        nc = M.sample_ncorr(jax.random.PRNGKey(s), resid, block.mask,
                            jnp.full((10, 2), 0.5), jnp.full((10, 2), -1.5),
                            jnp.full((10, 2), 0.3), block.fsamp)
        draws.append(np.asarray(nc))
    est = np.mean(draws, axis=0)
    tr = truth["ncorr"] - truth["ncorr"].mean(-1, keepdims=True)
    # posterior mean should correlate strongly with true n_corr
    c = np.corrcoef(est.reshape(-1), tr.reshape(-1))[0, 1]
    assert c > 0.85, c
    # and reduce the residual power
    assert np.var(np.asarray(resid) - est) < 0.5 * np.var(np.asarray(resid))


def test_noise_psd_recovery(sim):
    sky, block, truth = sim
    resid = block.tod - truth["gain"] * (jnp.asarray(truth["s_sky"])
                                         + jnp.asarray(truth["s_orb"]))
    # subtract the true ncorr -> white residual for sigma0; feed the full
    # (ncorr-containing) residual for the (alpha, fknee) grid draw
    white = resid - jnp.asarray(truth["ncorr"])
    s0, _, _ = M.sample_noise_psd(jax.random.PRNGKey(0), white, block.mask,
                                  block.fsamp,
                                  jnp.linspace(-2.5, -0.5, 16),
                                  jnp.geomspace(0.02, 2.0, 16))
    assert abs(np.mean(np.asarray(s0)) - 0.5) < 0.05
    _, al, fk = M.sample_noise_psd(jax.random.PRNGKey(1), resid, block.mask,
                                   block.fsamp,
                                   jnp.linspace(-2.5, -0.5, 24),
                                   jnp.geomspace(0.02, 2.0, 24),
                                   sigma0_fix=jnp.full((10, 2), 0.5))
    assert abs(np.median(np.asarray(al)) + 1.5) < 0.4
    assert abs(np.log(np.median(np.asarray(fk)) / 0.3)) < 0.7


def test_gain_recovery(sim):
    sky, block, truth = sim
    s_ref = jnp.asarray(truth["s_sky"] + truth["s_orb"])
    d = block.tod - jnp.asarray(truth["ncorr"])
    g = M.sample_gain_perscan(jax.random.PRNGKey(0), d, s_ref, block.mask,
                              jnp.full((10, 2), 0.5))
    assert abs(np.mean(np.asarray(g)) - 1.07) < 0.01


def test_binmap_recovers_sky(sim):
    sky, block, truth = sim
    # perfectly calibrated, noise-free binning recovers the sky at hit pixels
    calib = jnp.asarray(truth["s_sky"])
    inv_var = jnp.ones((10, 2))
    A, b = M.bin_tod(calib, block.pix, block.psi, block.mask, inv_var,
                     NPIX, pol=False)
    m, rms, fluct = M.finalize_binned_map(jax.random.PRNGKey(0), A, b)
    hits = np.asarray(A[0]) > 0    # packed normal equations (kk, npix)
    assert hits.mean() > 0.4   # the 10-scan strategy covers a good fraction
    np.testing.assert_allclose(np.asarray(m[0])[hits], sky[0][hits],
                               rtol=1e-6, atol=1e-6)


def test_process_tod_end_to_end(sim):
    sky, block, truth = sim
    cfg = TodConfig(nside=NSIDE, nu=30e9)
    state = init_tod_state(block)
    pvec = jnp.asarray(healpix.pix2vec_ring(NSIDE))
    step = jax.jit(lambda st, k: process_tod(cfg, block, st,
                                             jnp.asarray(sky), pvec, k))
    key = jax.random.PRNGKey(0)
    for i in range(5):   # includes Gibbs burn-in of the noise parameters
        key, k = jax.random.split(key)
        state, prod = step(state, k)
    # gain converges near truth
    assert abs(float(jnp.mean(state.gain)) - 1.07) < 0.02
    # binned map close to input sky on hit pixels (noise-limited)
    m = np.asarray(prod["map"][0])
    rms = np.asarray(prod["rms"][0])
    hits = rms > 0
    resid = (m - sky[0])[hits]
    # chi2 of map residual vs rms ~ 1 (within factor 2 given ncorr residue)
    z2 = np.mean((resid / np.maximum(rms[hits], 1e-10)) ** 2)
    assert z2 < 4.0, z2
    assert np.all(np.asarray(prod["accept"]) >= 0)
