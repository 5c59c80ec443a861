"""Sherman-Morrison/Woodbury masked n_corr sampler vs a dense oracle.

The exact conditional of the (whitened) correlated noise given unmasked
data has precision A = diag(mask) + invNcorr (mirrored-FFT-diagonal prior).
sample_ncorr_sm must return sigma0 * A^-1 b; the dense oracle builds A by
applying the operator to unit vectors (reference: get_ncorr_sm_cg,
comm_tod_noise_mod.f90:308-466).
"""
import numpy as np
import jax
import jax.numpy as jnp

from commander_tpu.tod.model import (_mirror_fourier_apply, sample_ncorr,
                                     sample_ncorr_sm)


def _setup(Nt=64, fsamp=10.0, alpha=-1.5, fknee=0.5, sigma0=2.0, seed=0):
    rng = np.random.default_rng(seed)
    resid = rng.normal(0, sigma0, (1, 1, Nt))
    mask = np.ones((1, 1, Nt))
    mask[0, 0, 20:28] = 0.0
    mask[0, 0, 50:53] = 0.0
    s0 = jnp.full((1, 1), sigma0)
    al = jnp.full((1, 1), alpha)
    fk = jnp.full((1, 1), fknee)
    return jnp.asarray(resid), jnp.asarray(mask), s0, al, fk, fsamp


def _dense_A(mask, alpha, fknee, fsamp, Nt):
    freqs = np.fft.rfftfreq(2 * Nt, 1.0 / fsamp)
    invN = np.where(freqs > 0, (freqs / fknee) ** (-alpha), 0.0)
    cols = []
    eye = jnp.eye(Nt)[:, None, None, :]
    op = jax.vmap(lambda e: _mirror_fourier_apply(e, jnp.asarray(invN)))
    P = np.asarray(op(eye))[:, 0, 0, :]         # invNcorr dense (Nt, Nt)
    return np.diag(np.asarray(mask)[0, 0]) + P.T


def test_sm_wiener_mean_matches_dense():
    resid, mask, s0, al, fk, fsamp = _setup()
    Nt = resid.shape[-1]
    n_sm = np.asarray(sample_ncorr_sm(None, resid, mask, s0, al, fk, fsamp,
                                      n_iter=40))[0, 0]
    A = _dense_A(mask, float(al[0, 0]), float(fk[0, 0]), fsamp, Nt)
    b = np.asarray(resid)[0, 0] / float(s0[0, 0]) * np.asarray(mask)[0, 0]
    n_dense = float(s0[0, 0]) * np.linalg.solve(A, b)
    np.testing.assert_allclose(n_sm, n_dense, rtol=0, atol=1e-8)


def test_sm_mean_on_gaps_interpolates():
    """On gaps the conditional mean must be the 1/f-prior interpolation of
    the neighbouring unmasked noise — strictly between the gap-edge values'
    envelope and far from zero when the signal is smooth."""
    Nt, fsamp = 256, 10.0
    rng = np.random.default_rng(1)
    # smooth low-frequency noise: the prior should bridge the gap
    t = np.arange(Nt)
    smooth = 5.0 * np.sin(2 * np.pi * t / 128.0)
    resid = (smooth + rng.normal(0, 0.1, Nt))[None, None]
    mask = np.ones((1, 1, Nt)); mask[0, 0, 100:120] = 0.0
    s0 = jnp.full((1, 1), 1.0); al = jnp.full((1, 1), -2.0)
    fk = jnp.full((1, 1), 1.0)
    n = np.asarray(sample_ncorr_sm(None, jnp.asarray(resid),
                                   jnp.asarray(mask), s0, al, fk, fsamp,
                                   n_iter=40))[0, 0]
    gap_vals = n[100:120]
    edges = smooth[99], smooth[120]
    lo, hi = min(edges) - 1.0, max(edges) + 1.0
    assert gap_vals.min() > lo - 2 and gap_vals.max() < hi + 2
    # and it tracks the smooth component reasonably inside the gap
    assert np.max(np.abs(gap_vals - smooth[100:120])) < 2.5


def test_sm_fluctuation_moments():
    """With all samples unmasked and many draws, the empirical variance of
    the SM draw matches the plain Fourier conditional's variance."""
    Nt, fsamp, ndraw = 128, 10.0, 200
    rng = np.random.default_rng(2)
    resid = jnp.asarray(rng.normal(0, 1.0, (1, 1, Nt)))
    mask = jnp.ones((1, 1, Nt))
    s0 = jnp.full((1, 1), 1.0); al = jnp.full((1, 1), -1.0)
    fk = jnp.full((1, 1), 1.0)
    f = jax.jit(lambda k: sample_ncorr_sm(k, resid, mask, s0, al, fk, fsamp,
                                          n_iter=30))
    keys = jax.random.split(jax.random.PRNGKey(0), ndraw)
    draws = np.asarray(jax.vmap(f)(keys))[:, 0, 0, :]
    mean = draws.mean(0)
    n_mean = np.asarray(sample_ncorr_sm(None, resid, mask, s0, al, fk,
                                        fsamp, n_iter=30))[0, 0]
    # MC error of the mean ~ sigma/sqrt(ndraw); allow 5 sigma
    sig = draws.std(0)
    assert np.all(np.abs(mean - n_mean) < 5 * sig / np.sqrt(ndraw) + 0.05)
    # analytic per-sample variance: diag of A^-1 (whitened) = dense inverse
    A = _dense_A(mask, -1.0, 1.0, fsamp, Nt)
    var_dense = np.diag(np.linalg.inv(A))
    ratio = draws.var(0) / var_dense
    assert 0.7 < ratio.mean() < 1.3
