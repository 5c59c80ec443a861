"""WMAP-style differential mapmaking tests."""
import jax
import jax.numpy as jnp
import numpy as np

from commander_tpu.tod.differential import (project_diff, project_diff_T,
                                            sample_imbalance, solve_diff_map)

NSIDE = 8
NPIX = 12 * NSIDE * NSIDE


def _setup(pol=False, seed=0):
    rng = np.random.default_rng(seed)
    Ns, Nd, Nt = 6, 2, 6000
    k = 3 if pol else 1
    sky = rng.standard_normal((k, NPIX)) * 30
    if pol:
        sky[1:] *= 0.1
    pixA = rng.integers(0, NPIX, (Ns, Nd, Nt))
    # horn B points ~141 deg away: emulate by random but distinct pixels
    pixB = rng.integers(0, NPIX, (Ns, Nd, Nt))
    psiA = rng.uniform(0, 2 * np.pi, (Ns, Nd, Nt))
    psiB = rng.uniform(0, 2 * np.pi, (Ns, Nd, Nt))
    x_im = 0.01
    s = project_diff(jnp.asarray(sky), jnp.asarray(pixA), jnp.asarray(psiA),
                     jnp.asarray(pixB), jnp.asarray(psiB), x_im, pol)
    return sky, (jnp.asarray(pixA), jnp.asarray(psiA), jnp.asarray(pixB),
                 jnp.asarray(psiB)), x_im, s, rng


def test_projection_adjoint():
    sky, (pixA, psiA, pixB, psiB), x_im, s, rng = _setup(pol=True)
    tod = jnp.asarray(rng.standard_normal(s.shape))
    m = jnp.asarray(rng.standard_normal((3, NPIX)))
    lhs = float(jnp.sum(project_diff(m, pixA, psiA, pixB, psiB, x_im, True)
                        * tod))
    rhs = float(jnp.sum(m * project_diff_T(tod, pixA, psiA, pixB, psiB,
                                           x_im, NPIX, True)))
    assert abs(lhs - rhs) < 1e-8 * max(abs(lhs), 1.0)


def test_diff_mapmaker_recovers_sky_T():
    sky, ptg, x_im, s, rng = _setup(pol=False)
    noise = 0.05
    tod = s + noise * jnp.asarray(rng.standard_normal(s.shape))
    inv_var = jnp.full((6, 2), 1.0 / noise**2)
    mask = jnp.ones(tod.shape)
    m, res, hits = solve_diff_map(tod, *ptg, x_im, mask, inv_var, NPIX,
                                  pol=False, tol=1e-10, maxiter=300)
    assert res.converged
    h = np.asarray(hits)
    # differential data only constrains the sky up to a global offset
    d = np.asarray(m[0])[h] - sky[0][h]
    d = d - d.mean()
    assert np.abs(d).std() < 0.05, np.abs(d).std()


def test_imbalance_recovery():
    sky, (pixA, psiA, pixB, psiB), x_im_true, _, rng = _setup(pol=False)
    skyj = jnp.asarray(sky)
    sA = skyj[0][pixA]
    sB = skyj[0][pixB]
    x_im_true = 0.013
    noise = 0.05
    tod = (1 + x_im_true) * sA - (1 - x_im_true) * sB \
        + noise * jnp.asarray(rng.standard_normal(sA.shape))
    resid = tod - (sA - sB)   # subtract the x_im=0 model
    x = sample_imbalance(jax.random.PRNGKey(0), resid, sA, sB,
                         jnp.ones(tod.shape), jnp.full((6, 2), noise))
    assert abs(float(jnp.mean(x)) - x_im_true) < 1e-3
