"""Geweke (joint-distribution) test of the amplitude + C_ell Gibbs sampler.

The definitive sampler-correctness check the reference never had: the
statistics of (Cl, a) from
  (1) marginal-conditional forward simulation:
      Cl ~ prior, a ~ P(a | Cl), d ~ P(d | a)
  (2) successive-conditional simulation: the Gibbs chain
      a ~ P(a | d, Cl), Cl ~ P(Cl | a), d ~ P(d | a)   [data re-drawn]
must agree in distribution. Any error in the conditionals, the RHS
fluctuation terms, the preconditioner's metric, or the Cl draw shows up as
a biased z-score.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commander_tpu.instrument.beam import gaussian_bl
from commander_tpu.model.cl import (ClModelConfig, bin_index_table,
                                    cl_eval, sample_cl_binned_invgamma,
                                    sample_cl_prior)
from commander_tpu.sampling import amplitude as amp
from commander_tpu.sphere import sht
from commander_tpu.sphere.alm import random_alm_white, triangle_mask

NSIDE, LMAX = 8, 8
NPIX = 12 * NSIDE * NSIDE
A0, B0 = 4.0, 300.0       # proper InvGamma prior on Cl bins
RMS = 8.0


def _base():
    plan = sht.get_plan(NSIDE, LMAX)
    nl = LMAX + 1
    cfg = ClModelConfig(kind="binned", lmax=LMAX, nmaps=1,
                        bin_starts=(0, 3, 6))
    C = 1
    F = np.ones((1, C, 1))
    bl = gaussian_bl(700.0, LMAX)[None, None, :]
    rms = np.full((1, 1, NPIX), RMS)
    sys = amp.build_system(jnp.asarray(F), jnp.asarray(bl), jnp.asarray(rms),
                           jnp.ones((C, 1, nl)), jnp.zeros((1, 1, NPIX)))
    tri = jnp.asarray(triangle_mask(nl, nl))
    return plan, cfg, sys, tri


def _stats(cl_bins, a):
    """Summary statistics compared between the two simulations."""
    return np.concatenate([
        np.log(np.asarray(cl_bins)).ravel(),
        [float(jnp.sum(jnp.abs(a) ** 2))],
    ])


def _forward(plan, cfg, sys, tri, key):
    k1, k2, k3 = jax.random.split(key, 3)
    cl_bins = sample_cl_prior(k1, cfg, 1, A0, B0)
    cl = cl_eval(cfg, {"cl_bins": cl_bins})[None]
    a = amp.apply_sqrtS(cl, random_alm_white(k2, (1, 1, LMAX + 1, LMAX + 1)))
    a = a * tri
    return cl_bins, a


def _data_from(plan, sys, a, key):
    sky = amp._synth(plan, amp._project_bands(sys, plan, a))
    noise = RMS * jax.random.normal(key, sky.shape, sky.dtype)
    return dataclasses.replace(sys, data=sky + noise)


@pytest.mark.slow
def test_geweke_joint_consistency():
    plan, cfg, sys0, tri = _base()
    n_mc, n_gibbs, thin = 1200, 5000, 4

    # (1) marginal-conditional
    stats_mc = []
    key = jax.random.PRNGKey(0)
    fwd = jax.jit(lambda k: _forward(plan, cfg, sys0, tri, k))
    for i in range(n_mc):
        key, k = jax.random.split(key)
        cl_bins, a = fwd(k)
        stats_mc.append(_stats(cl_bins, a))
    stats_mc = np.asarray(stats_mc)

    # (2) successive-conditional Gibbs with data refresh
    key = jax.random.PRNGKey(1)
    cl_bins, a = fwd(key)
    sys = _data_from(plan, sys0, a, jax.random.PRNGKey(2))

    def gibbs_once(sys, cl_bins, key):
        k1, k2, k3 = jax.random.split(key, 3)
        cl = cl_eval(cfg, {"cl_bins": cl_bins})[None]
        s2 = dataclasses.replace(sys, cl=cl)
        a, _ = amp.sample_amplitudes(s2, plan, key=k1, tol=1e-9, maxiter=200)
        cl_bins = sample_cl_binned_invgamma(k2, cfg, a[:, 0], alpha0=A0,
                                            beta0=B0)
        sys = _data_from(plan, s2, a, k3)
        return sys, cl_bins, a

    step = jax.jit(gibbs_once)
    stats_sc = []
    for i in range(n_gibbs):
        key, k = jax.random.split(key)
        sys, cl_bins, a = step(sys, cl_bins, k)
        if i > 100 and i % thin == 0:
            stats_sc.append(_stats(cl_bins, a))
    stats_sc = np.asarray(stats_sc)

    # z-scores between the two sets of means. ESS via batch-means estimate
    # of the autocorrelated Gibbs stream (conservative floor).
    nb = 25
    bm = stats_sc[: (len(stats_sc) // nb) * nb].reshape(nb, -1,
                                                        stats_sc.shape[1])
    bmeans = bm.mean(axis=1)
    var_bm = bmeans.var(axis=0) / nb          # var of the overall mean
    ess = None
    for j in range(stats_mc.shape[1]):
        m1, v1 = stats_mc[:, j].mean(), stats_mc[:, j].var()
        m2 = stats_sc[:, j].mean()
        z = (m1 - m2) / np.sqrt(v1 / len(stats_mc) + var_bm[j])
        assert abs(z) < 4.0, f"stat {j}: z={z:.2f} ({m1:.3f} vs {m2:.3f})"
