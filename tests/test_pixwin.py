"""Exact pixel-window tables vs an independent synthesize-degrade oracle.

The reference loads HEALPix pixel_window FITS tables; pixel_window_exact
computes them from the definition. Oracle: synthesize a known-C_ell field
at high resolution, degrade-average to nside, measure the empirical
sigma_ell suppression — an entirely independent path through the SHT
machinery.
"""
import numpy as np
import jax
import jax.numpy as jnp

from commander_tpu.instrument.beam import pixel_window, pixel_window_exact
from commander_tpu.model.cl import sigma_ell
from commander_tpu.sphere import healpix, sht
from commander_tpu.sphere.alm import random_alm_white, triangle_mask


def test_pixwin_basic_properties():
    w = pixel_window_exact(8, 24)
    assert np.isclose(w[0], 1.0, atol=1e-12)
    assert np.all(w <= 1.0 + 1e-12) and np.all(w > 0.0)
    assert np.all(np.diff(w) < 1e-12)       # monotone decreasing
    # pixel_window delegates to the exact table at small nside
    wa = pixel_window(8, 24)
    np.testing.assert_allclose(w, wa, atol=1e-12)


def test_pixwin_selfsimilar_rescaling():
    """The large-nside path rescales the exact nside-128 table; check the
    self-similarity assumption against exact tables across an octave."""
    w64 = pixel_window_exact(64, 128)
    w128 = pixel_window_exact(128, 128)
    ell = np.arange(129, dtype=np.float64)
    # predicting nside=128 from the nside=64 table: sample at l * 64/128
    resc = np.interp(ell * 0.5, np.arange(129, dtype=np.float64), w64)
    assert np.max(np.abs(resc - w128)) < 0.01


def test_pixwin_matches_synthesize_degrade_oracle():
    nside, lmax = 8, 16
    nside_hi = 64
    nl = lmax + 1
    # average over many random fields for a tight MC estimate
    plan_hi = sht.get_plan(nside_hi, lmax)
    plan_lo = sht.get_plan(nside, lmax)
    idx = healpix.udgrade_indices(nside_hi, nside)
    tri = jnp.asarray(triangle_mask(nl, nl))

    def one(key):
        a = random_alm_white(key, (1, nl, nl)) * tri
        m_hi = sht.alm2map(plan_hi, a)
        m_lo = jnp.mean(m_hi[..., idx], axis=-1)
        a_lo = sht.map2alm_iter(plan_lo, m_lo, iters=5)
        return sigma_ell(a_lo, lmax)[0], sigma_ell(a, lmax)[0]

    keys = jax.random.split(jax.random.PRNGKey(0), 48)
    lo, hi = jax.vmap(one)(keys)
    ratio = np.asarray(jnp.sum(lo, 0) / jnp.sum(hi, 0))
    w2 = pixel_window_exact(nside, lmax) ** 2
    # ell=0..lmax; skip l=0 (degrade preserves the mean by construction)
    # MC error ~ 1/sqrt(nkeys*(2l+1)); the hi-res grid itself has a tiny
    # pixel window (nside 64 at l<=16: <0.1%)
    assert np.max(np.abs(ratio[1:] - w2[1:]) / w2[1:]) < 0.05
