"""Mono/dipole priors, line-component mixing, Wiener gain smoothing."""
import jax
import jax.numpy as jnp
import numpy as np

from commander_tpu.sphere import healpix


def test_masked_monodipole_fit():
    from commander_tpu.sampling.priors import (masked_monodipole_fit,
                                               subtract_masked_monopole)
    nside = 8
    npix = 12 * nside * nside
    vec = jnp.asarray(healpix.pix2vec_ring(nside))
    rng = np.random.default_rng(0)
    coeff_true = np.array([5.0, 1.0, -2.0, 0.5])
    maps = coeff_true[0] + vec @ jnp.asarray(coeff_true[1:]) \
        + 0.01 * jnp.asarray(rng.standard_normal(npix))
    mask = jnp.asarray((rng.uniform(size=npix) > 0.3).astype(float))
    coeff, templ = masked_monodipole_fit(maps, mask, vec)
    np.testing.assert_allclose(np.asarray(coeff), coeff_true, atol=0.01)
    resid, _ = subtract_masked_monopole(maps, mask, vec)
    assert float(jnp.abs(resid).max()) < 0.1


def test_project_out_monodipole():
    from commander_tpu.sampling.priors import project_out_monodipole
    a = jnp.ones((2, 5, 5), jnp.complex128)
    out = project_out_monodipole(a)
    assert float(jnp.abs(out[:, :2]).max()) == 0.0
    assert float(jnp.abs(out[:, 2:]).min()) == 1.0


def test_line_component_mixing():
    from commander_tpu.instrument.bandpass import delta_bandpass
    from commander_tpu.model.mixing import DiffuseComponent, mixing_matrix
    comps = [DiffuseComponent("co", "line", 115e9),
             DiffuseComponent("cmb", "cmb", 100e9, unit="uK_cmb")]
    bps = [delta_bandpass(f * 1e9) for f in (100, 115, 230)]
    # line present in bands 1 and 2 with ratios 1 and 0.6
    F = np.asarray(mixing_matrix(comps, bps, thetas=[(0.0, 1.0, 0.6), ()]))
    np.testing.assert_allclose(F[:, 0], [0.0, 1.0, 0.6])
    assert F[1, 1] > 0   # cmb column untouched


def test_wiener_gain_smoothing():
    from commander_tpu.tod.model import smooth_gain_wiener
    rng = np.random.default_rng(1)
    Ns, Nd = 64, 2
    t = np.arange(Ns)
    g_true = 1.0 + 0.03 * np.sin(2 * np.pi * t / 32)[:, None] * np.ones((1, Nd))
    sigma = 0.02
    g_raw = g_true + sigma * rng.standard_normal((Ns, Nd))
    sm = np.asarray(smooth_gain_wiener(jax.random.PRNGKey(0),
                                       jnp.asarray(g_raw),
                                       jnp.full((Ns, Nd), sigma),
                                       sample=False))
    # smoothing reduces the error vs the raw estimates
    err_raw = np.abs(g_raw - g_true).mean()
    err_sm = np.abs(sm - g_true).mean()
    assert err_sm < 0.7 * err_raw, (err_raw, err_sm)
    # sampling variant stays near the smooth solution
    s2 = np.asarray(smooth_gain_wiener(jax.random.PRNGKey(1),
                                       jnp.asarray(g_raw),
                                       jnp.full((Ns, Nd), sigma)))
    assert np.abs(s2 - g_true).mean() < 1.5 * err_raw
