"""On-the-fly (chunked-recurrence) SHT vs the table-based oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from commander_tpu.sphere import sht
from commander_tpu.sphere.sht_otf import (alm2map_otf, legendre_otf,
                                          map2alm_otf)


def rand_alm(rng, lmax, dtype=np.complex128):
    nl = lmax + 1
    a = rng.standard_normal((2, nl, nl)) + 1j * rng.standard_normal((2, nl, nl))
    for l in range(nl):
        a[:, l, l + 1:] = 0
    a[:, :, 0] = a[:, :, 0].real
    return a.astype(dtype)


@pytest.mark.parametrize("nside,lmax,chunk", [(16, 32, 16), (8, 16, 7),
                                              (16, 24, 32)])
def test_otf_matches_tables_f64(nside, lmax, chunk):
    plan_t = sht.get_plan(nside, lmax)
    plan = sht.get_plan(nside, lmax, tables=False)
    otf = legendre_otf(nside, lmax, 0, dtype="float64", chunk=chunk)
    alm = rand_alm(np.random.default_rng(0), lmax)
    m_t = np.asarray(sht.alm2map(plan_t, jnp.asarray(alm)))
    m_o = np.asarray(alm2map_otf(plan, otf, jnp.asarray(alm)))
    assert np.abs(m_t - m_o).max() < 1e-9
    a_t = np.asarray(sht.map2alm(plan_t, jnp.asarray(m_t)))
    a_o = np.asarray(map2alm_otf(plan, otf, jnp.asarray(m_t)))
    assert np.abs(a_t - a_o).max() < 1e-10


def test_otf_f32_scaling_stability():
    # f32 recurrence with block-exponent rescaling must stay accurate at
    # high m near the poles where raw f32 underflows
    nside, lmax = 32, 64
    plan_t = sht.get_plan(nside, lmax)             # f64 oracle
    plan = sht.get_plan(nside, lmax, dtype="float32", tables=False)
    otf = legendre_otf(nside, lmax, 0, dtype="float32", chunk=32)
    alm = rand_alm(np.random.default_rng(1), lmax)
    m_t = np.asarray(sht.alm2map(plan_t, jnp.asarray(alm)))
    m_o = np.asarray(alm2map_otf(plan, otf,
                                 jnp.asarray(alm.astype(np.complex64))))
    rel = np.abs(m_t - m_o).max() / np.abs(m_t).max()
    assert rel < 5e-5, rel
    assert np.isfinite(m_o).all()


def test_spin2_otf_matches_tables():
    nside, lmax = 16, 32
    plan_t = sht.get_plan(nside, lmax, spin2=True)
    plan = sht.get_plan(nside, lmax, tables=False)
    otf_p = legendre_otf(nside, lmax, -2, dtype="float64", chunk=16)
    otf_m = legendre_otf(nside, lmax, 2, dtype="float64", chunk=16)
    from commander_tpu.sphere.sht_otf import alm2map_spin2_otf
    rng = np.random.default_rng(3)
    aE = rand_alm(rng, lmax)[0]
    aB = rand_alm(rng, lmax)[0]
    aE[:2] = 0
    aB[:2] = 0
    Q_t, U_t = sht.alm2map_spin2(plan_t, jnp.asarray(aE), jnp.asarray(aB))
    Q_o, U_o = alm2map_spin2_otf(plan, otf_p, otf_m, jnp.asarray(aE),
                                 jnp.asarray(aB))
    scale = np.abs(np.asarray(Q_t)).max()
    assert np.abs(np.asarray(Q_o) - np.asarray(Q_t)).max() < 1e-9 * scale
    assert np.abs(np.asarray(U_o) - np.asarray(U_t)).max() < 1e-9 * scale


def test_tableless_plan_dispatch():
    """Plans built with tables=False run the full CG via OTF transparently."""
    import jax
    from functools import partial
    from commander_tpu.sampling import amplitude as amp
    from commander_tpu.instrument.beam import gaussian_bl
    nside, lmax = 8, 16
    sht.get_plan.cache_clear()
    plan_t = sht.get_plan(nside, lmax)
    plan_o = sht.get_plan(nside, lmax, tables=False)
    alm = rand_alm(np.random.default_rng(5), lmax)
    np.testing.assert_allclose(
        np.asarray(sht.alm2map(plan_o, jnp.asarray(alm))),
        np.asarray(sht.alm2map(plan_t, jnp.asarray(alm))), atol=1e-10)
    m = np.random.default_rng(6).standard_normal(12 * nside * nside)
    np.testing.assert_allclose(
        np.asarray(sht.alm2map_adjoint(plan_o, jnp.asarray(m))),
        np.asarray(sht.alm2map_adjoint(plan_t, jnp.asarray(m))), atol=1e-10)
    # CG amplitude solve through the tableless plan
    nl = lmax + 1
    npix = 12 * nside * nside
    F = np.ones((2, 1, 1))
    bl = gaussian_bl(600.0, lmax)[None, None, :].repeat(2, 0)
    ell = np.arange(nl)
    cl = (1e3 / (1 + ell * (ell + 1.0)))[None, None, :]
    rms = np.full((2, 1, npix), 5.0)
    data = np.random.default_rng(7).standard_normal((2, 1, npix)) * 10
    sys = amp.build_system(jnp.asarray(F), jnp.asarray(bl), jnp.asarray(rms),
                           jnp.asarray(cl), jnp.asarray(data))
    a_o, res_o = amp.sample_amplitudes(sys, plan_o, key=None, tol=1e-9,
                                       maxiter=200)
    a_t, res_t = amp.sample_amplitudes(sys, plan_t, key=None, tol=1e-9,
                                       maxiter=200)
    assert res_o.converged and res_t.converged
    np.testing.assert_allclose(np.asarray(a_o), np.asarray(a_t), atol=1e-7)
