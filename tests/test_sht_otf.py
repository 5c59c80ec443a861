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


def test_deep_mode_emergence_accuracy():
    """Regression: scaled-recurrence rescale events near the turning point.

    Before the fix, a rescale (mantissa crossing the 2^k block boundary)
    recorded the divided `cur` with a stale exponent, double-scaling the
    beta*prev term on the next step. For modes whose seed underflows deeply
    (large m, polar rings) and whose rescale lands near the turning point
    (prev ~ cur), this froze a ~5% multiplicative error into every
    lambda_lm of that (ring, m) from the emergence point on (seen at
    nside 512 as ~1e8 roundtrip mode amplification). Oracle: the Jacobi
    form d^l_{m,0} ~ P_{l-m}^{(m,m)}(cos t), exact and stable for small
    l - m (scipy's own sph_harm_y is wrong at these modes).
    """
    import numpy as np
    from scipy.special import eval_jacobi, gammaln

    from commander_tpu.sphere import healpix, sht_otf
    from commander_tpu.sphere.wigner import spin_lambda_north

    nside, lmax = 128, 256

    def jac_lam(l, m, beta):
        s = l - m
        logfac = 0.5 * (gammaln(s + 1) + gammaln(s + 2 * m + 1)
                        - 2 * gammaln(s + m + 1))
        lpow = m * (np.log(np.sin(beta / 2)) + np.log(np.cos(beta / 2)))
        if logfac + lpow < -600:
            return 0.0
        return float(np.exp(logfac + lpow)
                     * eval_jacobi(s, m, m, np.cos(beta))
                     * np.sqrt((2 * l + 1) / (4 * np.pi)))

    g = healpix.ring_geometry(nside)
    tab, _ = spin_lambda_north(nside, lmax, 0, lmax)
    otf = sht_otf.legendre_otf(nside, lmax, 0, dtype="float64", chunk=32)
    chunks = dict(sht_otf._lam_chunks_scan(
        otf, lambda l0, lam, ex: ex + [(l0, np.asarray(lam))], []))

    checked = 0
    for m in (150, 180, 210, 240):
        for r in range(10, 2 * nside, 37):          # cap + belt rings
            beta = g.theta[r]
            for l in (m, m + 5, m + 16):
                if l > lmax:
                    continue
                ref = jac_lam(l, m, beta)
                if abs(ref) < 1e-12:                 # node / flushed region
                    continue
                assert abs(tab[r, l, m] - ref) <= 1e-9 * abs(ref), \
                    (m, r, l, tab[r, l, m], ref)
                l0 = (l // 32) * 32
                got = chunks[l0][l - l0, r, m]
                assert abs(got - ref) <= 1e-9 * abs(ref), \
                    (m, r, l, got, ref)
                checked += 1
    assert checked >= 30


def test_otf_spin2_matches_table_path():
    """Round-5: tableless polarized plans (the production route at
    nside >= 512 where spin-2 tables exceed HBM) must match the table
    path for Y_spin2, its adjoint, and quadrature analysis."""
    import numpy as np
    import jax.numpy as jnp

    from commander_tpu.sphere import sht

    nside, lmax = 32, 64
    pt = sht.get_plan(nside, lmax, dtype="float64", spin2=True)
    po = sht.get_plan(nside, lmax, dtype="float64", spin2=True,
                      tables=False)
    rng = np.random.default_rng(0)
    nl = lmax + 1
    tri = np.tril(np.ones((nl, nl)))
    mk = lambda: jnp.asarray((rng.standard_normal((2, nl, nl))
                              + 1j * rng.standard_normal((2, nl, nl)))
                             * tri)
    aE, aB = mk(), mk()
    Qt, Ut = sht.alm2map_spin2(pt, aE, aB)
    Qo, Uo = sht.alm2map_spin2(po, aE, aB)
    sc = float(jnp.abs(Qt).max())
    assert float(jnp.abs(Qo - Qt).max()) < 1e-8 * sc
    assert float(jnp.abs(Uo - Ut).max()) < 1e-8 * sc
    Et, Bt = sht.alm2map_spin2_adjoint(pt, Qt, Ut)
    Eo, Bo = sht.alm2map_spin2_adjoint(po, Qt, Ut)
    sce = float(jnp.abs(Et).max())
    assert float(jnp.abs(Eo - Et).max()) < 1e-8 * sce
    assert float(jnp.abs(Bo - Bt).max()) < 1e-8 * sce
    E2t, B2t = sht.map2alm_spin2(pt, Qt, Ut)
    E2o, B2o = sht.map2alm_spin2(po, Qt, Ut)
    sc2 = float(jnp.abs(E2t).max())
    assert float(jnp.abs(E2o - E2t).max()) < 1e-8 * sc2
    assert float(jnp.abs(B2o - B2t).max()) < 1e-8 * sc2
