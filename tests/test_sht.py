"""SHT correctness tests against brute-force spherical harmonics (scipy /
Goldberg closed form) plus exactness identities (adjointness, roundtrips).

This is the oracle suite the reference never had (SURVEY.md §4): libsharp was
trusted; here every transform is validated to float64 precision.
"""
import numpy as np
import jax.numpy as jnp
import pytest
from math import comb, factorial
from scipy.special import sph_harm_y

from commander_tpu.sphere import healpix, sht


def rand_alm(rng, lmax, lmin=0):
    nl = lmax + 1
    a = rng.standard_normal((nl, nl)) + 1j * rng.standard_normal((nl, nl))
    for l in range(nl):
        a[l, l + 1:] = 0
    a[:, 0] = a[:, 0].real
    a[:lmin] = 0
    return a


def alm_dot(a, b):
    eps = np.ones(a.shape[-1])
    eps[1:] = 2.0
    return np.sum(eps[None, :] * np.real(a * np.conj(b)))


def goldberg_sYlm(s, l, m, theta, phi):
    pref = (-1.0) ** m * np.sqrt(
        factorial(l + m) * factorial(l - m) * (2 * l + 1)
        / (4 * np.pi * factorial(l + s) * factorial(l - s)))
    sh, ch = np.sin(theta / 2), np.cos(theta / 2)
    tot = np.zeros_like(theta)
    for r in range(0, l - s + 1):
        if not (0 <= r + s - m <= l + s):
            continue
        tot = tot + comb(l - s, r) * comb(l + s, r + s - m) \
            * (-1.0) ** (l - r - s) * (ch / sh) ** (2 * r + s - m)
    return pref * sh ** (2 * l) * tot * np.exp(1j * m * phi)


def test_alm2map_vs_bruteforce():
    nside, lmax = 8, 16
    plan = sht.get_plan(nside, lmax)
    alm = rand_alm(np.random.default_rng(0), lmax)
    m = np.asarray(sht.alm2map(plan, jnp.asarray(alm)))
    theta, phi = healpix.pix2ang_ring(nside)
    f = np.zeros(len(theta))
    for l in range(lmax + 1):
        for mm in range(0, l + 1):
            Y = sph_harm_y(l, mm, theta, phi)
            f += alm[l, 0].real * Y.real if mm == 0 else 2 * np.real(alm[l, mm] * Y)
    assert np.abs(m - f).max() < 1e-10


def test_alm2map_batched():
    nside, lmax = 8, 12
    plan = sht.get_plan(nside, lmax)
    rng = np.random.default_rng(1)
    alms = np.stack([rand_alm(rng, lmax) for _ in range(3)]).reshape(3, 1, lmax + 1, lmax + 1)
    maps = np.asarray(sht.alm2map(plan, jnp.asarray(alms)))
    assert maps.shape == (3, 1, healpix.npix_of(nside))
    for i in range(3):
        single = np.asarray(sht.alm2map(plan, jnp.asarray(alms[i, 0])))
        np.testing.assert_allclose(maps[i, 0], single, atol=1e-12)


def test_adjointness_spin0():
    nside, lmax = 8, 16
    plan = sht.get_plan(nside, lmax)
    rng = np.random.default_rng(2)
    alm = rand_alm(rng, lmax)
    f = rng.standard_normal(healpix.npix_of(nside))
    Ya = np.asarray(sht.alm2map(plan, jnp.asarray(alm)))
    Ytf = np.asarray(sht.alm2map_adjoint(plan, jnp.asarray(f)))
    assert abs(np.dot(Ya, f) - alm_dot(alm, Ytf)) < 1e-9


@pytest.mark.parametrize("nside,lmax,tol", [(16, 8, 1e-4), (16, 16, 5e-3), (8, 8, 2e-2)])
def test_map2alm_roundtrip(nside, lmax, tol):
    plan = sht.get_plan(nside, lmax)
    alm = rand_alm(np.random.default_rng(3), lmax)
    m = sht.alm2map(plan, jnp.asarray(alm))
    rec = np.asarray(sht.map2alm(plan, m))
    tri = np.tril(np.ones((lmax + 1, lmax + 1), dtype=bool))
    assert np.abs((rec - alm)[tri]).max() < tol


def test_spin2_vs_bruteforce():
    nside, lmax = 8, 8
    plan = sht.get_plan(nside, lmax, spin2=True)
    rng = np.random.default_rng(4)
    aE, aB = rand_alm(rng, lmax, lmin=2), rand_alm(rng, lmax, lmin=2)
    Q, U = sht.alm2map_spin2(plan, jnp.asarray(aE), jnp.asarray(aB))
    Q, U = np.asarray(Q), np.asarray(U)
    theta, phi = healpix.pix2ang_ring(nside)
    P = np.zeros(len(theta), dtype=complex)
    for l in range(2, lmax + 1):
        for m in range(-l, l + 1):
            if m >= 0:
                aEm, aBm = aE[l, m], aB[l, m]
            else:
                aEm, aBm = (-1) ** m * np.conj(aE[l, -m]), (-1) ** m * np.conj(aB[l, -m])
            P += -(aEm + 1j * aBm) * goldberg_sYlm(2, l, m, theta, phi)
    assert np.abs(Q - P.real).max() < 1e-10
    assert np.abs(U - P.imag).max() < 1e-10


def test_adjointness_spin2():
    nside, lmax = 8, 10
    plan = sht.get_plan(nside, lmax, spin2=True)
    rng = np.random.default_rng(5)
    aE, aB = rand_alm(rng, lmax, lmin=2), rand_alm(rng, lmax, lmin=2)
    Q, U = sht.alm2map_spin2(plan, jnp.asarray(aE), jnp.asarray(aB))
    Qf = rng.standard_normal(Q.shape)
    Uf = rng.standard_normal(U.shape)
    Eh, Bh = sht.alm2map_spin2_adjoint(plan, jnp.asarray(Qf), jnp.asarray(Uf))
    lhs = np.dot(np.asarray(Q), Qf) + np.dot(np.asarray(U), Uf)
    rhs = alm_dot(aE, np.asarray(Eh)) + alm_dot(aB, np.asarray(Bh))
    assert abs(lhs - rhs) < 1e-9


def test_spin2_roundtrip():
    nside, lmax = 8, 6
    plan = sht.get_plan(nside, lmax, spin2=True)
    rng = np.random.default_rng(6)
    aE, aB = rand_alm(rng, lmax, lmin=2), rand_alm(rng, lmax, lmin=2)
    Q, U = sht.alm2map_spin2(plan, jnp.asarray(aE), jnp.asarray(aB))
    rE, rB = sht.map2alm_spin2(plan, Q, U)
    tri = np.tril(np.ones((lmax + 1, lmax + 1), dtype=bool))
    tri[:2] = False
    assert np.abs((np.asarray(rE) - aE)[tri]).max() < 1e-2
    assert np.abs((np.asarray(rB) - aB)[tri]).max() < 1e-2


def test_parseval_power():
    # sum_p f_p^2 * Omega_pix  ~=  sum_lm eps_m |a_lm|^2 for band-limited f
    nside, lmax = 16, 8
    plan = sht.get_plan(nside, lmax)
    alm = rand_alm(np.random.default_rng(7), lmax)
    m = np.asarray(sht.alm2map(plan, jnp.asarray(alm)))
    lhs = np.sum(m**2) * 4 * np.pi / healpix.npix_of(nside)
    rhs = alm_dot(alm, alm)
    assert abs(lhs - rhs) / rhs < 1e-3


def test_map2alm_iter_improves_accuracy():
    nside, lmax = 16, 24
    plan = sht.get_plan(nside, lmax)
    alm = rand_alm(np.random.default_rng(11), lmax)
    m = sht.alm2map(plan, jnp.asarray(alm))
    tri = np.tril(np.ones((lmax + 1, lmax + 1), dtype=bool))
    err0 = np.abs((np.asarray(sht.map2alm(plan, m)) - alm)[tri]).max()
    err3 = np.abs((np.asarray(sht.map2alm_iter(plan, m, 3)) - alm)[tri]).max()
    assert err3 < 0.05 * err0, (err0, err3)


def test_smooth_map_reduces_power():
    nside, lmax = 16, 24
    plan = sht.get_plan(nside, lmax)
    rng = np.random.default_rng(12)
    m = jnp.asarray(rng.standard_normal(healpix.npix_of(nside)))
    sm = sht.smooth_map(plan, m, 600.0)
    assert float(jnp.var(sm)) < 0.5 * float(jnp.var(m))


def test_flop_count_scaling():
    """FLOP introspection (libsharp opcnt parity): positive, stage-split,
    and scaling ~nside^3 for the Legendre stage."""
    from commander_tpu.sphere import sht
    p1 = sht.get_plan(8, 16)
    p2 = sht.get_plan(16, 32)
    c1 = sht.flop_count(p1)
    c2 = sht.flop_count(p2)
    assert c1["total"] > 0 and c1["legendre"] > 0 and c1["ring_fft"] > 0
    # Legendre ~ nh * nl * nm: x2 nside -> x8
    assert 6.0 < c2["legendre"] / c1["legendre"] < 10.0
    assert sht.flop_count(p1, spin2=True)["legendre"] == \
        2 * c1["legendre"]


def test_table_size_guard():
    """>2^31-byte Legendre tables are refused (TPU runtime miscompute,
    BASELINE.md round 3); tables=None auto-routes big plans through OTF."""
    import pytest as _pt
    from commander_tpu.sphere import sht as _sht
    p = _sht.get_plan(512, 1024, dtype="float32")
    assert p.lam0 is None and p.otf0 is not None
    with _pt.raises(ValueError):
        _sht.get_plan(512, 1024, dtype="float32", tables=True)
    p2 = _sht.get_plan(16, 32)
    assert p2.lam0 is not None
