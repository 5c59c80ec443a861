"""Conviqt sidelobe convolver vs brute-force Wigner-D rotation sum."""
import numpy as np
import jax.numpy as jnp
from math import factorial

from commander_tpu.sphere import healpix, sht
from commander_tpu.tod.conviqt import (conviqt_interp, conviqt_precompute,
                                       conviqt_tables)


def wigner_d_exact(l, m, mp, theta):
    c, s = np.cos(theta / 2), np.sin(theta / 2)
    pref = np.sqrt(float(factorial(l + m) * factorial(l - m)
                         * factorial(l + mp) * factorial(l - mp)))
    tot = np.zeros_like(np.asarray(theta, float))
    for k in range(max(0, mp - m), min(l + mp, l - m) + 1):
        den = float(factorial(l + mp - k) * factorial(k)
                    * factorial(m - mp + k) * factorial(l - m - k))
        tot = tot + (-1.0) ** (m - mp + k) * c ** (2 * l + mp - m - 2 * k) \
            * s ** (m - mp + 2 * k) / den
    return pref * tot


def full_alm(rng, lmax):
    a = rng.standard_normal((lmax + 1, lmax + 1)) \
        + 1j * rng.standard_normal((lmax + 1, lmax + 1))
    for l in range(lmax + 1):
        a[l, l + 1:] = 0
    a[:, 0] = a[:, 0].real
    return a


def neg_m(a, l, m):
    """a_{l,m} for any sign of m given the m>=0 array (real field)."""
    if m >= 0:
        return a[l, m]
    return (-1) ** m * np.conj(a[l, -m])


def test_conviqt_vs_bruteforce():
    nside, lmax, M = 8, 6, 2
    rng = np.random.default_rng(0)
    alm = full_alm(rng, lmax)
    blm = full_alm(rng, lmax)            # beam b_{l m'}, m' >= 0 columns
    blm_modes = blm[:, :M + 1].copy()

    plan = sht.get_plan(nside, lmax)
    tables = conviqt_tables(nside, lmax, M)
    fmaps = conviqt_precompute(plan, tables, jnp.asarray(alm),
                               jnp.asarray(blm_modes))

    # evaluate at a handful of pointings
    theta, phi = healpix.pix2ang_ring(nside)
    test_pix = np.array([3, 100, 400, 700], np.int32)
    test_psi = np.array([0.0, 0.7, 2.1, 4.5])
    s = np.asarray(conviqt_interp(fmaps, jnp.asarray(test_pix),
                                  jnp.asarray(test_psi)))

    for i, (p, ps) in enumerate(zip(test_pix, test_psi)):
        th, ph = theta[p], phi[p]
        tot = 0.0
        for l in range(lmax + 1):
            for m in range(-l, l + 1):
                for mp in range(-min(l, M), min(l, M) + 1):
                    a = neg_m(alm, l, m)
                    b = neg_m(blm_modes if abs(mp) <= M else None, l, mp) \
                        if abs(mp) <= M else 0.0
                    d = wigner_d_exact(l, m, mp, th)
                    tot += np.real(a * np.conj(b) * d
                                   * np.exp(1j * (m * ph + mp * ps)))
        assert abs(s[i] - tot) < 1e-8, (i, s[i], tot)
