"""Beam-convolved (4pi) orbital dipole vs the pencil-beam limit.

Reference: compute_orbital_dipole_4pi / compute_4pi_product
(comm_tod_orbdipole_mod.f90:190-288). With all beam power at the boresight
(z axis of the beam frame) the 4pi template must reduce to the pencil-beam
dipole (without the b^2/3 monopole subtraction the pencil variant adds).
"""
import numpy as np
import jax.numpy as jnp

from commander_tpu.sphere import healpix
from commander_tpu.tod.model import (C_LIGHT, T_CMB, _euler_zyz,
                                     beam_moments_orbdipole,
                                     orbital_dipole_4pi)


def test_euler_zyz_rotates_z_to_direction():
    """R(phi_z=psi, theta_y, phi_z2=phi) applied with (-psi,-theta,-phi)
    maps v to the beam frame; its z-component is v . n(theta, phi)."""
    rng = np.random.default_rng(0)
    for _ in range(10):
        th, ph, ps = rng.uniform(0, np.pi), rng.uniform(0, 2 * np.pi), \
            rng.uniform(0, 2 * np.pi)
        v = rng.normal(size=3)
        R = np.asarray(_euler_zyz(jnp.asarray(-ps), jnp.asarray(-th),
                                  jnp.asarray(-ph)))
        n = np.array([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                      np.cos(th)])
        assert np.isclose((R @ v)[2], v @ n, atol=1e-12)
        # orthonormality
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)


def test_4pi_reduces_to_pencil_for_delta_beam():
    nside = 8
    npix = 12 * nside * nside
    rng = np.random.default_rng(1)
    th, ph = healpix.pix2ang_ring(nside)
    pvec = healpix.pix2vec_ring(nside)

    # delta beam at the north-most pixel of a FINE grid (closest to z; the
    # residual tilt is the beam-pixel offset, ~0.5 deg at nside 64)
    nside_b = 64
    pvec_b = healpix.pix2vec_ring(nside_b)
    beam = np.zeros(12 * nside_b * nside_b)
    beam[int(np.argmax(pvec_b[:, 2]))] = 1.0
    moments = beam_moments_orbdipole(jnp.asarray(beam), jnp.asarray(pvec_b))

    Ns, Nd, Nt = 2, 1, 64
    pix = rng.integers(0, npix, (Ns, Nd, Nt))
    psi = rng.uniform(0, 2 * np.pi, (Ns, Nd, Nt))
    vsun = rng.normal(0, 3e4, (Ns, 3))
    nu = 30e9

    s4 = np.asarray(orbital_dipole_4pi(
        jnp.asarray(vsun), jnp.asarray(th), jnp.asarray(ph),
        jnp.asarray(psi), jnp.asarray(pix), moments, nu))

    # pencil with the same beam center: since the beam delta sits slightly
    # off z, rotate its offset out by using the boresight pixel's direction
    beta = vsun / C_LIGHT
    # direction of the BEAM PIXEL rotated to each sample's pointing:
    # R(psi,theta,phi) z_beam ~ n(theta,phi) for z_beam ~ z
    n = pvec[pix]
    bd = np.einsum("sk,sdtk->sdt", beta, n)
    x = 6.62607015e-34 * nu / (1.380649e-23 * T_CMB)
    q = x * (np.exp(x) + 1) / (2 * np.expm1(x))
    pencil = (T_CMB * 1e6) * (bd + q * bd**2)
    # beam pixel is within one pixel radius of z: agreement to the pixel
    # scale (~7 deg at nside 8 -> percent-level on the dipole)
    resid = np.abs(s4 - pencil)
    scale = np.abs(pencil).max()
    assert resid.max() / scale < 0.15
    # correlation essentially 1
    assert np.corrcoef(s4.ravel(), pencil.ravel())[0, 1] > 0.995


def test_4pi_moments_of_symmetric_beam():
    """An azimuthally symmetric beam has S1 along z and diagonal S2 with
    S2_xx = S2_yy."""
    nside = 16
    pvec = healpix.pix2vec_ring(nside)
    fwhm = np.radians(10.0)
    sig = fwhm / np.sqrt(8 * np.log(2))
    b = np.exp(-0.5 * (np.arccos(np.clip(pvec[:, 2], -1, 1)) / sig) ** 2)
    S1, S2, B0 = beam_moments_orbdipole(jnp.asarray(b), jnp.asarray(pvec))
    S1, S2 = np.asarray(S1), np.asarray(S2)
    assert abs(S1[0]) < 1e-10 * B0 and abs(S1[1]) < 1e-10 * B0
    assert S1[2] > 0.9 * float(B0)
    assert np.isclose(S2[0, 0], S2[1, 1], rtol=1e-6)
    assert abs(S2[0, 1]) < 1e-10 * float(B0)
