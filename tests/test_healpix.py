"""HEALPix geometry unit tests (no healpy: invariants + analytic checks)."""
import numpy as np
import pytest

from commander_tpu.sphere import healpix as hp


@pytest.mark.parametrize("nside", [1, 2, 8, 16])
def test_ring_geometry_invariants(nside):
    g = hp.ring_geometry(nside)
    assert g.nphi.sum() == g.npix
    assert g.nring == 4 * nside - 1
    # z strictly decreasing north -> south, symmetric about equator
    assert np.all(np.diff(g.z) < 0)
    np.testing.assert_allclose(g.z, -g.z[::-1], atol=1e-14)
    np.testing.assert_allclose(g.z[2 * nside - 1], 0.0, atol=1e-14)
    # offsets consistent
    assert g.offset[0] == 0
    np.testing.assert_array_equal(np.diff(g.offset), g.nphi[:-1])
    # pixel solid-angle sanity: mean z weighted by nphi integrates to 0
    assert abs(np.sum(g.z * g.nphi)) < 1e-9


def test_pix2ang_nside1():
    # nside=1: 12 pixels; first 4 at z=2/3, phis pi/4,3pi/4,...; middle 4 at z=0
    theta, phi = hp.pix2ang_ring(1)
    np.testing.assert_allclose(np.cos(theta[:4]), 2.0 / 3, atol=1e-14)
    np.testing.assert_allclose(phi[:4], [np.pi / 4, 3 * np.pi / 4, 5 * np.pi / 4, 7 * np.pi / 4])
    np.testing.assert_allclose(np.cos(theta[4:8]), 0.0, atol=1e-14)
    np.testing.assert_allclose(phi[4:8], [0, np.pi / 2, np.pi, 3 * np.pi / 2], atol=1e-14)
    np.testing.assert_allclose(np.cos(theta[8:]), -2.0 / 3, atol=1e-14)


@pytest.mark.parametrize("nside", [1, 2, 4, 16])
def test_ring_nest_bijection(nside):
    r2n = hp.ring2nest_table(nside)
    n2r = hp.nest2ring_table(nside)
    npix = hp.npix_of(nside)
    assert sorted(r2n) == list(range(npix))
    np.testing.assert_array_equal(n2r[r2n], np.arange(npix))
    np.testing.assert_array_equal(r2n[n2r], np.arange(npix))


def test_ring_nest_preserves_position():
    # NEST reindexing must preserve pixel angles: pixel p (ring) == r2n[p] (nest)
    # We verify via round-trip of a map payload rather than angles (pure perm).
    nside = 8
    r2n = hp.ring2nest_table(nside)
    # known anchor: in both orderings the north-pole-adjacent face pixels are
    # the last pixels of face 0..3 in NEST = first ring in RING.
    # first RING pixel (ring 0, j=0) lives on face 0 at (x,y)=(nside-1,nside-1)
    assert r2n[0] == nside * nside - 1


@pytest.mark.parametrize("nin,nout", [(8, 4), (8, 2), (4, 8)])
def test_udgrade_indices(nin, nout):
    idx = hp.udgrade_indices(nin, nout)
    if nout < nin:
        assert idx.shape == (hp.npix_of(nout), (nin // nout) ** 2)
        # every input pixel appears exactly once (partition)
        assert sorted(idx.ravel()) == list(range(hp.npix_of(nin)))
        # degrade of a constant map is constant; degrade preserves mean
        m = np.random.default_rng(0).standard_normal(hp.npix_of(nin))
        deg = m[idx].mean(axis=1)
        np.testing.assert_allclose(deg.mean(), m.mean(), atol=1e-12)
    else:
        assert idx.shape == (hp.npix_of(nout),)
        # every parent appears ratio times
        counts = np.bincount(idx, minlength=hp.npix_of(nin))
        assert np.all(counts == (nout // nin) ** 2)


def test_ring_weights_quadrature():
    nside = 16
    w = hp.ring_weights(nside)
    g = hp.ring_geometry(nside)
    # integrates P_0 to 4pi and kills P_l for even l <= 2 nside
    V = np.polynomial.legendre.legvander(g.z, 40)
    integ = (w * g.nphi) @ V
    assert abs(integ[0] - 4 * np.pi) < 1e-10
    assert np.abs(integ[2:2 * nside:2]).max() < 1e-8
    # weights close to the naive area weight (largest deviations at the poles)
    np.testing.assert_allclose(w, 4 * np.pi / g.npix, rtol=0.08)
