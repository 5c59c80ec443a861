"""Pallas fused Legendre-synthesis kernel vs the XLA OTF reference."""
import jax.numpy as jnp
import numpy as np
import pytest

from commander_tpu.sphere.pallas_sht import synth_legendre_pallas
from commander_tpu.sphere.sht_otf import legendre_otf, synth_legendre_otf


@pytest.mark.parametrize("nside,lmax", [(16, 40), (8, 16)])
def test_pallas_synth_matches_otf(nside, lmax):
    otf = legendre_otf(nside, lmax, 0, dtype="float32", chunk=16)
    rng = np.random.default_rng(0)
    nl = lmax + 1
    alm = (rng.standard_normal((nl, nl))
           + 1j * rng.standard_normal((nl, nl))).astype(np.complex64)
    for l in range(nl):
        alm[l, l + 1:] = 0
    Fn_ref, Fs_ref = synth_legendre_otf(otf, None, jnp.asarray(alm), 2 * nside)
    Fn_p, Fs_p = synth_legendre_pallas(otf, jnp.asarray(alm), 2 * nside,
                                       block_h=32, block_m=64, interpret=True)
    scale = np.abs(np.asarray(Fn_ref)).max()
    assert np.abs(np.asarray(Fn_p) - np.asarray(Fn_ref)).max() < 1e-5 * scale
    assert np.abs(np.asarray(Fs_p) - np.asarray(Fs_ref)).max() < 1e-5 * scale


@pytest.mark.parametrize("nside,lmax", [(16, 40), (8, 16)])
def test_pallas_adjoint_matches_otf(nside, lmax):
    from commander_tpu.sphere.pallas_sht import adjoint_legendre_pallas
    from commander_tpu.sphere.sht_otf import adjoint_legendre_otf
    otf = legendre_otf(nside, lmax, 0, dtype="float32", chunk=16)
    rng = np.random.default_rng(1)
    nh = 2 * nside
    nm = lmax + 1
    Fn = (rng.standard_normal((nh, nm))
          + 1j * rng.standard_normal((nh, nm))).astype(np.complex64)
    Fs = (rng.standard_normal((nh, nm))
          + 1j * rng.standard_normal((nh, nm))).astype(np.complex64)
    a_ref = adjoint_legendre_otf(otf, jnp.asarray(Fn), jnp.asarray(Fs))
    a_p = adjoint_legendre_pallas(otf, jnp.asarray(Fn), jnp.asarray(Fs),
                                  block_h=32, block_m=64, interpret=True)
    scale = np.abs(np.asarray(a_ref)).max()
    assert np.abs(np.asarray(a_p) - np.asarray(a_ref)).max() < 1e-5 * scale


def test_pallas_spin2_synthesis_via_mp():
    """Spin-2 synthesis = two mp=+-2 recurrences through the same kernel
    (synth_spin2_otf structure); check the mp=+2 branch against the OTF."""
    nside, lmax = 8, 16
    otf_p = legendre_otf(nside, lmax, 2, dtype="float32", chunk=16)
    rng = np.random.default_rng(2)
    nl = lmax + 1
    alm = (rng.standard_normal((nl, nl))
           + 1j * rng.standard_normal((nl, nl))).astype(np.complex64)
    for l in range(nl):
        alm[l, l + 1:] = 0
    alm[:2] = 0
    Fn_ref, Fs_ref = synth_legendre_otf(otf_p, None, jnp.asarray(alm),
                                        2 * nside)
    Fn_p, Fs_p = synth_legendre_pallas(otf_p, jnp.asarray(alm), 2 * nside,
                                       block_h=32, block_m=64,
                                       interpret=True)
    scale = np.abs(np.asarray(Fn_ref)).max()
    assert np.abs(np.asarray(Fn_p) - np.asarray(Fn_ref)).max() < 1e-5 * scale
    assert np.abs(np.asarray(Fs_p) - np.asarray(Fs_ref)).max() < 1e-5 * scale


def test_pallas_full_transforms_match_otf():
    """alm2map/map2alm on the Pallas Legendre stage == the XLA OTF path."""
    from commander_tpu.sphere import sht
    from commander_tpu.sphere.pallas_sht import (adjoint_legendre_pallas,
                                                 alm2map_pallas,
                                                 map2alm_pallas)
    from commander_tpu.sphere.sht_otf import alm2map_otf, map2alm_otf
    nside, lmax = 8, 16
    plan = sht.get_plan(nside, lmax, dtype="float32")
    otf = legendre_otf(nside, lmax, 0, dtype="float32", chunk=16)
    rng = np.random.default_rng(3)
    nl = lmax + 1
    alm = (rng.standard_normal((nl, nl))
           + 1j * rng.standard_normal((nl, nl))).astype(np.complex64)
    alm[:, 0] = alm[:, 0].real
    for l in range(nl):
        alm[l, l + 1:] = 0
    m_ref = np.asarray(alm2map_otf(plan, otf, jnp.asarray(alm)))
    m_p = np.asarray(alm2map_pallas(plan, otf, jnp.asarray(alm),
                                    block_h=32, block_m=64, interpret=True))
    assert np.abs(m_p - m_ref).max() < 1e-4 * np.abs(m_ref).max()
    a_ref = np.asarray(map2alm_otf(plan, otf, jnp.asarray(m_ref)))
    a_p = np.asarray(map2alm_pallas(plan, otf, jnp.asarray(m_ref),
                                    block_h=32, block_m=64, interpret=True))
    assert np.abs(a_p - a_ref).max() < 1e-4 * np.abs(a_ref).max()


def test_pallas_backend_dispatch_through_plan():
    """tables=False + legendre_backend='pallas' plans route sht.alm2map /
    sht.map2alm through the fused kernels (interpret on CPU), matching the
    table-based transforms, incl. batched inputs."""
    from commander_tpu.sphere import sht
    nside, lmax = 8, 16
    plan_t = sht.get_plan(nside, lmax, dtype="float32")
    plan_p = sht.get_plan(nside, lmax, dtype="float32", tables=False,
                          legendre_backend="pallas")
    assert plan_p.otf0.backend == "pallas"
    rng = np.random.default_rng(4)
    nl = lmax + 1
    alm = (rng.standard_normal((2, nl, nl))
           + 1j * rng.standard_normal((2, nl, nl))).astype(np.complex64)
    alm[..., 0] = alm[..., 0].real
    for l in range(nl):
        alm[:, l, l + 1:] = 0
    m_ref = np.asarray(sht.alm2map(plan_t, jnp.asarray(alm)))
    m_p = np.asarray(sht.alm2map(plan_p, jnp.asarray(alm)))
    assert np.abs(m_p - m_ref).max() < 1e-4 * np.abs(m_ref).max()
    a_ref = np.asarray(sht.map2alm(plan_t, jnp.asarray(m_ref)))
    a_p = np.asarray(sht.map2alm(plan_p, jnp.asarray(m_ref)))
    assert np.abs(a_p - a_ref).max() < 1e-4 * np.abs(a_ref).max()


def test_traced_pack_matches_host():
    """_coeff_pack_traced (in-jit, no giant HLO constants) reconstructs
    the same recurrence data as the host _coeff_pack (value-level: the
    (mantissa, exponent) decompositions may differ by one block)."""
    import numpy as np
    from commander_tpu.sphere import sht_otf
    from commander_tpu.sphere import pallas_sht as P
    otf = sht_otf.legendre_otf(16, 47, 0, "float32", backend="pallas")
    host = P._coeff_pack(16, 47, 0, 47, 16, 128, 8)
    traced = P._coeff_pack_traced(otf, 16, 128, 8)
    P0 = sht_otf._SCALE_POW
    vh = np.asarray(host[0], np.float64) \
        * 2.0 ** (np.asarray(host[1], np.float64) * P0)
    vt = np.asarray(traced[0], np.float64) \
        * 2.0 ** (np.asarray(traced[1], np.float64) * P0)
    assert np.max(np.abs(vh - vt)) < 1e-6 * np.max(np.abs(vh))
    for idx in (2, 3, 4, 5):
        h = np.asarray(host[idx], np.float64)
        t = np.asarray(traced[idx], np.float64)
        assert np.max(np.abs(h - t)) < 2e-6 * max(np.max(np.abs(h)), 1e-30)
