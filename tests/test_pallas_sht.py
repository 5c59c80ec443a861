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
