"""Synthetic TOD generator: scanning strategy + signal + 1/f noise.

Test/validation harness standing in for real LFI/WMAP archives (the role
the reference's tutorial TOD files play). Produces TodBlock + ground truth
so the TOD Gibbs steps can be validated statistically — the oracle the
reference never had (SURVEY.md §4).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..sphere import healpix
from .model import TodBlock, orbital_dipole, project_sky


def great_circle_scans(nside: int, nscan: int, ndet: int, ntod: int,
                       fsamp: float = 10.0, seed: int = 0):
    """Precessing great-circle pointing covering the sky.

    Returns pix (Ns,Nd,Nt) int32 and psi (Ns,Nd,Nt)."""
    rng = np.random.default_rng(seed)
    t = np.arange(ntod) / ntod * 2.0 * np.pi * 3.0   # 3 revolutions per scan
    pix = np.zeros((nscan, ndet, ntod), np.int32)
    psi = np.zeros((nscan, ndet, ntod))
    theta_pix, phi_pix = healpix.pix2ang_ring(nside)
    vecs = healpix.pix2vec_ring(nside)
    from scipy.spatial import cKDTree
    tree = cKDTree(vecs)
    for s in range(nscan):
        # scan plane orientation precesses with scan index + jitter
        phi0 = 2.0 * np.pi * s / nscan + rng.uniform(0, 0.1)
        # golden-ratio tilt ladder up to polar orbits: the old 7-tilt
        # family capped |z| at sin(0.9) ~ 0.78, leaving the polar caps
        # permanently unobserved (partial-coverage CG pathology)
        tilt = 0.25 + (np.pi / 2 - 0.25) * ((s * 0.6180339887) % 1.0)
        for d in range(ndet):
            off = 0.05 * d
            x = np.stack([
                np.cos(t + off) * np.cos(phi0) - np.sin(t + off) * np.sin(phi0) * np.cos(tilt),
                np.cos(t + off) * np.sin(phi0) + np.sin(t + off) * np.cos(phi0) * np.cos(tilt),
                np.sin(t + off) * np.sin(tilt)], axis=-1)
            # transverse dither (~0.6 deg): widens each scan ring so the
            # strategy actually covers the sphere at high nside instead
            # of sampling 1-pixel-wide curves (a 20%-coverage map leaves
            # 80% of the CG system prior-only — the round-5 conditioning
            # spiral)
            x = x + rng.normal(scale=0.01, size=x.shape)
            x /= np.linalg.norm(x, axis=-1, keepdims=True)
            _, idx = tree.query(x)
            pix[s, d] = idx
            # polarization-angle rate 2/3 rad per scan radian: a pixel
            # revisited on the next revolution (dt = 2pi) sees psi
            # advance by 4pi/3 = pi/3 (mod pi), so even single-ring
            # pixels accumulate 3 distinct angles and the 3x3 IQU
            # normal matrix is invertible. The old rate 0.5 advanced
            # psi by exactly pi = 0 (mod pi) per revolution — every
            # revisit at the SAME angle — and the mapmaking condition
            # check then rejected ~all pixels not crossed by a second
            # scan (6% pol coverage at nside 16, worse at high nside).
            psi[s, d] = (t * (2.0 / 3.0) + 0.7 * d + 0.2 * s) % np.pi
    return pix, psi


def simulate_tod(nside: int, sky_maps: np.ndarray, nscan=8, ndet=2,
                 ntod=4096, fsamp=10.0, gain0=1.0, sigma0=0.1,
                 alpha=-1.5, fknee=0.3, nu=30e9, pol=False, seed=0):
    """Simulate a TodBlock from given sky maps.

    Returns (TodBlock, truth dict)."""
    rng = np.random.default_rng(seed + 1)
    pix, psi = great_circle_scans(nside, nscan, ndet, ntod, fsamp, seed)
    vsun = rng.standard_normal((nscan, 3)) * 1e4 + np.array([0, 3e4, 0])
    pvec = healpix.pix2vec_ring(nside)

    s_sky = np.asarray(project_sky(jnp.asarray(sky_maps), jnp.asarray(pix),
                                   jnp.asarray(psi), pol))
    s_orb = np.asarray(orbital_dipole(jnp.asarray(vsun), jnp.asarray(pvec),
                                      nu, jnp.asarray(pix)))

    # 1/f + white noise via FFT shaping
    freqs = np.fft.rfftfreq(ntod, 1.0 / fsamp)
    S = np.zeros_like(freqs)
    S[1:] = (freqs[1:] / fknee) ** alpha
    wn = rng.standard_normal((nscan, ndet, ntod))
    nf = np.fft.rfft(rng.standard_normal((nscan, ndet, ntod)), axis=-1)
    ncorr = np.fft.irfft(nf * np.sqrt(S), n=ntod, axis=-1) * sigma0
    tod = gain0 * (s_sky + s_orb) + ncorr + sigma0 * wn

    mask = np.ones((nscan, ndet, ntod))
    mask[:, :, :8] = 0.0       # mimic flagged edges
    block = TodBlock(tod=jnp.asarray(tod), pix=jnp.asarray(pix),
                     psi=jnp.asarray(psi), mask=jnp.asarray(mask),
                     vsun=jnp.asarray(vsun), fsamp=fsamp)
    truth = dict(gain=gain0, sigma0=sigma0, alpha=alpha, fknee=fknee,
                 ncorr=ncorr, s_sky=s_sky, s_orb=s_orb)
    return block, truth
