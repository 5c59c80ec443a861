"""Beam model: azimuthally-symmetric harmonic beams (b_ell) + pixel window.

TPU-native counterpart of ``comm_B_mod.f90`` / ``comm_B_bl_mod.f90``: the
beam is a per-ell (and per-Stokes) transfer function applied as an
elementwise multiply in alm space (``matmulB``, comm_B_bl_mod.f90:108).
FEBeCoP per-source templates and 4pi sidelobe convolution live with the
point-source and TOD layers respectively (SURVEY.md §2.4).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def gaussian_bl(fwhm_arcmin: float, lmax: int, pol: bool = False) -> np.ndarray:
    """Gaussian b_ell; with pol=True returns (lmax+1, 3) [T, E, B] including
    the polarization factor exp(sigma^2 * s^2 /2 ... ) (HEALPix convention:
    pol rows multiply by exp(sigma^2 * (s^2)/2) with s=2 -> factor
    exp(2 sigma^2) relative suppression difference).
    """
    sigma = np.deg2rad(fwhm_arcmin / 60.0) / np.sqrt(8.0 * np.log(2.0))
    ell = np.arange(lmax + 1)
    g = np.exp(-0.5 * ell * (ell + 1) * sigma**2)
    if not pol:
        return g
    pol_fac = np.exp(2.0 * sigma**2)  # spin-2 correction exp(s^2 sigma^2 /2)
    return np.stack([g, g * pol_fac, g * pol_fac], axis=-1)


@functools.lru_cache(maxsize=None)
def pixel_window(nside: int, lmax: int) -> np.ndarray:
    """HEALPix pixel window w_ell.

    The reference loads the HEALPix pixel_window FITS files (external
    inputs); here the table is computed exactly for nside <= 128
    (pixel_window_exact) and by self-similar rescaling of the exact
    nside-128 table in l/nside for larger grids (the HEALPix window is
    close to a universal function of l/nside; rescaling error <1% at
    l <= 2 nside)."""
    if nside <= 128:
        return pixel_window_exact(nside, lmax)
    base_n, base_lmax = 128, 383
    w128 = pixel_window_exact(base_n, base_lmax)
    ell = np.arange(lmax + 1, dtype=np.float64)
    x = ell * base_n / nside
    return np.interp(x, np.arange(base_lmax + 1, dtype=np.float64), w128)


def _pixwin_cache_path(nside: int, lmax: int, ratio: int) -> str:
    import os
    d = os.path.join(os.path.expanduser("~"), ".cache", "commander_tpu")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"pixwin_n{nside}_l{lmax}_r{ratio}.npy")


@functools.lru_cache(maxsize=None)
def pixel_window_exact(nside: int, lmax: int, ratio: int = 8) -> np.ndarray:
    """Exact HEALPix pixel window w_ell by sub-pixel quadrature.

    The quadrature costs minutes of host CPU (it dominated the round-4
    tutorial-scale init); the result is a pure function of
    (nside, lmax, ratio), so it is DISK-cached under
    ~/.cache/commander_tpu and computed at most once per machine.

    The reference reads the HEALPix pixel_window_n????.fits tables
    (external data); here the table is COMPUTED from the definition
        w_l^2 = 4pi / (npix (2l+1)) sum_{m,p} |<Y_lm>_p|^2,
    <Y_lm>_p = pixel average of Y_lm, evaluated by midpoint quadrature
    over the pixel's ratio^2 children at nside*ratio (relative error
    O((l/(nside ratio))^2), ~1e-3 at l = 3 nside with the default ratio).
    Only one azimuthal QUADRANT of each ring is computed — HEALPix has
    exact 4-fold symmetry, so pixels j and j + nphi/4 are congruent and
    |<Y_lm>|^2 is invariant under the rotation.
    """
    import os

    from ..sphere import healpix
    from ..sphere.wigner import wigner_d_table_fast

    # precomputed tables ship as package data (instrument/data); the
    # user cache covers other (nside, lmax, ratio) combinations
    pkg = os.path.join(os.path.dirname(__file__), "data",
                       f"pixwin_n{nside}_l{lmax}_r{ratio}.npy")
    cpath = _pixwin_cache_path(nside, lmax, ratio)
    for cand in (pkg, cpath):
        if os.path.exists(cand):
            w = np.load(cand)
            if w.shape == (lmax + 1,):
                return w

    g = healpix.ring_geometry(nside)
    nside_hi = nside * ratio
    fac = ratio * ratio
    r2n = healpix.ring2nest_table(nside)
    n2r = healpix.nest2ring_table(nside_hi)
    th_hi, ph_hi = healpix.pix2ang_ring(nside_hi)
    eps = np.concatenate([[1.0], 2.0 * np.ones(lmax)])
    m = np.arange(lmax + 1)
    acc = np.zeros(lmax + 1)
    for ring in range(g.nring):
        nq = max(int(g.nphi[ring]) // 4, 1)
        p_lo = g.offset[ring] + np.arange(nq)
        child = r2n[p_lo][:, None] * fac + np.arange(fac)[None, :]
        cr = n2r[child]                         # (nq, fac) hi-res RING pix
        th, ph = th_hi[cr], ph_hi[cr]
        uth, tidx = np.unique(th, return_inverse=True)
        tidx = tidx.reshape(th.shape)
        # lambda_lm(theta) = sqrt((2l+1)/4pi) d^l_{m0}(theta); the sqrt
        # factor is applied in the final normalization
        d = wigner_d_table_fast(lmax, lmax, 0,
                                np.cos(uth / 2.0), np.sin(uth / 2.0))
        phase = np.exp(1j * m[None, None, :] * ph[..., None])  # (nq,fac,nm)
        P = np.zeros((nq, len(uth), lmax + 1), np.complex128)
        np.add.at(P, (np.arange(nq)[:, None].repeat(fac, 1), tidx), phase)
        # sum_p |sum_t d_t P_pt|^2 = sum_{t,t'} d_t d_t' G_tt' with the
        # small Gram matrix G(t,t',m) = sum_p P conj(P) — O(nuth^2)
        # instead of O(nq x nuth) per (l, m): ~30x fewer flops (this
        # quadrature dominated the round-4 init at 1691 s)
        G = np.einsum("ptm,pum->tum", P, np.conj(P)).real
        acc += 4.0 * np.einsum("m,tlm,ulm,tum->l", eps, d, d, G,
                               optimize=True) / (fac * fac)
    # |<Y>|^2 = (2l+1)/4pi |A|^2; w^2 = 4pi/(npix(2l+1)) sum -> sum/npix
    w = np.sqrt(np.maximum(acc / g.npix, 0.0))
    try:
        np.save(cpath, w)
    except OSError:
        pass
    return w


def apply_bl(alm: jnp.ndarray, bl: jnp.ndarray) -> jnp.ndarray:
    """Multiply alm[..., l, m] by per-ell transfer bl[l] (or bl[l, nmaps] with
    a leading Stokes axis on alm). Reference: matmulB / deconv
    (comm_B_bl_mod.f90:108-160)."""
    if bl.ndim == 1:
        return alm * bl[:, None]
    # bl (lmax+1, nmaps), alm (..., nmaps, lmax+1, mmax+1)
    return alm * jnp.swapaxes(bl, 0, 1)[..., :, None]
