"""Pixel-space noise models: diagonal RMS (white) and QU-covariance noise.

TPU-native counterpart of the reference noise classes (``comm_N_mod.f90``
abstract interface: invN / N / sqrtInvN / rms, comm_N_mod.f90:29-50;
``comm_N_rms_mod.f90`` diagonal implementation; ``comm_N_QUcov_mod.f90``
2x2 QU block implementation). Noise objects are simple pytrees of device
arrays; all ops are elementwise multiplies, so they fuse into surrounding
kernels under jit.

Masking follows the reference: masked pixels carry invN = 0 (infinite
noise), implemented by zeroing rather than inf to stay NaN-free in jit.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiagonalNoise:
    """White noise with per-pixel rms, per Stokes component.

    rms: (nmaps, npix); entries <= 0 or non-finite mean 'masked'.
    mask: (nmaps, npix) 0/1 float (1 = use pixel).
    Reference: comm_N_rms (comm_N_rms_mod.f90:30, invN at :264-332).
    """
    rms: jnp.ndarray
    mask: jnp.ndarray

    @staticmethod
    def create(rms, mask=None, reg_noise: float = 0.0):
        rms = jnp.asarray(rms)
        good = jnp.isfinite(rms) & (rms > 0)
        if mask is not None:
            good = good & (jnp.asarray(mask) > 0.5)
        if reg_noise > 0.0:
            rms = jnp.sqrt(rms**2 + reg_noise**2)
        safe = jnp.where(good, rms, 1.0)
        return DiagonalNoise(rms=safe, mask=good.astype(rms.dtype))

    def invN(self, m):
        """N^-1 m (zero on masked pixels)."""
        return m * self.mask / jnp.square(self.rms)

    def sqrt_invN(self, m):
        """N^-1/2 m."""
        return m * self.mask / self.rms

    def N(self, m):
        return m * self.mask * jnp.square(self.rms)

    def rms_map(self):
        return jnp.where(self.mask > 0, self.rms, 0.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QUCovNoise:
    """WMAP-style per-pixel 2x2 QU covariance + diagonal T noise.

    rms_T: (npix,) temperature rms; cov_QU: (npix, 2, 2) covariance blocks.
    Reference: comm_N_QUcov (comm_N_QUcov_mod.f90:30).
    """
    rms_T: jnp.ndarray
    inv_QU: jnp.ndarray       # (npix, 2, 2) inverse covariance
    sqrt_inv_QU: jnp.ndarray  # (npix, 2, 2) cholesky of inverse
    mask: jnp.ndarray         # (3, npix)

    @staticmethod
    def create(rms_T, cov_QU, mask=None):
        rms_T = jnp.asarray(rms_T)
        cov_QU = jnp.asarray(cov_QU)
        npix = rms_T.shape[-1]
        if mask is None:
            mask = jnp.ones((3, npix), rms_T.dtype)
        inv = jnp.linalg.inv(cov_QU)
        chol = jnp.linalg.cholesky(inv)
        return QUCovNoise(rms_T=rms_T, inv_QU=inv,
                          sqrt_inv_QU=jnp.swapaxes(chol, -1, -2), mask=mask)

    def invN(self, m):
        """m: (3, npix) -> N^-1 m with 2x2 coupling in QU."""
        t = m[0] * self.mask[0] / jnp.square(self.rms_T)
        qu = jnp.einsum("pij,jp->ip", self.inv_QU, m[1:] * self.mask[1:])
        return jnp.concatenate([t[None], qu * self.mask[1:]], axis=0)

    def sqrt_invN(self, m):
        t = m[0] * self.mask[0] / self.rms_T
        qu = jnp.einsum("pij,jp->ip", self.sqrt_inv_QU, m[1:] * self.mask[1:])
        return jnp.concatenate([t[None], qu * self.mask[1:]], axis=0)
