"""Map-level calibration (gain) sampling per band.

TPU-native counterpart of ``comm_gain_mod.f90`` (sample_gain :29-172): the
conditional for band gain g_b given the sky model s_b and data d_b with
noise N_b is Gaussian,
    g_b | d, s ~ N( <s, N^-1 d> / <s, N^-1 s>,  1 / <s, N^-1 s> )
optionally combined with a Gaussian prior (g0, sigma_g) and restricted to a
masked/ell-filtered subset (the reference cross-correlates within an ell
range; we accept a premultiplied 'template' signal map for that).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_gain(key, d, s, inv_rms2, prior_mean=None, prior_std=None):
    """Draw per-band gains. d, s, inv_rms2: (B, S, P). Returns (B,)."""
    num = jnp.sum(s * d * inv_rms2, axis=(-1, -2))
    den = jnp.sum(s * s * inv_rms2, axis=(-1, -2))
    if prior_mean is not None and prior_std is not None:
        num = num + prior_mean / prior_std**2
        den = den + 1.0 / prior_std**2
    mean = num / jnp.maximum(den, 1e-300)
    std = 1.0 / jnp.sqrt(jnp.maximum(den, 1e-300))
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    return mean + std * eps
