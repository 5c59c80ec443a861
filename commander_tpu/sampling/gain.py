"""Map-level calibration (gain) sampling per band.

TPU-native counterpart of ``comm_gain_mod.f90`` (sample_gain :29-172).
The reference's flow, reproduced here per band:

  * hard prior (BAND_GAIN_PRIOR_RMS < 0, :47-57): the gain is pinned to
    the prior mean and only re-randomized as mean + N(0,1)*|rms| every
    NUMITER_RESAMPLE_HARD_GAIN_PRIORS iterations;
  * calibration signal (:65-87): the sum of the components selected by
    BAND_GAIN_CALIB_COMP ('all' = every component), divided by the
    current gain (unit-gain template);
  * ell-range cross-spectrum estimator (BAND_GAIN_LMIN/LMAX > 0,
    :91-121): mask both the signal template and (residual + signal) with
    the calibration mask, take YtW of both, and set the gain to the mean
    of C_ell^{sig,res} / C_ell^{sig,sig} over [lmin, lmax] (TT) — a
    deterministic estimator, no fluctuation;
  * pixel-space GLS (:123-156): mu = <res, N^-1 sig> / <sig, N^-1 sig>,
    sigma = <sig, N^-1 sig>^{-1/2}; draw (or take the mean in optimize
    mode) and clamp the move to +-MAX_DELTA_G = 0.01 of the old gain.

A Gaussian (soft) prior with rms > 0 is folded into the GLS normal
equations as an extension (the reference parses BAND_GAIN_PRIOR_MEAN/RMS
but its likelihood path ignores the soft case; combining conjugate terms
is the statistically consistent reading of those keys).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_DELTA_G = 0.01  # comm_gain_mod.f90:39


def sample_gain(key, d, s, inv_rms2, prior_mean=None, prior_std=None):
    """Draw per-band gains jointly. d, s, inv_rms2: (B, S, P) -> (B,).

    Batched GLS form kept for the multires driver and tests; the
    full-featured per-band path is sample_gain_band below."""
    num = jnp.sum(s * d * inv_rms2, axis=(-1, -2))
    den = jnp.sum(s * s * inv_rms2, axis=(-1, -2))
    if prior_mean is not None and prior_std is not None:
        num = num + prior_mean / prior_std**2
        den = den + 1.0 / prior_std**2
    mean = num / jnp.maximum(den, 1e-300)
    std = 1.0 / jnp.sqrt(jnp.maximum(den, 1e-300))
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    return mean + std * eps


def cross_sigma_ell(a1, a2, lmax):
    """Empirical cross power sigma_l = 1/(2l+1) sum_m eps_m Re(a1 a2*)
    for rectangular alms (..., lmax+1, mmax+1) -> (..., lmax+1).
    Reference: getCrossSigmaL (comm_map_mod.f90:1353-1383)."""
    nm = a1.shape[-1]
    eps = jnp.concatenate([jnp.ones((1,), a1.real.dtype),
                           2.0 * jnp.ones((nm - 1,), a1.real.dtype)])
    power = jnp.sum(eps * (a1 * jnp.conj(a2)).real, axis=-1)
    ell = jnp.arange(lmax + 1, dtype=power.dtype)
    return power / (2.0 * ell + 1.0)


def estimate_gain_cross_cl(plan, sig, res, lmin, lmax, mask=None):
    """ell-range cross-spectrum gain estimator for ONE band.

    sig, res: (S, P) maps (unit-gain calibration signal; residual+signal).
    Returns the scalar gain = mean_{l in [lmin,lmax]} sigma_l^{sig,res} /
    sigma_l^{sig,sig} over the TT spectrum (comm_gain_mod.f90:99-108).
    """
    from ..model.cl import sigma_ell
    from ..sphere import sht

    if mask is not None:
        sig = sig * mask
        res = res * mask
    a_s = sht.map2alm(plan, sig[None])[0]   # (S, nl, nm)
    a_r = sht.map2alm(plan, res[None])[0]
    cls_ss = sigma_ell(a_s, plan.lmax)[0]          # TT
    cls_sr = cross_sigma_ell(a_s[0], a_r[0], plan.lmax)
    lo = jnp.maximum(lmin, 0)
    sel = (jnp.arange(plan.lmax + 1) >= lo) \
        & (jnp.arange(plan.lmax + 1) <= lmax)
    ratio = jnp.where(sel, cls_sr / jnp.maximum(jnp.abs(cls_ss), 1e-300)
                      * jnp.sign(cls_ss), 0.0)
    return jnp.sum(ratio) / jnp.maximum(jnp.sum(sel), 1)


def sample_gain_gls(key, res, sig, inv_rms2, old_gain, mask=None,
                    prior_mean=None, prior_rms=0.0, optimize=False,
                    max_delta_g=MAX_DELTA_G):
    """Pixel-space GLS gain draw for ONE band (comm_gain_mod.f90:123-156).

    res: residual + old_gain*sig (data with other components removed);
    sig: unit-gain calibration signal; both (S, P). Returns scalar gain,
    clamped to +- max_delta_g of old_gain like the reference."""
    w = inv_rms2 if mask is None else inv_rms2 * mask
    den = jnp.sum(sig * sig * w)
    num = jnp.sum(res * sig * w)
    if prior_mean is not None and prior_rms and prior_rms > 0:
        num = num + prior_mean / prior_rms**2
        den = den + 1.0 / prior_rms**2
    mu = num / jnp.maximum(den, 1e-300)
    sd = 1.0 / jnp.sqrt(jnp.maximum(den, 1e-300))
    g = mu if optimize else mu + sd * jax.random.normal(key, (), mu.dtype)
    return jnp.clip(g, old_gain - max_delta_g, old_gain + max_delta_g)
