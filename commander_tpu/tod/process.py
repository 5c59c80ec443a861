"""The per-band TOD Gibbs step: gain -> n_corr -> PSD -> binned maps.

TPU-native counterpart of process_LFI_tod (comm_tod_LFI_mod.f90:297-1137)
reduced to its statistical core (sidelobes/zodi/bandpass hooks land with
their subsystems):

  per Gibbs iteration, given the current sky model at this band:
    1. project sky + orbital dipole to TOD domain         (:401-418, :618)
    2. per-scan gain GLS + smoothing + absolute calib     (:688-742, :931-943)
    3. correlated-noise Wiener draw n_corr                (:744-748)
    4. noise PSD (sigma0, alpha, fknee)                   (:750)
    5. per-scan chi^2 accept flags                        (compute_chisq)
    6. bin calibrated TOD -> map + rms + fluctuation      (:882-886, :1006)

Everything is one jitted function over the TodBlock pytree; scans are a
batch axis (shardable across devices, P4 of SURVEY §2.11).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..sphere import healpix
from . import model as M


@dataclasses.dataclass(frozen=True)
class TodConfig:
    nside: int
    nu: float
    pol: bool = False
    gain_smooth_window: int = 5
    alpha_grid: tuple = tuple(np.linspace(-2.5, -0.5, 32).tolist())
    fknee_grid: tuple = tuple(np.geomspace(0.01, 2.0, 32).tolist())
    # generous by default: the per-scan chi^2 runs hot during the first
    # Gibbs iterations while (sigma0, n_corr) burn in; the reference's
    # accept flags likewise only drop catastrophic scans.
    chisq_reject_sigma: float = 25.0
    # exact Sherman-Morrison/Woodbury n_corr solve on the gaps instead of
    # the mean-fill approximation (the reference's get_ncorr_sm_cg path,
    # comm_tod_noise_mod.f90:308); costs n_iter extra FFT pairs per pass
    ncorr_exact: bool = False
    ncorr_cg_iter: int = 15


def process_tod(cfg: TodConfig, block: M.TodBlock, state: M.TodState,
                sky_maps: jnp.ndarray, pix_vec: jnp.ndarray, key):
    """One TOD Gibbs pass. Returns (new TodState, products dict).

    sky_maps: (nmaps, npix) current sky model at this band (uK).
    products: binned map/rms/fluct maps + chisq diagnostics.
    """
    npix = 12 * cfg.nside * cfg.nside
    k_g, k_n, k_p, k_b, k_a = jax.random.split(key, 5)

    s_sky = M.project_sky(sky_maps, block.pix, block.psi, cfg.pol)
    s_orb = M.orbital_dipole(block.vsun, pix_vec, cfg.nu, block.pix)
    s_ref = s_sky + s_orb

    # --- gain: per-scan GLS on n_corr-subtracted data, then smoothing ----
    d_for_gain = block.tod - state.n_corr
    gain_raw = M.sample_gain_perscan(k_g, d_for_gain, s_ref, block.mask,
                                     state.sigma0)
    gain = M.smooth_gain(gain_raw, cfg.gain_smooth_window)

    # absolute calibration from the orbital dipole. The reference splits
    # g = g_abs + delta_g (sample_abscal_from_orbital); the smoothed
    # per-scan fit already carries the mean, so g_abs is a diagnostic here.
    resid_orb = d_for_gain - gain[..., None] * s_sky
    g_abs = M.sample_abscal(k_a, resid_orb, s_orb, block.mask, state.sigma0)

    # --- noise PSD first (order differs from the reference because our
    # synthetic runs have no archive scalars to warm-start from):
    # sigma0 from sample differences of the full residual — the difference
    # operator suppresses the 1/f part, so this is ncorr-free; (alpha,
    # fknee) from the residual periodogram whose model includes both the
    # white and correlated parts.
    resid = block.tod - gain[..., None] * s_ref
    sigma0, alpha, fknee = M.sample_noise_psd(
        k_p, resid, block.mask, block.fsamp,
        jnp.asarray(cfg.alpha_grid, resid.dtype),
        jnp.asarray(cfg.fknee_grid, resid.dtype))

    # --- correlated noise with the fresh PSD -----------------------------
    if cfg.ncorr_exact:
        n_corr = M.sample_ncorr_sm(k_n, resid, block.mask, sigma0, alpha,
                                   fknee, block.fsamp,
                                   n_iter=cfg.ncorr_cg_iter)
    else:
        n_corr = M.sample_ncorr(k_n, resid, block.mask, sigma0, alpha,
                                fknee, block.fsamp)
    wn_resid = resid - n_corr

    # --- per-scan chi^2 and accept flags --------------------------------
    chi2 = jnp.sum(wn_resid**2 * block.mask, -1) / jnp.maximum(sigma0**2, 1e-30)
    ndof = jnp.sum(block.mask, -1)
    z = (chi2 - ndof) / jnp.sqrt(2.0 * jnp.maximum(ndof, 1.0))
    accept = (jnp.abs(z) < cfg.chisq_reject_sigma).astype(resid.dtype)

    # --- mapmaking on calibrated, n_corr-subtracted data -----------------
    calib = (block.tod - n_corr) / jnp.maximum(gain[..., None], 1e-30) \
        - s_orb
    inv_var = accept * jnp.square(gain) / jnp.maximum(sigma0**2, 1e-30)
    A, b = M.bin_tod(calib, block.pix, block.psi,
                     block.mask, inv_var, npix, cfg.pol)
    m, rms, fluct = M.finalize_binned_map(k_b, A, b)

    new_state = M.TodState(gain=gain, sigma0=sigma0, alpha=alpha,
                           fknee=fknee, n_corr=n_corr)
    products = dict(map=m, rms=rms, fluct=fluct, chi2=chi2, ndof=ndof,
                    accept=accept, g_abs=g_abs, gain_raw=gain_raw)
    return new_state, products


def tod_chisq(cfg: TodConfig, block: M.TodBlock, state: M.TodState,
              sky_maps: jnp.ndarray, pix_vec: jnp.ndarray):
    """TOD chi^2 of a candidate sky model under the current TOD state.

    The per-proposal chi^2 that drives the reference's bandpass MH
    (process_LFI_tod evaluates s_sky for each of ndelta bandpass proposals
    and compute_chisq accumulates per scan; comm_tod_LFI_mod.f90:401-418 +
    comm_tod_mod compute_chisq). One jitted reduction over (scan, det, t).
    """
    s_sky = M.project_sky(sky_maps, block.pix, block.psi, cfg.pol)
    s_orb = M.orbital_dipole(block.vsun, pix_vec, cfg.nu, block.pix)
    resid = block.tod - state.n_corr \
        - state.gain[..., None] * (s_sky + s_orb)
    return jnp.sum(resid ** 2 * block.mask
                   / jnp.maximum(state.sigma0[..., None] ** 2, 1e-30))


def init_tod_state(block: M.TodBlock, sigma0_guess=1.0) -> M.TodState:
    Ns, Nd, Nt = block.tod.shape
    dt = block.tod.dtype
    d = block.tod[..., 1:] - block.tod[..., :-1]
    m2 = block.mask[..., 1:] * block.mask[..., :-1]
    var = jnp.sum(d**2 * m2, -1) / jnp.maximum(jnp.sum(m2, -1), 1.0) / 2.0
    return M.TodState(
        gain=jnp.ones((Ns, Nd), dt),
        sigma0=jnp.sqrt(jnp.maximum(var, 1e-30)),
        alpha=jnp.full((Ns, Nd), -1.0, dt),
        fknee=jnp.full((Ns, Nd), 0.1, dt),
        n_corr=jnp.zeros((Ns, Nd, Nt), dt),
    )
