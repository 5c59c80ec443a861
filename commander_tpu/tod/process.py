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
    # TOD-level per-detector monopole sampling (sample_mono,
    # comm_tod_mapmaking_mod.f90:300): bin with det-monopole columns and
    # run the zero-mean MH over the marginalized quadratic form
    sample_mono: bool = False
    mono_nstep: int = 1000
    mono_sigma_prop: float = 0.03


def static_signal(cfg: TodConfig, block: M.TodBlock, pix_vec,
                  sl_fmaps=None, s_extra=None, mono=None, sl_pix=None):
    """Orbital dipole + sidelobe + zodi + per-det monopole — the signal
    terms that do NOT come from the sky model map (the per-scan template
    sum of comm_tod_LFI_mod.f90:618-663). (Ns, Nd, Nt)."""
    s_stat = M.orbital_dipole(block.vsun, pix_vec, cfg.nu, block.pix)
    if sl_fmaps is not None:
        from .conviqt import conviqt_interp
        p_sl = block.pix if sl_pix is None else sl_pix
        s_stat = s_stat + jax.vmap(conviqt_interp, in_axes=(0, 1, 1),
                                   out_axes=1)(sl_fmaps, p_sl, block.psi)
    if s_extra is not None:
        s_stat = s_stat + s_extra
    if mono is not None:
        s_stat = s_stat + mono[None, :, None]
    return s_stat


def process_tod(cfg: TodConfig, block: M.TodBlock, state: M.TodState,
                sky_maps: jnp.ndarray, pix_vec: jnp.ndarray, key,
                sl_fmaps: jnp.ndarray | None = None,
                s_extra: jnp.ndarray | None = None,
                mono: jnp.ndarray | None = None,
                sl_pix: jnp.ndarray | None = None):
    """One TOD Gibbs pass. Returns (new TodState, products dict).

    sky_maps: (nmaps, npix) current sky model at this band (uK).
    sl_fmaps: optional per-det conviqt tables (Nd, M+1, 2, npix_sl) — the
        sidelobe term of the per-scan signal sum
        (comm_tod_LFI_mod.f90:633-646; construct_sl_template).
    s_extra: optional fixed additive per-sample signal (Ns, Nd, Nt) — the
        zodi template slot (compute_zodi_template, :626-631).
    mono: optional per-det monopole amplitudes (Nd,) added as the
        monopole correction template (:650-658).
    sl_pix: optional (Ns, Nd, Nt) pixel indices at the sidelobe-table
        resolution (the reference's ind2sl degrade, comm_tod_mod.f90:312);
        defaults to block.pix.
    products: binned map/rms/fluct maps + chisq diagnostics.
    """
    npix = 12 * cfg.nside * cfg.nside
    k_g, k_n, k_p, k_b, k_a, k_r, k_w = jax.random.split(key, 7)

    s_sky = M.project_sky(sky_maps, block.pix, block.psi, cfg.pol)
    s_orb = M.orbital_dipole(block.vsun, pix_vec, cfg.nu, block.pix)
    s_stat = s_orb       # templates NOT part of the sky model map
    if sl_fmaps is not None:
        # per-det sidelobe: gather + azimuthal Fourier sum at this
        # pointing (conviqt interp); vmap over the det axis
        from .conviqt import conviqt_interp
        p_sl = block.pix if sl_pix is None else sl_pix
        s_sl = jax.vmap(conviqt_interp, in_axes=(0, 1, 1), out_axes=1)(
            sl_fmaps, p_sl, block.psi)
        s_stat = s_stat + s_sl
    if s_extra is not None:
        s_stat = s_stat + s_extra
    if mono is not None:
        s_stat = s_stat + mono[None, :, None]
    s_ref = s_sky + s_stat                               # full s_tot

    # --- gain: g = g0 + Delta g_det + delta g_scan (the reference's
    # gain0(0) + gain0(det) + dgain decomposition,
    # comm_tod_gain_mod.f90:534-625 + sample_smooth_gain :143-453) -------
    d_for_gain = block.tod - state.n_corr
    gain_raw = M.sample_gain_perscan(k_g, d_for_gain, s_ref, block.mask,
                                     state.sigma0)
    # absolute calibration from the orbital dipole on the sky-subtracted
    # residual (sample_abscal_from_orbital)
    resid_orb = d_for_gain - gain_raw[..., None] * (s_ref - s_orb)
    g_abs = M.sample_abscal(k_a, resid_orb, s_orb, block.mask, state.sigma0)
    # per-det relative offsets, zero-sum constrained (sample_relcal)
    resid_rel = d_for_gain - g_abs * s_ref
    dg_det = M.sample_relcal(k_r, resid_rel, s_ref, block.mask, state.sigma0)
    # Wiener-smoothed per-scan deviations around g0 + Delta g
    # (sample_smooth_gain)
    w_g = jnp.sum(s_ref * s_ref * block.mask, -1) \
        / jnp.maximum(state.sigma0 ** 2, 1e-30)
    sigma_g = 1.0 / jnp.sqrt(jnp.maximum(w_g, 1e-30))
    dev = gain_raw - g_abs - dg_det[None, :]
    sm = M.smooth_gain_wiener(k_w, dev, sigma_g)
    dev_s = sm - jnp.mean(sm, axis=0, keepdims=True)
    gain = g_abs + dg_det[None, :] + dev_s

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

    # --- mapmaking on calibrated, n_corr-subtracted data (all static
    # templates — orbital dipole, sidelobe, zodi, monopole — removed) -----
    n_for_map = n_corr
    if cfg.sample_mono:
        # the n_corr Wiener filter passes the per-scan DC through (the
        # reference's dv(0) likewise, comm_tod_noise_mod.f90:157-158),
        # which would swallow the det monopoles; remove the per-(scan,det)
        # mean so the DC information reaches the mono columns instead
        n_dc = jnp.sum(n_corr * block.mask, -1, keepdims=True) \
            / jnp.maximum(jnp.sum(block.mask, -1, keepdims=True), 1.0)
        n_for_map = n_corr - n_dc
    calib = (block.tod - n_for_map) / jnp.maximum(gain[..., None], 1e-30) \
        - s_stat
    inv_var = accept * jnp.square(gain) / jnp.maximum(sigma0**2, 1e-30)
    mono_new = mono
    if cfg.sample_mono:
        # bin WITHOUT the mono subtraction — the per-det monopole columns
        # of the extended system absorb it, and sample_mono draws the
        # TOTAL mono vector (warm-started at the current one); the Stokes
        # rhs is then corrected by the sampled monopoles before the pixel
        # solves (the reference adds the old correction to the output map,
        # comm_tod_mapmaking_mod.f90:344-356)
        calib_m = calib if mono is None else calib + mono[None, :, None]
        kst = 3 if cfg.pol else 1
        A_ext, b_ext = M.bin_tod_mono(calib_m, block.pix, block.psi,
                                      block.mask, inv_var, npix, cfg.pol)
        A = A_ext[:, :kst, :kst]
        k_b, k_m = jax.random.split(k_b)
        mono_new, _ = M.sample_mono(k_m, A_ext, b_ext, kst,
                                    nstep=cfg.mono_nstep,
                                    sigma_prop=cfg.mono_sigma_prop,
                                    mono0=mono)
        b_m = b_ext[:, :kst] - jnp.einsum("pkd,d->pk", A_ext[:, :kst, kst:],
                                          mono_new)
        # repack to the component-plane layout of bin_tod/finalize
        A = M.pack_sym3(A) if kst == 3 else A[:, 0, 0][None]
        b = b_m.T
    else:
        A, b = M.bin_tod(calib, block.pix, block.psi,
                         block.mask, inv_var, npix, cfg.pol)
    m, rms, fluct = M.finalize_binned_map(k_b, A, b)

    new_state = M.TodState(gain=gain, sigma0=sigma0, alpha=alpha,
                           fknee=fknee, n_corr=n_corr)
    products = dict(map=m, rms=rms, fluct=fluct, chi2=chi2, ndof=ndof,
                    accept=accept, g_abs=g_abs, gain_raw=gain_raw,
                    dg_det=dg_det)
    if cfg.sample_mono:
        products["mono"] = mono_new
    return new_state, products


def tod_chisq(cfg: TodConfig, block: M.TodBlock, state: M.TodState,
              sky_maps: jnp.ndarray, pix_vec: jnp.ndarray,
              sl_fmaps: jnp.ndarray | None = None,
              s_extra: jnp.ndarray | None = None,
              mono: jnp.ndarray | None = None,
              sl_pix: jnp.ndarray | None = None,
              per_det: bool = False):
    """TOD chi^2 of a candidate sky model under the current TOD state.

    The per-proposal chi^2 that drives the reference's bandpass MH
    (process_LFI_tod evaluates s_sky for each of ndelta bandpass proposals
    and compute_chisq accumulates per scan; comm_tod_LFI_mod.f90:401-418 +
    comm_tod_mod compute_chisq). One jitted reduction over (scan, det, t);
    per_det=True returns the (Nd,) per-detector split the reference's
    ndelta per-det proposal flow accepts against (commander.f90:299-335).
    """
    s_sky = M.project_sky(sky_maps, block.pix, block.psi, cfg.pol)
    s_tot = s_sky + M.orbital_dipole(block.vsun, pix_vec, cfg.nu, block.pix)
    if sl_fmaps is not None:
        from .conviqt import conviqt_interp
        p_sl = block.pix if sl_pix is None else sl_pix
        s_tot = s_tot + jax.vmap(conviqt_interp, in_axes=(0, 1, 1),
                                 out_axes=1)(sl_fmaps, p_sl, block.psi)
    if s_extra is not None:
        s_tot = s_tot + s_extra
    if mono is not None:
        s_tot = s_tot + mono[None, :, None]
    resid = block.tod - state.n_corr - state.gain[..., None] * s_tot
    c2 = resid ** 2 * block.mask \
        / jnp.maximum(state.sigma0[..., None] ** 2, 1e-30)
    if per_det:
        return jnp.sum(c2, axis=(0, 2))
    return jnp.sum(c2)


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
