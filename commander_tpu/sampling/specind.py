"""Nonlinear (spectral-index) sampling: vectorized inversion sampler + MH.

TPU-native counterpart of the reference's spectral-index machinery:
  * driver           sample_nonlin_params      (comm_nonlin_mod.f90:92-193)
  * per-pixel        sampleDiffuseSpecIndSinglePix_nonlin (:1347)
  * fullsky          sampleDiffuseSpecIndFullsky_nonlin   (:1707)
  * pixel regions    sampleDiffuseSpecIndPixReg_nonlin    (:2160)
  * 1-D sampler      InvSamp_mod.f90 (grid + CDF inversion)

Design: the reference's serial per-pixel InvSamp loops become ONE dense
evaluation of lnL over (pixel x grid) followed by a batched CDF inversion —
the whole nonlinear step is a couple of big elementwise tensors, ideal VPU
work. lnL types follow comm_diffuse_comp_mod.f90:60
{chisq, ridge, marginal, prior}; ridge/marginal marginalize the component
amplitude analytically per pixel (comp_lnL_marginal_diagonal,
comm_diffuse_comp_mod.f90:4522-4567) and 'prior' draws from the prior alone.

The conditional for one component c with per-pixel parameter theta_p:
  lnL(theta_p) = -1/2 sum_b invN_bp (r_bp - F_b(theta_p) a_p)^2 + ln pi(theta_p)
where r is the residual with component c's signal INCLUDED (data minus all
other components), a_p the component amplitude map, F_b the band-integrated
SED. Pixels are conditionally independent given amplitudes — exactly why the
reference samples them pixel-by-pixel; we sample them all at once.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..instrument.bandpass import Bandpass
from ..model.mixing import DiffuseComponent, mixing_element


@dataclasses.dataclass(frozen=True)
class SpecIndConfig:
    """Sampling config for one spectral parameter (reference: per-parameter
    prior/range columns of the COMP_ keys, comm_param_mod)."""
    grid_min: float
    grid_max: float
    ngrid: int = 96
    prior_mean: Optional[float] = None
    prior_std: Optional[float] = None
    # {chisq, ridge, marginal, prior} — COMP_*_INT_LNLTYPE
    # (comm_param_mod.f90:809-810; comm_diffuse_comp_mod.f90:60)
    lnl_type: str = "chisq"

    def grid(self, dtype=jnp.float64):
        return jnp.linspace(self.grid_min, self.grid_max, self.ngrid, dtype=dtype)


def _lnprior(cfg: SpecIndConfig, grid):
    if cfg.prior_mean is None or cfg.prior_std is None:
        return jnp.zeros_like(grid)
    return -0.5 * jnp.square((grid - cfg.prior_mean) / cfg.prior_std)


def _grid_lnL_pixel(comp: DiffuseComponent, bps: Sequence[Bandpass], cfg,
                    res, amp_pix, inv_rms2, theta_other, which: int,
                    amp_band=None):
    """lnL on the grid for every pixel: (P, G).

    res: (B, S, P) residual incl. this comp; amp_pix: (S, P) comp amplitude
    map; inv_rms2: (B, S, P); theta_other: full theta tuple (the sampled
    slot `which` is replaced by grid values).

    amp_band (optional): (B, S, P) PER-BAND amplitude maps — the
    component projected through each band's beam, Y(b_l a) — for
    beam-consistent evaluation (the reference removes beam mismatch by
    smoothing everything to a common beam, comm_nonlin_mod.f90:977-995
    res_smooth; modelling the component THROUGH the band beam is the
    equivalent exact form for the chisq lnL). The chisq path uses
    amp_band directly; ridge/marginal scale their band templates by the
    beamed/common shape ratio (reducing to the reference form when all
    beams agree).
    """
    grid = cfg.grid(res.dtype)
    P, G = res.shape[-1], grid.shape[0]

    # other-theta slots may be map-valued (per-pixel thetas already drawn
    # for another parameter): broadcast maps as (P,1) against the (1,G) grid
    def _other(t):
        t = jnp.asarray(t)
        return t[:, None] if t.ndim > 0 else t

    lnl_type = getattr(cfg, "lnl_type", "chisq") or "chisq"
    if lnl_type == "prior":
        # draw from the (range-truncated) prior alone
        # (comm_diffuse_comp_mod.f90:551 'prior' lnLtype)
        return jnp.broadcast_to(_lnprior(cfg, grid)[None, :], (P, G))

    Fg = []
    for bp in bps:
        th = tuple(grid[None, :] if i == which else _other(t)
                   for i, t in enumerate(theta_other))
        Fg.append(jnp.broadcast_to(mixing_element(comp, bp, th), (P, G)))
    Fg = jnp.stack(Fg)                                   # (B, P, G)
    if lnl_type in ("ridge", "marginal") and amp_band is not None:
        # beam-consistent template: scale each band's mixing column by
        # the beamed/common amplitude shape ratio (1 where beams agree)
        ratio = jnp.where(jnp.abs(amp_pix[None, 0]) > 1e-30,
                          amp_band[:, 0] / jnp.where(
                              jnp.abs(amp_pix[None, 0]) > 1e-30,
                              amp_pix[None, 0], 1.0), 1.0)   # (B, P)
        Fg = Fg * ratio[..., None]
    if lnl_type in ("ridge", "marginal"):
        # amplitude-marginalized pixel likelihood over the flattened
        # (band, Stokes) axis with diagonal noise
        # (comp_lnL_marginal_diagonal, comm_diffuse_comp_mod.f90:4522-4567):
        #   MNd = M^T N^-1 d,  MNM = M^T N^-1 M,
        #   lnL = 1/2 MNd^2 / MNM  [+ 1/2 log MNM if marginal — the
        #   reference's use_det term, -1/2 log(MNM^-1) after its 1x1 invert]
        # d is the residual INCLUDING this component (amplitude is
        # marginalized, comm_diffuse_comp_mod.f90:3270-3281).
        MNd = jnp.einsum("bpg,bsp,bsp->pg", Fg, inv_rms2, res)
        MNM = jnp.einsum("bpg,bsp,bpg->pg", Fg, inv_rms2, Fg)
        lnl = jnp.where(MNM > 0, 0.5 * MNd * MNd / jnp.maximum(MNM, 1e-300),
                        0.0)
        if lnl_type == "marginal":
            lnl = lnl + jnp.where(MNM > 0,
                                  0.5 * jnp.log(jnp.maximum(MNM, 1e-300)),
                                  0.0)
    else:
        # model_bspg = F_bpg * a_{(b)sp} ; chi2 over b,s — amp_band
        # carries the per-band beamed amplitude when beams differ
        r = res[..., None]                               # (B,S,P,1)
        if amp_band is not None:
            model = Fg[:, None, :, :] * amp_band[..., None]
        else:
            model = Fg[:, None, :, :] * amp_pix[None, :, :, None]
        lnl = -0.5 * jnp.sum(inv_rms2[..., None] * jnp.square(r - model),
                             axis=(0, 1))
    return lnl + _lnprior(cfg, grid)[None, :]            # (P, G)


def _cdf_invert(key, lnl, grid):
    """Batched inversion sampling along the last axis of lnl (..., G).

    Mirrors InvSamp_mod.f90:15 sample_InvSamp: normalize lnL, build the CDF
    by trapezoid weights, invert a uniform draw by linear interpolation.
    """
    lnl = lnl - jnp.max(lnl, axis=-1, keepdims=True)
    p = jnp.exp(lnl)
    dx = grid[1] - grid[0]
    # trapezoid cumulative: c_i = sum_{j<i} (p_j + p_{j+1})/2
    mid = 0.5 * (p[..., 1:] + p[..., :-1])
    cdf = jnp.cumsum(mid, axis=-1) * dx
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
    tot = cdf[..., -1:]
    cdf = cdf / jnp.maximum(tot, 1e-300)
    u = jax.random.uniform(key, lnl.shape[:-1] + (1,), lnl.dtype)
    # find first index with cdf >= u, interpolate linearly
    idx = jnp.sum((cdf < u).astype(jnp.int32), axis=-1) - 1
    idx = jnp.clip(idx, 0, grid.shape[0] - 2)
    c0 = jnp.take_along_axis(cdf, idx[..., None], axis=-1)[..., 0]
    c1 = jnp.take_along_axis(cdf, idx[..., None] + 1, axis=-1)[..., 0]
    frac = (u[..., 0] - c0) / jnp.maximum(c1 - c0, 1e-300)
    return grid[idx] + jnp.clip(frac, 0.0, 1.0) * dx


def sample_specind_pixel(key, comp: DiffuseComponent, bps, cfg: SpecIndConfig,
                         res, amp_pix, inv_rms2, theta_other, which: int = 0,
                         amp_band=None):
    """Per-pixel draw of one spectral parameter: returns (P,) theta map.

    Reference: sampleDiffuseSpecIndSinglePix_nonlin (comm_nonlin_mod:1347)
    with lnL_type='chisq' (+ optional Gaussian prior). amp_band: see
    _grid_lnL_pixel (beam-consistent per-band amplitude maps).
    """
    lnl = _grid_lnL_pixel(comp, bps, cfg, res, amp_pix, inv_rms2,
                          theta_other, which, amp_band=amp_band)
    return _cdf_invert(key, lnl, cfg.grid(res.dtype))


def _grid_lnL_total(comp, bps, cfg: SpecIndConfig, res, amp_pix,
                    inv_rms2, theta_other, which: int, amp_band=None):
    """Pixel-summed lnL on the grid: (G,), via lax.map over grid points.

    Equivalent to _grid_lnL_pixel(...).sum(axis=0) but never materializes
    the (B, P, G) intermediates — at nside 1024 with G=64 those are
    ~10 GB and exhausted the accelerator in the tutorial-scale driver
    run; one grid point at a time costs only (B, S, P) temporaries."""
    grid = cfg.grid(res.dtype)
    lnl_type = getattr(cfg, "lnl_type", "chisq") or "chisq"
    P = res.shape[-1]
    if lnl_type == "prior":
        return _lnprior(cfg, grid)

    def one(tg):
        th = tuple(tg if i == which else jnp.asarray(t)
                   for i, t in enumerate(theta_other))
        F = jnp.stack([jnp.broadcast_to(
            jnp.asarray(mixing_element(comp, bp, th)), (P,))
            for bp in bps])                              # (B, P)
        if lnl_type in ("ridge", "marginal"):
            if amp_band is not None:
                # beam-consistent template ratio (see _grid_lnL_pixel)
                F = F * jnp.where(
                    jnp.abs(amp_pix[None, 0]) > 1e-30,
                    amp_band[:, 0] / jnp.where(
                        jnp.abs(amp_pix[None, 0]) > 1e-30,
                        amp_pix[None, 0], 1.0), 1.0)
            MNd = jnp.einsum("bp,bsp,bsp->p", F, inv_rms2, res)
            MNM = jnp.einsum("bp,bsp,bp->p", F, inv_rms2, F)
            lnl_p = jnp.where(MNM > 0,
                              0.5 * MNd * MNd / jnp.maximum(MNM, 1e-300),
                              0.0)
            if lnl_type == "marginal":
                lnl_p = lnl_p + jnp.where(
                    MNM > 0, 0.5 * jnp.log(jnp.maximum(MNM, 1e-300)),
                    0.0)
            return jnp.sum(lnl_p)
        if amp_band is not None:                         # (B, S, P) beamed
            model = F[:, None, :] * amp_band
        else:
            model = F[:, None, :] * amp_pix[None]        # (B, S, P)
        return -0.5 * jnp.sum(inv_rms2 * jnp.square(res - model))

    # Gaussian prior added ONCE to the fullsky total, matching the
    # reference (comm_nonlin_mod.f90:1998-2015 adds the p_gauss term on
    # rank 0 only, after the pixel allreduce). The previous
    # implementation summed the per-pixel broadcast and so applied the
    # prior npix times — a fidelity bug that over-tightened fullsky
    # draws by sqrt(npix).
    return jax.lax.map(one, grid) + _lnprior(cfg, grid)


def sample_specind_fullsky(key, comp, bps, cfg: SpecIndConfig, res, amp_pix,
                           inv_rms2, theta_other, which: int = 0,
                           amp_band=None):
    """Single global draw of one spectral parameter (scalar).

    Reference: sampleDiffuseSpecIndFullsky_nonlin (comm_nonlin_mod:1707);
    amp_band adds the beam-consistent per-band amplitude maps."""
    lnl_tot = _grid_lnL_total(comp, bps, cfg, res, amp_pix, inv_rms2,
                              theta_other, which, amp_band=amp_band)
    return _cdf_invert(key, lnl_tot, cfg.grid(res.dtype))


def sample_specind_alm(key, comp, bps, cfg: SpecIndConfig, plan, res,
                       amp_pix, inv_rms2, theta_other, theta_alm,
                       which: int = 0, lmax_ind: int = 2,
                       step: float = 0.05, nsteps: int = 3,
                       amp_band=None):
    """alm-space Metropolis sampler for a smooth spectral-index FIELD.

    Reference: sample_specind_alm (comm_nonlin_mod.f90:193-874) — the
    production sampler when COMP_LMAX_IND >= 0: theta is parametrized by
    low-ell alms; proposals perturb the alms; the likelihood is the map
    chi^2 with pixel mixing evaluated at theta(p) = Y theta_alm, plus the
    Gaussian prior (if configured) acting on the map.

    theta_alm: (lmax_ind+1, lmax_ind+1) complex alms of the sampled
    parameter; theta_other: the component's full parameter tuple (the
    sampled slot is ignored and replaced by the synthesized map).
    Returns (theta_alm', theta_map', n_accept). Host-level loop (the MH
    chain is short and sequential, like the reference's).
    """
    import numpy as np

    from ..sphere import sht
    from ..sphere.alm import random_alm_white, real_m0

    nl_i = lmax_ind + 1
    tri = jnp.asarray((np.arange(nl_i)[None, :]
                       <= np.arange(nl_i)[:, None]).astype(np.float64))

    def to_map(t_alm):
        pad = plan.lmax + 1 - nl_i
        return sht.alm2map(plan, jnp.pad(t_alm, ((0, pad), (0, pad))))

    @jax.jit
    def lnL(t_alm):
        theta_map = to_map(t_alm)
        th = tuple(theta_map if i == which else v
                   for i, v in enumerate(theta_other))
        Fg = jnp.stack([mixing_element(comp, bp, th) for bp in bps])
        # beam-consistent model when per-band beamed amplitudes given
        amp_eff = amp_pix[None] if amp_band is None else amp_band
        model = Fg[:, None, :] * amp_eff
        lp = -0.5 * jnp.sum(inv_rms2 * jnp.square(res - model))
        if cfg.prior_mean is not None and cfg.prior_std is not None:
            lp = lp - 0.5 * jnp.mean(
                jnp.square((theta_map - cfg.prior_mean) / cfg.prior_std))
        return lp

    t = theta_alm
    ll = lnL(t)
    n_acc = 0
    for s in range(nsteps):
        key, k1, k2 = jax.random.split(key, 3)
        prop = t + step * real_m0(
            random_alm_white(k1, (nl_i, nl_i), jnp.float64)) * tri
        ll_p = lnL(prop)
        if float(jnp.log(jax.random.uniform(k2, ()))) < float(ll_p - ll):
            t, ll = prop, ll_p
            n_acc += 1
    return t, to_map(t), n_acc


def sample_specind_alm_pixreg(key, comp, bps, cfg: SpecIndConfig, plan, res,
                              amp_pix, inv_rms2, theta_other, theta_reg,
                              region_of_pix, which: int = 0,
                              lmax_ind: int = 2, step: float = 0.05,
                              nsteps: int = 3, fwhm_postproc: float = 0.0,
                              fix_reg=None, reg_priors=None):
    """alm-space MH with PIXEL-REGION means (ALMSAMP_PIXREG = .true.).

    Reference: the region branch of sample_specind_alm
    (comm_nonlin_mod.f90:420-607): proposals perturb the per-region values
    theta_pixreg (frozen regions via fix_pixreg stay put), the field is the
    piecewise-constant region map optionally smoothed with the postproc
    beam, thresholded on the uniform prior range, and the stored alms are
    its YtW; the MH chisq adds a Gaussian prior per region centered on
    pixreg_priors (:544-552).

    theta_reg: (R,) current region values; region_of_pix: (P,) int32.
    Returns (theta_reg', theta_map', theta_alm', n_accept).
    """
    import numpy as np

    from ..sphere import sht

    nl_i = lmax_ind + 1
    rop = jnp.asarray(region_of_pix)
    fix = (jnp.zeros(theta_reg.shape, bool) if fix_reg is None
           else jnp.asarray(fix_reg, bool))
    priors = (jnp.full(theta_reg.shape, cfg.prior_mean
                       if cfg.prior_mean is not None else 0.0)
              if reg_priors is None else jnp.asarray(reg_priors))

    def to_field(vals):
        th = vals[rop]
        if fwhm_postproc and fwhm_postproc > 0:
            th = sht.smooth_map(plan, th, fwhm_postproc)
        return jnp.clip(th, cfg.grid_min, cfg.grid_max)

    @jax.jit
    def lnL(vals):
        theta_map = to_field(vals)
        th = tuple(theta_map if i == which else v
                   for i, v in enumerate(theta_other))
        Fg = jnp.stack([mixing_element(comp, bp, th) for bp in bps])
        model = Fg[:, None, :] * amp_pix[None]
        lp = -0.5 * jnp.sum(inv_rms2 * jnp.square(res - model))
        if cfg.prior_std is not None:
            lp = lp - 0.5 * jnp.sum(
                jnp.square((vals - priors) / cfg.prior_std))
        return lp

    t = jnp.asarray(theta_reg)
    ll = lnL(t)
    n_acc = 0
    for s in range(nsteps):
        key, k1, k2 = jax.random.split(key, 3)
        delta = step * jax.random.normal(k1, t.shape, t.dtype)
        prop = jnp.where(fix, t, t + delta)
        # out-of-range proposals are rejected outright (:584-588)
        if bool(jnp.any((prop < cfg.grid_min) | (prop > cfg.grid_max))):
            continue
        ll_p = lnL(prop)
        if float(jnp.log(jax.random.uniform(k2, ()))) < float(ll_p - ll):
            t, ll = prop, ll_p
            n_acc += 1
    theta_map = to_field(t)
    t_alm = sht.map2alm(plan, theta_map)[..., :nl_i, :nl_i]
    return t, theta_map, t_alm, n_acc


def sample_specind_regions(key, comp, bps, cfg: SpecIndConfig, res, amp_pix,
                           inv_rms2, theta_other, region_of_pix, nregion,
                           which: int = 0):
    """Pixel-region draw: one theta per region (comm_nonlin_mod:2160).

    region_of_pix: (P,) int32 region id per pixel."""
    lnl = _grid_lnL_pixel(comp, bps, cfg, res, amp_pix, inv_rms2,
                          theta_other, which)            # (P, G)
    lnl_reg = jax.ops.segment_sum(lnl, region_of_pix, num_segments=nregion)
    theta_reg = _cdf_invert(key, lnl_reg, cfg.grid(res.dtype))
    return theta_reg, theta_reg[region_of_pix]
