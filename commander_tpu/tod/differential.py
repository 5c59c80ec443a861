"""Differential-horn (WMAP-style) TOD processing.

TPU-native counterpart of ``comm_tod_WMAP_mod.f90`` (process_WMAP_tod
:142-485): each detector measures the DIFFERENCE of two horns,

  d_t = g [ (1+x_im) s_A(t) - (1-x_im) s_B(t) ] + n_t,
  s_X(t) = T[pix_X] + Q[pix_X] cos 2 psi_X + U[pix_X] sin 2 psi_X

with transmission-imbalance parameters x_im per detector. Mapmaking is no
longer per-pixel separable (each sample couples pixel pairs), so the map
solve is a CG on the normal equations P^T N^-1 P m = P^T N^-1 d with a
diagonal (hit-weight) preconditioner — the reference solves the same
system with its own CG (:380-460); here the operator is two gathers and a
scatter-add per application, fully batched in jit.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.cg import pcg


def project_diff(maps, pixA, psiA, pixB, psiB, x_im, pol: bool):
    """maps (k, npix) -> differential TOD (..., Nt).

    x_im: (..., 1) or scalar imbalance (broadcast to samples)."""
    def horn(pix, psi):
        s = maps[0][pix]
        if pol and maps.shape[0] >= 3:
            s = s + maps[1][pix] * jnp.cos(2 * psi) \
                + maps[2][pix] * jnp.sin(2 * psi)
        return s
    return (1.0 + x_im) * horn(pixA, psiA) - (1.0 - x_im) * horn(pixB, psiB)


def project_diff_T(tod_w, pixA, psiA, pixB, psiB, x_im, npix: int, pol: bool):
    """Adjoint of project_diff: weighted TOD -> map-space accumulation."""
    k = 3 if pol else 1
    out = jnp.zeros((k, npix), tod_w.dtype)

    def scatter(out, pix, psi, coeff):
        w = coeff * tod_w
        out = out.at[0, pix.reshape(-1)].add(w.reshape(-1))
        if pol:
            out = out.at[1, pix.reshape(-1)].add(
                (w * jnp.cos(2 * psi)).reshape(-1))
            out = out.at[2, pix.reshape(-1)].add(
                (w * jnp.sin(2 * psi)).reshape(-1))
        return out

    out = scatter(out, pixA, psiA, (1.0 + x_im))
    out = scatter(out, pixB, psiB, -(1.0 - x_im))
    return out


def solve_diff_map(tod, pixA, psiA, pixB, psiB, x_im, mask, inv_var,
                   npix: int, pol: bool, tol=1e-8, maxiter=150):
    """CG mapmaker for differential data. Returns (maps (k,npix), CGResult,
    hits (npix,)). inv_var: per-(scan,det) white-noise weight."""
    w = mask * inv_var[..., None]

    def apply_A(m):
        s = project_diff(m, pixA, psiA, pixB, psiB, x_im, pol)
        return project_diff_T(s * w, pixA, psiA, pixB, psiB, x_im, npix, pol)

    b = project_diff_T(tod * w, pixA, psiA, pixB, psiB, x_im, npix, pol)
    # diagonal preconditioner: per-pixel accumulated weights per horn
    ones = jnp.ones_like(tod)
    diagT = jnp.zeros((npix,), tod.dtype)
    diagT = diagT.at[pixA.reshape(-1)].add(
        ((1.0 + x_im) ** 2 * w * ones).reshape(-1))
    diagT = diagT.at[pixB.reshape(-1)].add(
        ((1.0 - x_im) ** 2 * w * ones).reshape(-1))
    k = 3 if pol else 1
    diag = jnp.stack([diagT] + [0.5 * diagT] * (k - 1))
    hits = diagT > 0
    M_inv = lambda r: jnp.where(diag > 0, r / jnp.maximum(diag, 1e-30), 0.0)

    res = pcg(apply_A, b, M_inv=M_inv,
              dot=lambda a, c: jnp.sum(a * c), tol=tol, maxiter=maxiter)
    return res.x * hits[None, :], res, hits


@jax.tree_util.register_dataclass
@__import__("dataclasses").dataclass(frozen=True)
class DiffTodBlock:
    """Differential-horn TOD block (comm_tod_WMAP_mod data model): per
    (scan, det, t) horn-A/B pointings and the differenced timestream."""
    tod: jnp.ndarray       # (Ns, Nd, Nt)
    pixA: jnp.ndarray      # (Ns, Nd, Nt) int32
    psiA: jnp.ndarray
    pixB: jnp.ndarray
    psiB: jnp.ndarray
    mask: jnp.ndarray
    vsun: jnp.ndarray      # (Ns, 3)
    fsamp: float = 10.0


def simulate_tod_diff(nside: int, sky_maps, nscan=4, ndet=2, ntod=2048,
                      fsamp=10.0, gain0=1.0, sigma0=0.5, alpha=-1.5,
                      fknee=0.1, x_im0=0.01, pol=False, seed=0):
    """Synthetic differential TOD (the WMAP-style stand-in archive)."""
    import numpy as np

    from .sim import great_circle_scans

    rng = np.random.default_rng(seed + 7)
    pixA, psiA = great_circle_scans(nside, nscan, ndet, ntod, fsamp, seed)
    pixB, psiB = great_circle_scans(nside, nscan, ndet, ntod, fsamp,
                                    seed + 1000)
    vsun = rng.standard_normal((nscan, 3)) * 1e4 + np.array([0, 3e4, 0])
    s = np.asarray(project_diff(jnp.asarray(sky_maps), jnp.asarray(pixA),
                                jnp.asarray(psiA), jnp.asarray(pixB),
                                jnp.asarray(psiB), x_im0, pol))
    freqs = np.fft.rfftfreq(ntod, 1.0 / fsamp)
    S = np.zeros_like(freqs)
    S[1:] = (freqs[1:] / fknee) ** alpha
    nf = np.fft.rfft(rng.standard_normal((nscan, ndet, ntod)), axis=-1)
    ncorr = np.fft.irfft(nf * np.sqrt(S), n=ntod, axis=-1) * sigma0
    tod = gain0 * s + ncorr + sigma0 * rng.standard_normal(s.shape)
    mask = np.ones_like(tod)
    mask[:, :, :8] = 0.0
    block = DiffTodBlock(tod=jnp.asarray(tod), pixA=jnp.asarray(pixA),
                         psiA=jnp.asarray(psiA), pixB=jnp.asarray(pixB),
                         psiB=jnp.asarray(psiB), mask=jnp.asarray(mask),
                         vsun=jnp.asarray(vsun), fsamp=fsamp)
    truth = dict(gain=gain0, sigma0=sigma0, alpha=alpha, fknee=fknee,
                 x_im=x_im0, ncorr=ncorr, s=s)
    return block, truth


def process_tod_diff(cfg, block: DiffTodBlock, state, sky_maps, pix_vec,
                     key):
    """One differential-TOD Gibbs pass: gain -> PSD -> n_corr -> x_im ->
    CG mapmaking (process_WMAP_tod, comm_tod_WMAP_mod.f90:142-485).

    cfg: tod.process.TodConfig; state: tod.model.TodState (x_im rides in
    the products dict). Returns (new state, products)."""
    import numpy as np

    from . import model as M

    npix = 12 * cfg.nside * cfg.nside
    k_g, k_n, k_p, k_x = jax.random.split(key, 4)

    s_orbA = M.orbital_dipole(block.vsun, pix_vec, cfg.nu, block.pixA)
    s_orbB = M.orbital_dipole(block.vsun, pix_vec, cfg.nu, block.pixB)
    s_sky = project_diff(sky_maps, block.pixA, block.psiA, block.pixB,
                         block.psiB, 0.0, cfg.pol)
    s_ref = s_sky + (s_orbA - s_orbB)

    d_for_gain = block.tod - state.n_corr
    gain_raw = M.sample_gain_perscan(k_g, d_for_gain, s_ref, block.mask,
                                     state.sigma0)
    gain = M.smooth_gain(gain_raw, cfg.gain_smooth_window)

    resid = block.tod - gain[..., None] * s_ref
    sigma0, alpha, fknee = M.sample_noise_psd(
        k_p, resid, block.mask, block.fsamp,
        jnp.asarray(cfg.alpha_grid, resid.dtype),
        jnp.asarray(cfg.fknee_grid, resid.dtype))
    n_corr = M.sample_ncorr(k_n, resid, block.mask, sigma0, alpha, fknee,
                            block.fsamp)

    # transmission imbalance given the horn signals
    def horn(maps, pix, psi):
        s = maps[0][pix]
        if cfg.pol and maps.shape[0] >= 3:
            s = s + maps[1][pix] * jnp.cos(2 * psi) \
                + maps[2][pix] * jnp.sin(2 * psi)
        return s
    sA = horn(sky_maps, block.pixA, block.psiA) + s_orbA
    sB = horn(sky_maps, block.pixB, block.psiB) + s_orbB
    x_im = sample_imbalance(k_x, (block.tod - n_corr)
                            / jnp.maximum(gain[..., None], 1e-30)
                            - (sA - sB), sA, sB, block.mask, sigma0)
    x_im_mean = jnp.mean(x_im)

    # CG mapmaking on calibrated n_corr-subtracted data (orbital dipole
    # difference removed)
    calib = (block.tod - n_corr) / jnp.maximum(gain[..., None], 1e-30) \
        - (s_orbA - s_orbB)
    inv_var = jnp.square(gain) / jnp.maximum(sigma0 ** 2, 1e-30)
    maps, res, hits = solve_diff_map(calib, block.pixA, block.psiA,
                                     block.pixB, block.psiB, x_im_mean,
                                     block.mask, inv_var, npix,
                                     cfg.pol)
    # diagonal rms estimate from the accumulated weights
    w = block.mask * inv_var[..., None]
    diag = jnp.zeros((npix,), calib.dtype)
    diag = diag.at[block.pixA.reshape(-1)].add(
        ((1.0 + x_im_mean) ** 2 * w).reshape(-1))
    diag = diag.at[block.pixB.reshape(-1)].add(
        ((1.0 - x_im_mean) ** 2 * w).reshape(-1))
    rms = jnp.where(diag > 0, 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30)), 0.0)
    k = maps.shape[0]
    rms = jnp.stack([rms] + [rms * jnp.sqrt(2.0)] * (k - 1))

    new_state = M.TodState(gain=gain, sigma0=sigma0, alpha=alpha,
                           fknee=fknee, n_corr=n_corr)
    products = dict(map=maps, rms=rms, hits=hits, x_im=x_im,
                    cg_iters=res.iters)
    return new_state, products


def sample_imbalance(key, tod, s_A, s_B, mask, sigma0, prior_std=0.05):
    """Draw x_im | d, sky: with r = d - g(s_A - s_B), model residual slope
    on (s_A + s_B): x_im ~ N(<u, r>/<u, u>, 1/<u,u>), u = g (s_A + s_B)
    (the reference samples x_im in its gain block)."""
    u = s_A + s_B
    w = mask / jnp.maximum(sigma0[..., None] ** 2, 1e-30)
    num = jnp.sum(u * tod * w, (-1,))
    den = jnp.sum(u * u * w, (-1,)) + 1.0 / prior_std**2
    mean = num / jnp.maximum(den, 1e-30)
    std = 1.0 / jnp.sqrt(jnp.maximum(den, 1e-30))
    return mean + std * jax.random.normal(key, mean.shape, tod.dtype)
