"""TOD data model and core per-scan kernels, batched TPU-first.

TPU-native counterpart of the reference TOD layer (SURVEY.md §2.9):
  * data model      comm_tod_mod.f90 (comm_detscan :36-52, comm_scan :54-65)
  * pointing        comm_tod_pointing_mod.f90 project_sky (:31)
  * orbital dipole  comm_tod_orbdipole_mod.f90 (:161 pencil beam)
  * mapmaking       comm_tod_mapmaking_mod.f90 bin_TOD (:34) /
                    finalize_binned_map (:96)
  * corr. noise     comm_tod_noise_mod.f90 sample_n_corr (:33, FFT core
                    :140-182), multiply_inv_N (:1366)
  * noise PSD       comm_tod_noise_mod.f90 sample_noise_psd (:800)
  * gain            comm_tod_gain_mod.f90 (per-scan GLS :37-142, smoothing
                    :143-453, abscal :534-576)

Design: the reference processes scans in a serial Fortran loop per MPI rank;
here every kernel is batched over (nscan, ndet, ntod) arrays with a sample
mask (flagged/padded samples -> mask 0). FFTs batch over scans x detectors;
mapmaking is a segment_sum over pixel indices; PSD sampling grids the
conditional like InvSamp. Scans shard across devices (P4 in SURVEY §2.11)
with psum-reduced binned maps.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import C_LIGHT, H_OVER_K, T_CMB


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TodBlock:
    """One band's TOD, bucketed to a common padded length.

    Shapes: nscan=Ns, ndet=Nd, ntod=Nt (padded), npix implied by pix.
    """
    tod: jnp.ndarray      # (Ns, Nd, Nt) raw data [V or K]
    pix: jnp.ndarray      # (Ns, Nd, Nt) int32 RING pixel of each sample
    psi: jnp.ndarray      # (Ns, Nd, Nt) polarization angle [rad]
    mask: jnp.ndarray     # (Ns, Nd, Nt) 1 = good sample (flags+padding)
    vsun: jnp.ndarray     # (Ns, 3) satellite velocity [m/s] per scan
    fsamp: float          # sampling frequency [Hz]
    # (Ns, 2) observatory ecliptic (lon, lat) [deg] per scan (zodi geometry;
    # comm_tod_mod.f90:61 satpos); None when the archive predates the field
    satpos: jnp.ndarray | None = None

    @property
    def nscan(self):
        return self.tod.shape[0]

    @property
    def ndet(self):
        return self.tod.shape[1]

    @property
    def ntod(self):
        return self.tod.shape[2]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TodState:
    """Sampled per-scan/per-det instrument state."""
    gain: jnp.ndarray     # (Ns, Nd) total gain per scan
    sigma0: jnp.ndarray   # (Ns, Nd) white-noise level (tod units)
    alpha: jnp.ndarray    # (Ns, Nd) 1/f slope
    fknee: jnp.ndarray    # (Ns, Nd) knee frequency [Hz]
    n_corr: jnp.ndarray   # (Ns, Nd, Nt) correlated-noise realization


# ---------------------------------------------------------------------------
# Pointing: sky maps <-> TOD
# ---------------------------------------------------------------------------

def project_sky(maps, pix, psi, pol: bool):
    """s[t] = T[pix] (+ Q[pix] cos 2psi + U[pix] sin 2psi).

    maps: (S, npix) shared across detectors, or (Nd, S, npix) PER-DETECTOR
    sky maps (the reference's map_sky(:,:,det,:) distribution,
    comm_tod_LFI_mod.f90:401-418 — per-det bandpasses make the sky
    det-dependent); pix/psi: (Ns, Nd, Nt) or any (..., Nt).
    Reference: project_sky (comm_tod_pointing_mod.f90:31)."""
    if maps.ndim == 3 and pix.ndim == 3:
        # vmap over the detector axis (axis 1 of pix/psi, axis 0 of maps)
        return jax.vmap(lambda m, p, ps: project_sky(m, p, ps, pol),
                        in_axes=(0, 1, 1), out_axes=1)(maps, pix, psi)
    T = maps[0][pix]
    if not pol or maps.shape[0] == 1:
        return T
    return T + maps[1][pix] * jnp.cos(2.0 * psi) + maps[2][pix] * jnp.sin(2.0 * psi)


def orbital_dipole(vsun, pix_vec, nu: float, pix):
    """Pencil-beam orbital CMB dipole template in uK_cmb with the
    relativistic quadrupole correction (comm_tod_orbdipole_mod.f90:161-221).

    vsun: (Ns, 3) m/s; pix_vec: (npix, 3) unit vectors; pix: (Ns, Nd, Nt).
    """
    beta = vsun / C_LIGHT                                  # (Ns, 3)
    n = pix_vec[pix]                                       # (Ns, Nd, Nt, 3)
    b_dot_n = jnp.einsum("sk,sdtk->sdt", beta, n)
    x = nu * (H_OVER_K / T_CMB)
    q = x * (jnp.exp(x) + 1.0) / (2.0 * jnp.expm1(x))      # freq-dep quad factor
    return (T_CMB * 1e6) * (b_dot_n + q * b_dot_n**2)


def beam_moments_orbdipole(beam_map: jnp.ndarray, pix_vec: jnp.ndarray):
    """First/second angular moments of a 4pi beam map for the beam-convolved
    orbital dipole: S_k = sum_p b_p n_kp, S_jk = sum_p b_p n_jp n_kp,
    B0 = sum_p b_p — the orb_dp_s(1:10) table the reference precomputes
    from conviqt beam maps (comm_tod_orbdipole_mod.f90 compute_4pi_product
    uses entries v.S(1:3), v v.S(4:9), normalized by S(10)).

    beam_map (npix,) in the beam frame (z = boresight). Returns
    (S1 (3,), S2 (3,3), B0)."""
    S1 = jnp.einsum("p,pk->k", beam_map, pix_vec)
    S2 = jnp.einsum("p,pj,pk->jk", beam_map, pix_vec, pix_vec)
    return S1, S2, jnp.sum(beam_map)


def _euler_zyz(psi, theta, phi):
    """Rotation matrix R = Rz(psi) Ry(theta) Rz(phi), batched over leading
    dims (the reference's compute_euler_matrix_zyz)."""
    cps, sps = jnp.cos(psi), jnp.sin(psi)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    cph, sph = jnp.cos(phi), jnp.sin(phi)
    r00 = cps * cth * cph - sps * sph
    r01 = -cps * cth * sph - sps * cph
    r02 = cps * sth
    r10 = sps * cth * cph + cps * sph
    r11 = -sps * cth * sph + cps * cph
    r12 = sps * sth
    r20 = -sth * cph
    r21 = sth * sph
    r22 = cth
    return jnp.stack([jnp.stack([r00, r01, r02], -1),
                      jnp.stack([r10, r11, r12], -1),
                      jnp.stack([r20, r21, r22], -1)], -2)


def orbital_dipole_4pi(vsun, theta_pix, phi_pix, psi, pix, moments,
                       nu: float):
    """Beam-convolved (4pi) orbital dipole template in uK_cmb.

    Per sample: rotate v_sun into the beam frame with R(-psi,-theta,-phi)
    and contract with the beam moments —
    compute_orbital_dipole_4pi / compute_4pi_product
    (comm_tod_orbdipole_mod.f90:190-288), without the spline subsampling
    (the full contraction is one fused einsum on TPU).

    theta_pix/phi_pix: (npix,) pixel angles; psi/pix: (Ns,Nd,Nt);
    moments: (S1, S2, B0) from beam_moments_orbdipole."""
    S1, S2, B0 = moments
    th = theta_pix[pix]
    ph = phi_pix[pix]
    R = _euler_zyz(-psi, -th, -ph)                         # (Ns,Nd,Nt,3,3)
    vn = jnp.einsum("sdtjk,sk->sdtj", R, vsun / C_LIGHT)
    x = nu * (H_OVER_K / T_CMB)
    q = x * (jnp.exp(x) + 1.0) / (2.0 * jnp.expm1(x))
    lin = jnp.einsum("sdtj,j->sdt", vn, S1)
    quad = jnp.einsum("sdtj,jk,sdtk->sdt", vn, S2, vn)
    return (T_CMB * 1e6) * (lin + q * quad) / B0


# ---------------------------------------------------------------------------
# 1/f noise model and FFT-space operations
# ---------------------------------------------------------------------------

def psd_1f(freqs, sigma0, alpha, fknee):
    """Noise PSD: sigma0^2 * (1 + (f/fknee)^alpha) with the white part
    separated; here returns the CORRELATED part only:
    S_corr(f) = sigma0^2 (f/fknee)^alpha (alpha<0), S(0) := large.
    freqs (F,), params (...,) -> (..., F)."""
    f = jnp.maximum(freqs, 1e-12)
    s = sigma0[..., None] ** 2 * (f / fknee[..., None]) ** alpha[..., None]
    return s


def sample_ncorr(key, resid, mask, sigma0, alpha, fknee, fsamp):
    """Draw n_corr | resid from the conditional Gaussian in Fourier space.

    resid = d - g s_sky - baselines (the calibrated-signal-subtracted TOD).
    Conditional (comm_tod_noise_mod.f90:140-182): per frequency bin
      n_f ~ N( S_c/(S_c + S_w) r_f,  (1/S_c + 1/S_w)^-1 )
    with S_w = sigma0^2 (white, flat) and S_c the 1/f PSD. Masked samples
    are gap-filled by the prior (their information is removed by replacing
    resid with its unmasked mean — the reference's fill_masked_region).

    Shapes: resid/mask (Ns, Nd, Nt); returns (Ns, Nd, Nt).
    """
    Nt = resid.shape[-1]
    good = mask > 0.5
    mean = jnp.sum(resid * mask, -1, keepdims=True) / jnp.maximum(
        jnp.sum(mask, -1, keepdims=True), 1.0)
    r = jnp.where(good, resid, mean)
    rf = jnp.fft.rfft(r, axis=-1)
    freqs = jnp.fft.rfftfreq(Nt, 1.0 / fsamp).astype(resid.dtype)
    S_w = jnp.broadcast_to((sigma0**2)[..., None], rf.shape[:-1] + freqs.shape)
    S_c = psd_1f(freqs, sigma0, alpha, fknee)
    # Wiener mean and fluctuation in rfft space
    W = S_c / (S_c + S_w)
    var = 1.0 / (1.0 / jnp.maximum(S_c, 1e-30) + 1.0 / jnp.maximum(S_w, 1e-30))
    k1, k2 = jax.random.split(key)
    # unit-variance complex noise with rfft symmetry: DC & Nyquist real
    eta_re = jax.random.normal(k1, rf.shape, resid.dtype)
    eta_im = jax.random.normal(k2, rf.shape, resid.dtype)
    nfreq = rf.shape[-1]
    scale = jnp.full((nfreq,), np.sqrt(0.5), resid.dtype)
    scale = scale.at[0].set(1.0)
    if Nt % 2 == 0:
        scale = scale.at[-1].set(1.0)
    eta = eta_re * scale + 1j * eta_im * scale
    eta = eta.at[..., 0].set(eta[..., 0].real)
    if Nt % 2 == 0:
        eta = eta.at[..., -1].set(eta[..., -1].real)
    nf = W * rf + jnp.sqrt(var * Nt) * eta
    nf = nf.at[..., 0].set(0.0)   # no monopole in n_corr (degeneracy w/ mono)
    return jnp.fft.irfft(nf, n=Nt, axis=-1)


def _mirror_fourier_apply(x, fmat):
    """Multiply by a Fourier-diagonal operator with mirrored (even) extension
    to 2*Nt — the apply_fourier_mat helper of the reference's SM-CG sampler
    (comm_tod_noise_mod.f90:433-466). x (..., Nt), fmat (..., Nt+1)."""
    Nt = x.shape[-1]
    xe = jnp.concatenate([x, x[..., ::-1]], axis=-1)
    xf = jnp.fft.rfft(xe, axis=-1) * fmat
    return jnp.fft.irfft(xf, n=2 * Nt, axis=-1)[..., :Nt]


def sample_ncorr_sm(key, resid, mask, sigma0, alpha, fknee, fsamp,
                    n_iter: int = 15):
    """Exact masked n_corr draw via Sherman-Morrison/Woodbury CG.

    The gap-fill approximation of sample_ncorr replaces masked samples by
    the unmasked mean; this is the reference's EXACT alternative
    (get_ncorr_sm_cg, comm_tod_noise_mod.f90:308-466): in whitened units
    the conditional precision is A = diag(mask) + invNcorr (invNcorr
    Fourier-diagonal with mirrored extension), and Woodbury reduces A^-1 to
    a CG over only the MASKED samples with operator
        p -> p - [ (1+invNcorr)^-1 (p on gaps) ] on gaps.
    Here the gap restriction is a static-shape multiply by (1-mask), the
    CG is a fori_loop batched over (scan, det), and each iteration costs
    one batched FFT pair — TPU-friendly regardless of gap layout.

    key=None returns the conditional (Wiener) mean. resid/mask (Ns,Nd,Nt);
    returns n_corr (Ns,Nd,Nt) in data units.
    """
    Nt = resid.shape[-1]
    dtype = resid.dtype
    s0 = jnp.maximum(sigma0[..., None], 1e-30)
    x = resid / s0 * mask
    freqs = jnp.fft.rfftfreq(2 * Nt, 1.0 / fsamp).astype(dtype)
    # whitened inverse 1/f prior: 1/S_c with S_c = (f/fknee)^alpha (DC free)
    ratio = freqs / fknee[..., None]
    invNcorr = jnp.where(freqs > 0, jnp.where(ratio > 0, ratio, 1.0)
                         ** (-alpha[..., None]), 0.0)
    invM = 1.0 / (1.0 + invNcorr)
    gap = 1.0 - mask

    if key is None:
        b = x
    else:
        k1, k2 = jax.random.split(key)
        d = jax.random.normal(k1, resid.shape, dtype)
        r = jax.random.normal(k2, resid.shape, dtype)
        b = x + d * mask + _mirror_fourier_apply(r, jnp.sqrt(invNcorr))

    # Woodbury inner solve on the gaps: (I - P_g invM P_g) xp = P_g invM b
    bp = gap * _mirror_fourier_apply(b, invM)

    def Ap(p):
        return p - gap * _mirror_fourier_apply(gap * p, invM)

    def dot(u, v):
        return jnp.sum(u * v, axis=-1, keepdims=True)

    xp = jnp.zeros_like(bp)
    rvec = bp
    p = rvec
    r2 = dot(rvec, rvec)

    def body(i, carry):
        xp, rvec, p, r2 = carry
        Adp = Ap(p)
        denom = dot(p, Adp)
        alp = jnp.where(denom > 0, r2 / jnp.maximum(denom, 1e-300), 0.0)
        xp = xp + alp * p
        rnew = rvec - alp * Adp
        r2n = dot(rnew, rnew)
        bet = jnp.where(r2 > 0, r2n / jnp.maximum(r2, 1e-300), 0.0)
        return xp, rnew, rnew + bet * p, r2n

    xp, _, _, _ = jax.lax.fori_loop(0, n_iter, body, (xp, rvec, p, r2))
    n_w = _mirror_fourier_apply(gap * xp + b, invM)
    return n_w * sigma0[..., None]


def multiply_inv_N_white(x, mask, sigma0):
    """White-noise weighting: x * mask / sigma0^2
    (comm_tod_noise_mod.f90:1366 multiply_inv_N, white limit)."""
    return x * mask / jnp.maximum(sigma0[..., None] ** 2, 1e-30)


def sample_noise_psd(key, resid, mask, fsamp, alpha_grid, fknee_grid,
                     sigma0_fix=None):
    """Draw (sigma0, alpha, fknee) | n_corr-subtracted residual.

    sigma0: from the sample-to-sample difference variance (the reference's
    estimator, sample_noise_psd comm_tod_noise_mod.f90:800: sigma0^2 =
    Var[ (r_{t+1} - r_t) ] / 2 over unmasked pairs).
    (alpha, fknee): gridded conditional on the periodogram — the
    inversion-sampler strategy of the reference's InvSamp/ARS usage,
    evaluated as one batched (scan,det,grid) tensor.
    """
    k1, k2 = jax.random.split(key)
    d = (resid[..., 1:] - resid[..., :-1])
    m2 = mask[..., 1:] * mask[..., :-1]
    npair = jnp.maximum(jnp.sum(m2, -1), 1.0)
    var = jnp.sum(d**2 * m2, -1) / npair / 2.0
    # chi^2 draw around the estimator: var * npair / chi2(npair)
    g = jax.random.gamma(k1, npair / 2.0) * 2.0 / npair
    sigma0 = jnp.sqrt(var / jnp.maximum(g, 1e-12)) if sigma0_fix is None \
        else sigma0_fix

    Nt = resid.shape[-1]
    rf = jnp.fft.rfft(resid * mask, axis=-1)
    P = jnp.abs(rf[..., 1:]) ** 2 / Nt                  # periodogram
    freqs = jnp.fft.rfftfreq(Nt, 1.0 / fsamp)[1:].astype(resid.dtype)
    # lnL(alpha, fknee) = -sum_f [ P/S + ln S ], S = sigma0^2(1+(f/fk)^a)
    A = alpha_grid.reshape(-1, 1)
    F = fknee_grid.reshape(1, -1)
    # grid (G_a, G_f) flattened
    Sg = 1.0 + (freqs[None, None, :] / F[..., None]) ** A[..., None]
    # lnL per (..., ga, gf): sum over freq of P/(s0^2 Sg) + log(s0^2 Sg)
    s02 = jnp.maximum(sigma0**2, 1e-30)
    t1 = jnp.einsum("...f,abf->...ab", P, 1.0 / Sg) / s02[..., None, None]
    t2 = jnp.sum(jnp.log(Sg), axis=-1) + freqs.shape[0] * jnp.log(s02)[..., None, None]
    lnl = -(t1 + t2)
    lnl = lnl - jnp.max(lnl, axis=(-2, -1), keepdims=True)
    p = jnp.exp(lnl).reshape(*lnl.shape[:-2], -1)
    cdf = jnp.cumsum(p, -1)
    u = jax.random.uniform(k2, cdf.shape[:-1] + (1,), resid.dtype) * cdf[..., -1:]
    idx = jnp.sum((cdf < u), -1)
    ia, ifk = jnp.unravel_index(idx, lnl.shape[-2:])
    return sigma0, alpha_grid[ia], fknee_grid[ifk]


# ---------------------------------------------------------------------------
# Gain sampling
# ---------------------------------------------------------------------------

def sample_gain_perscan(key, tod, s_ref, mask, sigma0, prior_mean=None,
                        prior_istd=0.0):
    """Per-scan per-det gain GLS fit  g = <s,d>/<s,s> with white-noise
    weights + Gaussian draw (comm_tod_gain_mod.f90:37-142).

    s_ref: the calibration reference signal (sky + orbital dipole)."""
    w = mask / jnp.maximum(sigma0[..., None] ** 2, 1e-30)
    num = jnp.sum(s_ref * tod * w, -1)
    den = jnp.sum(s_ref * s_ref * w, -1)
    if prior_mean is not None:
        num = num + prior_mean * prior_istd**2
        den = den + prior_istd**2
    mean = num / jnp.maximum(den, 1e-30)
    std = 1.0 / jnp.sqrt(jnp.maximum(den, 1e-30))
    return mean + std * jax.random.normal(key, mean.shape, tod.dtype)


def smooth_gain(gain, window: int):
    """Boxcar smoothing of per-scan gains over the scan axis (cheap mode)."""
    Ns = gain.shape[0]
    w = min(window, Ns)
    kern = jnp.ones((w,), gain.dtype) / w
    pad = w // 2
    gp = jnp.pad(gain, ((pad, w - 1 - pad), (0, 0)), mode="edge")
    return jax.vmap(lambda col: jnp.convolve(col, kern, mode="valid"),
                    in_axes=1, out_axes=1)(gp)


def smooth_gain_wiener(key, gain_raw, sigma_g, fknee_scan: float = 0.05,
                       alpha: float = -2.0, sample: bool = True):
    """Wiener smoothing (+ fluctuation) of per-scan gains over the scan
    axis — the reference's sample_smooth_gain
    (comm_tod_gain_mod.f90:143-453): the gain deviation delta g(scan) gets
    a 1/f-like smoothness prior P(f) = (f/fknee)^alpha in scan-frequency,
    combined with the per-scan GLS uncertainties sigma_g.

    Uses the mean measurement variance for the Fourier-diagonal solve (the
    reference's PID-range binning plays the same regularizing role); the
    scan mean is preserved exactly.
    """
    Ns = gain_raw.shape[0]
    mean = jnp.mean(gain_raw, axis=0, keepdims=True)
    d = gain_raw - mean
    var_meas = jnp.mean(jnp.square(sigma_g), axis=0)      # (Nd,)
    f = jnp.fft.rfftfreq(Ns, 1.0).astype(gain_raw.dtype)
    P = jnp.where(f > 0, (jnp.maximum(f, 1e-6) / fknee_scan) ** alpha, 0.0)
    P = P[:, None] * jnp.mean(jnp.square(sigma_g), axis=0)[None, :]
    df = jnp.fft.rfft(d, axis=0)
    W = P / (P + var_meas[None, :] * Ns / Ns)
    post_var = 1.0 / (1.0 / jnp.maximum(P, 1e-30)
                      + 1.0 / jnp.maximum(var_meas[None, :], 1e-30))
    sm = W * df
    if sample:
        kr, ki = jax.random.split(key)
        eta = (jax.random.normal(kr, df.shape, gain_raw.dtype)
               + 1j * jax.random.normal(ki, df.shape, gain_raw.dtype))
        sm = sm + jnp.sqrt(post_var * Ns / 2.0) * eta
        sm = sm.at[0].set(sm[0].real + 0j)
    out = mean + jnp.fft.irfft(sm, n=Ns, axis=0)
    return out


def sample_abscal(key, tod_resid, s_orb, mask, sigma0):
    """Absolute calibration from the orbital dipole: one global gain factor
    across all scans/dets (sample_abscal_from_orbital,
    comm_tod_gain_mod.f90:534-576)."""
    w = mask / jnp.maximum(sigma0[..., None] ** 2, 1e-30)
    num = jnp.sum(s_orb * tod_resid * w)
    den = jnp.sum(s_orb * s_orb * w)
    mean = num / jnp.maximum(den, 1e-30)
    std = 1.0 / jnp.sqrt(jnp.maximum(den, 1e-30))
    return mean + std * jax.random.normal(key, (), tod_resid.dtype)


def sample_relcal(key, tod_resid, s_tot, mask, sigma0):
    """Per-detector relative calibration offsets Delta g_i constrained to
    sum_i Delta g_i = 0 — sample_relcal (comm_tod_gain_mod.f90:577-625):
    per-det GLS accumulators (A_i, b_i) against the full signal template,
    Gaussian fluctuation sqrt(A_i) eta on the rhs, and the zero-sum
    constraint enforced through a Lagrange-multiplier row exactly like the
    reference's (ndet+1) bordered system."""
    nd = tod_resid.shape[1]
    w = mask / jnp.maximum(sigma0[..., None] ** 2, 1e-30)
    A = jnp.sum(s_tot * s_tot * w, axis=(0, 2))          # (Nd,)
    b = jnp.sum(s_tot * tod_resid * w, axis=(0, 2))
    b = b + jnp.sqrt(jnp.maximum(A, 0.0)) \
        * jax.random.normal(key, (nd,), tod_resid.dtype)
    M = jnp.zeros((nd + 1, nd + 1), tod_resid.dtype)
    M = M.at[jnp.arange(nd), jnp.arange(nd)].set(A)
    M = M.at[:nd, nd].set(0.5)
    M = M.at[nd, :nd].set(1.0)
    rhs = jnp.concatenate([b, jnp.zeros((1,), b.dtype)])
    x = jnp.linalg.solve(M, rhs)
    return x[:nd]


def bin_tod_mono(calib_tod, pix, psi, mask, inv_var, npix: int, pol: bool):
    """Extended normal equations with per-detector monopole columns —
    the sys_mono machinery of bin_TOD (comm_tod_mapmaking_mod.f90:34-94,
    'do_oper(samp_mono)' branch): u = (1, cos2psi, sin2psi, e_det) so the
    solved system carries the Stokes x det-monopole cross terms that
    sample_mono's MH needs. Returns (A (npix,k+Nd,k+Nd), b (npix,k+Nd))."""
    Ns, Nd, Nt = calib_tod.shape
    k = 3 if pol else 1
    w = (mask * inv_var[..., None]).reshape(-1)
    d = calib_tod.reshape(-1)
    p = pix.reshape(-1)
    ones = jnp.ones_like(d)
    cols = [ones]
    if pol:
        ps = psi.reshape(-1)
        cols += [jnp.cos(2 * ps), jnp.sin(2 * ps)]
    det_id = jnp.broadcast_to(jnp.arange(Nd)[None, :, None],
                              (Ns, Nd, Nt)).reshape(-1)
    for j in range(Nd):
        cols.append((det_id == j).astype(d.dtype))
    u = jnp.stack(cols, -1)                              # (N, k+Nd)
    A = jax.ops.segment_sum((w[:, None, None] * u[:, :, None]
                             * u[:, None, :]), p, npix)
    b = jax.ops.segment_sum((w * d)[:, None] * u, p, npix)
    return A, b


def sample_mono(key, A, b, nmaps: int, nstep: int = 1000,
                sigma_prop: float = 0.03, mono0=None):
    """Per-detector monopole draw (sample_mono,
    comm_tod_mapmaking_mod.f90:300-438), zero-sum constrained like the
    reference's zero-mean proposals. A/b from bin_tod_mono.

    The reference runs an MH random walk over its TOD chi^2; here the
    Stokes block is marginalized per pixel in closed form, leaving an
    EXACTLY quadratic chi^2(m) = m^T Q m - 2 l^T m — so the conditional is
    Gaussian N(Q^-1 l, Q^-1) restricted to the zero-sum subspace and is
    drawn directly (no random walk; same target distribution). nstep and
    sigma_prop are kept for signature compatibility (unused).
    Returns (mono (Nd,), accept_rate=1)."""
    k = nmaps
    nd = A.shape[-1] - k
    hit = A[:, 0, 0] > 0
    Ass = A[:, :k, :k] + (~hit)[:, None, None] * jnp.eye(k, dtype=A.dtype) \
        + 1e-20 * jnp.eye(k, dtype=A.dtype)
    Asd = A[:, :k, k:]                                   # (npix, k, Nd)
    Add = A[:, k:, k:]
    bs = b[:, :k]
    bd = b[:, k:]
    # marginalize the Stokes amplitudes: effective quadratic form in m
    X = jnp.linalg.solve(Ass, Asd)                       # (npix, k, Nd)
    Q = jnp.sum(jnp.where(hit[:, None, None], Add
                          - jnp.einsum("pki,pkj->pij", Asd, X), 0.0), 0)
    l = jnp.sum(jnp.where(hit[:, None], bd
                          - jnp.einsum("pki,pk->pi", X, bs), 0.0), 0)
    # orthonormal basis of the zero-sum subspace: rows of V (nd-1, nd)
    # from Householder of the all-ones vector
    e = jnp.ones((nd,), A.dtype) / jnp.sqrt(jnp.asarray(nd, A.dtype))
    u = e - jnp.eye(nd, dtype=A.dtype)[0]
    u = u / jnp.maximum(jnp.linalg.norm(u), 1e-30)
    H = jnp.eye(nd, dtype=A.dtype) - 2.0 * jnp.outer(u, u)  # H[:,0] = e
    V = H[:, 1:].T                                       # (nd-1, nd)
    # guard the degenerate system (all scans rejected -> Q ~ 0): keep the
    # previous monopoles rather than emitting NaNs
    tr = jnp.trace(Q)
    ok = tr > 0
    tr_safe = jnp.where(ok, tr, 1.0)
    Qv = V @ Q @ V.T + 1e-7 * tr_safe * jnp.eye(nd - 1, dtype=A.dtype)
    Qv = jnp.where(ok, Qv, jnp.eye(nd - 1, dtype=A.dtype))
    lv = jnp.where(ok, V @ l, 0.0)
    L = jnp.linalg.cholesky(Qv)
    mean_v = jax.scipy.linalg.cho_solve((L, True), lv)
    eta = jax.random.normal(key, (nd - 1,), A.dtype)
    # fluctuation: Qv^-1/2 eta via triangular solve with L^T
    fluc_v = jax.scipy.linalg.solve_triangular(L.T, eta, lower=False)
    m = V.T @ (mean_v + fluc_v)
    m0_prev = jnp.zeros((nd,), A.dtype) if mono0 is None else mono0
    m = jnp.where(ok, m, m0_prev)
    return m, ok.astype(A.dtype)


# ---------------------------------------------------------------------------
# Mapmaking
# ---------------------------------------------------------------------------

def bin_tod(calib_tod, pix, psi, mask, inv_var, npix: int, pol: bool):
    """Accumulate per-pixel normal equations from calibrated TOD.

    A = sum_t w_t u_t u_t^T, b = sum_t w_t d_t u_t with u = (1, cos2psi,
    sin2psi) (or (1,) for T-only); w = mask/sigma0^2. One segment_sum over
    flattened samples replaces the reference's node-shared accumulation
    loops (bin_TOD comm_tod_mapmaking_mod.f90:34-94).
    Returns PACKED normal equations (A (kk, npix) upper-triangle
    components, b (k, npix)): any (npix, 3, 3) array on TPU tiles its
    tiny minor dims to (4, 128) — a 57x HBM padding blow-up (round-5
    nside-512 OOM) — so the per-pixel systems are carried as component
    planes and solved in closed form."""
    w = (mask * inv_var[..., None]).reshape(-1)
    d = calib_tod.reshape(-1)
    p = pix.reshape(-1)
    seg = lambda v: jax.ops.segment_sum(v, p, num_segments=npix)
    if pol:
        c = jnp.cos(2.0 * psi).reshape(-1)
        s = jnp.sin(2.0 * psi).reshape(-1)
        A = jnp.stack([seg(w), seg(w * c), seg(w * s), seg(w * c * c),
                       seg(w * c * s), seg(w * s * s)])  # (6, npix)
        wd = w * d
        b = jnp.stack([seg(wd), seg(wd * c), seg(wd * s)])
    else:
        A = seg(w)[None]
        b = seg(w * d)[None]
    return A, b


def pack_sym3(A):
    """(npix, 3, 3) symmetric -> packed (6, npix) upper components."""
    return jnp.stack([A[:, 0, 0], A[:, 0, 1], A[:, 0, 2],
                      A[:, 1, 1], A[:, 1, 2], A[:, 2, 2]])


def finalize_binned_map(key, A, b, reg: float = 1e-20):
    """Solve the packed per-pixel systems in closed form; returns
    (maps (k,npix), rms (k,npix), white-noise fluctuation map) —
    finalize_binned_map (comm_tod_mapmaking_mod.f90:96-299). Unhit
    pixels -> 0 map, 0 weight. A: (1, npix) for T-only, (6, npix)
    packed symmetric for polarized binning (see bin_tod)."""
    eta = jax.random.normal(key, b.shape, b.dtype)
    hit = A[0] > 0
    if A.shape[0] == 1:
        a = jnp.where(hit, A[0] + reg, 1.0)
        inv = jnp.where(hit, 1.0 / a, 0.0)
        m = inv * b[0]
        rms = jnp.sqrt(inv)
        return m[None], rms * hit[None].astype(rms.dtype), \
            (jnp.sqrt(inv) * eta[0])[None]
    a = jnp.where(hit, A[0] + reg, 1.0)
    bq = jnp.where(hit, A[1], 0.0)
    c = jnp.where(hit, A[2], 0.0)
    dd = jnp.where(hit, A[3] + reg, 1.0)
    e = jnp.where(hit, A[4], 0.0)
    f = jnp.where(hit, A[5] + reg, 1.0)
    # symmetric 3x3 inverse by cofactors (elementwise planes)
    C00 = dd * f - e * e
    C01 = c * e - bq * f
    C02 = bq * e - c * dd
    det = a * C00 + bq * C01 + c * C02
    # determinant condition check (the reference rejects ill-conditioned
    # pixels in finalize_binned_map, comm_tod_mapmaking_mod.f90:96-299):
    # undersampled polarized pixels (< 3 well-spread psi hits) are
    # treated as unhit, not solved into garbage
    hit = hit & (det > 1e-3 * a * dd * f)
    det = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    # reset rejected pixels to the identity BEFORE any division: masking
    # only the outputs leaves inf/NaN from near-singular systems alive
    # (inf * 0 = NaN poisoned the fluctuation map)
    i00 = jnp.where(hit, C00 / det, 1.0)
    i01 = jnp.where(hit, C01 / det, 0.0)
    i02 = jnp.where(hit, C02 / det, 0.0)
    i11 = jnp.where(hit, (a * f - c * c) / det, 1.0)
    i12 = jnp.where(hit, (c * bq - a * e) / det, 0.0)
    i22 = jnp.where(hit, (a * dd - bq * bq) / det, 1.0)
    m = jnp.stack([i00 * b[0] + i01 * b[1] + i02 * b[2],
                   i01 * b[0] + i11 * b[1] + i12 * b[2],
                   i02 * b[0] + i12 * b[1] + i22 * b[2]])
    rms = jnp.sqrt(jnp.maximum(jnp.stack([i00, i11, i22]), 0.0))
    # explicit Cholesky of the 3x3 inverse for the fluctuation draw
    L00 = jnp.sqrt(jnp.maximum(i00, 1e-30))
    L10 = i01 / L00
    L20 = i02 / L00
    L11 = jnp.sqrt(jnp.maximum(i11 - L10 * L10, 1e-30))
    L21 = (i12 - L20 * L10) / L11
    L22 = jnp.sqrt(jnp.maximum(i22 - L20 * L20 - L21 * L21, 0.0))
    fluct = jnp.stack([L00 * eta[0],
                       L10 * eta[0] + L11 * eta[1],
                       L20 * eta[0] + L21 * eta[1] + L22 * eta[2]])
    z = hit[None].astype(m.dtype)
    return m * z, rms * z, fluct * z
