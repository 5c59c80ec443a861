"""Angular power-spectrum (C_ell) prior models and samplers.

TPU-native counterpart of ``comm_Cl_mod.f90``: per-component C_ell models
{none, binned, power_law, exp, gauss} (comm_Cl_mod.f90:49-101), the
S^1/2 / S^-1/2 alm multiplies (:550-675), and the conditional C_ell Gibbs
draws — binned inverse-gamma/inverse-Wishart from the empirical sigma_ell
(:865-1006) and power-law amplitude updates (:1251-1266).

Round-1 scope: diagonal Stokes blocks (TT, EE, BB; no TE coupling) —
the common production configuration; the Wishart TE extension rides on the
same sigma_ell machinery.

Conventions: Cl arrays are (nmaps, lmax+1) in C_ell (not D_ell); S^1/2
multiplies alm[..., nmaps, l, m] by sqrt(Cl[s, l]).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ClModelConfig:
    """Static config for one component's C_ell model."""
    kind: str = "none"          # none | binned | power_law | exp | gauss
    lmax: int = 0
    lmin_amp: int = 0           # ells below lmin get S=0 (amplitude fixed by prior)
    nmaps: int = 1
    # binned model: bin edges (inclusive starts), e.g. [0, 2, 10, 30, ...]
    bin_starts: tuple = ()
    # power_law/exp/gauss: hyperparams sampled {amp, beta}; prior scale ell_pivot
    ell_pivot: int = 50
    # binned model: per-bin per-Stokes sample flags from the bin file's
    # stat column ('S'/'M' sample, '0' keep fixed); empty = sample all
    sample_bins: tuple = ()


def read_cl_bin_file(path: str, lmax: int):
    """Parse a reference Cl bin file (read_binfile, comm_Cl_mod.f90:386-431):
    lines 'l1 l2 stat...' with stat one char per spectrum
    {TT,TE,TB,EE,EB,BB} ('S' sample / 'M' marginalize / '0' fixed).

    Returns (bin_starts tuple incl. a leading 0 bin when l1>0, sample (nbins,
    3) bool over {T,E,B} from the TT/EE/BB columns). Bins beyond lmax are
    dropped; gaps between bins become non-sampled filler bins so
    bin_index_table stays a plain searchsorted."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            toks = line.split()
            l1, l2 = int(toks[0]), int(toks[1])
            if not (0 <= l1 <= lmax and 0 <= l2):
                continue
            stat = "".join(toks[2:]) if len(toks) > 2 else "SSSSSS"
            rows.append((l1, min(l2, lmax), stat))
    if not rows:
        raise ValueError(f"Cl bin file {path} has no valid entries")
    rows.sort()
    starts, sample = [], []
    cur = 0
    for l1, l2, stat in rows:
        if l1 > cur:
            starts.append(cur)            # filler bin: not sampled
            sample.append((False, False, False))
        starts.append(l1)
        pick = [stat[0] if len(stat) > 0 else "0",
                stat[3] if len(stat) > 3 else "0",
                stat[5] if len(stat) > 5 else "0"]
        sample.append(tuple(c in "SM" for c in pick))
        cur = l2 + 1
    if cur <= lmax:
        starts.append(cur)
        sample.append((False, False, False))
    return tuple(starts), np.asarray(sample, bool)


def bin_index_table(cfg: ClModelConfig) -> np.ndarray:
    """(lmax+1,) int: bin id of each ell (binned model)."""
    starts = np.asarray(cfg.bin_starts, dtype=np.int64)
    ells = np.arange(cfg.lmax + 1)
    return np.searchsorted(starts, ells, side="right") - 1


def cl_eval(cfg: ClModelConfig, params: dict) -> jnp.ndarray:
    """Evaluate Cl (nmaps, lmax+1) from model parameters.

    binned:  params['cl_bins'] (nmaps, nbins) -> broadcast per ell
    power_law: params['amp'] (nmaps,), params['beta'] (nmaps,):
        Dl = amp * (ell/pivot)^beta  => Cl = 2 pi Dl / (ell(ell+1))
    """
    ell = jnp.arange(cfg.lmax + 1, dtype=jnp.result_type(float))
    if cfg.kind == "none":
        return params["cl_fix"]
    if cfg.kind == "binned":
        idx = jnp.asarray(bin_index_table(cfg))
        return params["cl_bins"][:, idx]
    if cfg.kind in ("power_law", "power_law_gauss", "exp", "gauss"):
        # Reference Dl shapes (updatePowlaw/updatePowlawGauss/
        # updateExponential/updateGaussian, comm_Cl_mod.f90:227-314):
        #   power_law        Dl = amp (l/lpiv)^beta,  Dl(0)=Dl(1)
        #   power_law_gauss  power_law x max(exp(-l(l+1) sig90'^2), 1e-10)
        #   exp              Dl = amp exp(-beta l/lpiv),  Dl(0)=Dl(1)
        #   gauss            Dl = amp max(exp(-l(l+1) sig(beta')^2), 1e-10)
        # where beta' is a FWHM in ARCMIN for gauss and sig90' the sigma of
        # a fixed 90-arcmin beam for power_law_gauss.
        amp = params["amp"][:, None]
        beta = params["beta"][:, None]
        x = jnp.maximum(ell, 1.0) / cfg.ell_pivot
        llp1 = ell * (ell + 1.0)
        if cfg.kind == "power_law":
            shape = x ** beta
        elif cfg.kind == "power_law_gauss":
            sig90 = np.pi / 180.0 / 60.0 * 90.0 / np.sqrt(8.0 * np.log(2.0))
            shape = x ** beta * jnp.maximum(jnp.exp(-llp1 * sig90 ** 2),
                                            1e-10)
        elif cfg.kind == "exp":
            shape = jnp.exp(-beta * x)
        else:  # gauss: beta is a FWHM in arcmin
            sig = beta * (np.pi / 180.0 / 60.0) / np.sqrt(8.0 * np.log(2.0))
            shape = jnp.maximum(jnp.exp(-llp1 * sig ** 2), 1e-10)
        dl = amp * shape
        # Dl(0) = Dl(1) (reference copies l=1 into the monopole row)
        dl = dl.at[:, 0].set(dl[:, 1])
        cl = 2.0 * jnp.pi * dl / jnp.maximum(llp1, 1.0)
        return cl
    raise ValueError(cfg.kind)


def fixed_cl_from_config(kind: str, amp, beta, lpivot: int, lmax: int,
                         nmaps: int) -> np.ndarray:
    """Numpy Cl (nmaps, lmax+1) for the FIXED functional prior models.

    The reference never resamples power_law/power_law_gauss/exp/gauss
    spectra (sample_Cls_powlaw / sample_Cls_powlaw_gauss are empty,
    comm_Cl_mod.f90:1251-1265); they are static priors with per-Stokes
    (amp, beta) defaults. E/B rows are zeroed below l=2 like the
    constructor's 'if (i > 1 .and. l < 2) cycle'."""
    cfg = ClModelConfig(kind=kind, lmax=lmax, nmaps=nmaps,
                        ell_pivot=max(int(lpivot), 1))
    amp = np.broadcast_to(np.asarray(amp, np.float64), (nmaps,))
    beta = np.broadcast_to(np.asarray(beta, np.float64), (nmaps,))
    cl = np.array(cl_eval(cfg, {"amp": jnp.asarray(amp),
                                "beta": jnp.asarray(beta)}))
    if nmaps > 1:
        cl[1:, :2] = 0.0
    return cl


def _sqrt_or_zero(cl):
    return jnp.sqrt(jnp.maximum(cl, 0.0))


def apply_sqrtS(cl: jnp.ndarray, alm: jnp.ndarray) -> jnp.ndarray:
    """S^1/2 a: multiply alm[..., s, l, m] by sqrt(Cl[s, l])
    (comm_Cl_mod.f90:550-601 sqrtS)."""
    return alm * _sqrt_or_zero(cl)[..., :, :, None]


def apply_sqrtInvS(cl: jnp.ndarray, alm: jnp.ndarray) -> jnp.ndarray:
    """S^-1/2 a with 0 where Cl == 0 (comm_Cl_mod.f90 sqrtInvS)."""
    s = _sqrt_or_zero(cl)
    inv = jnp.where(s > 0, 1.0 / jnp.maximum(s, 1e-300), 0.0)
    return alm * inv[..., :, :, None]


def sigma_ell(alm: jnp.ndarray, lmax: int) -> jnp.ndarray:
    """Empirical power sigma_l = 1/(2l+1) sum_m eps_m |a_lm|^2 for each
    Stokes: alm (..., nmaps, lmax+1, mmax+1) -> (..., nmaps, lmax+1).
    Reference: comm_map_mod getSigmaL feeding sample_Cls (comm_Cl_mod:883).
    """
    nm = alm.shape[-1]
    eps = jnp.concatenate([jnp.ones((1,)), 2.0 * jnp.ones((nm - 1,))])
    power = jnp.sum(eps * jnp.square(jnp.abs(alm)), axis=-1)
    ell = jnp.arange(lmax + 1, dtype=power.dtype)
    return power / (2.0 * ell + 1.0)


def sigma_ell_spectra(alm: jnp.ndarray, lmax: int) -> jnp.ndarray:
    """Full empirical (cross-)spectra in the reference's nspec ordering.

    alm (nmaps, lmax+1, mmax+1) -> (nspec, lmax+1) with nspec = 1 (TT)
    for temperature-only, 6 (TT, TE, TB, EE, EB, BB) for nmaps = 3 —
    the column order of write_sigma_l (comm_Cl_mod.f90:1412-1437) and
    of comm_map getSigmaL's vectorized upper triangle
    (comm_map_mod.f90:1302-1351)."""
    nmaps = alm.shape[-3]
    nm = alm.shape[-1]
    eps = jnp.concatenate([jnp.ones((1,)), 2.0 * jnp.ones((nm - 1,))])
    ell = jnp.arange(lmax + 1, dtype=jnp.result_type(alm.real))
    rows = []
    for i in range(nmaps):
        for j in range(i, nmaps):
            power = jnp.sum(
                eps * (alm[..., i, :, :]
                       * jnp.conj(alm[..., j, :, :])).real, axis=-1)
            rows.append(power / (2.0 * ell + 1.0))
    return jnp.stack(rows, axis=0)


def write_sigma_l(path: str, sigma_l, lmax: int) -> None:
    """Write sigma_l to an ASCII .dat in the reference's exact format:
    Dl = sigma_l * l(l+1)/2pi rows, with the reference's column header
    (write_sigma_l, comm_Cl_mod.f90:1412-1437)."""
    import numpy as np
    sig = np.asarray(sigma_l, np.float64)
    nspec = sig.shape[0]
    ell = np.arange(lmax + 1, dtype=np.float64)
    dl = sig * (ell * (ell + 1.0) / (2.0 * np.pi))
    with open(path, "w") as f:
        if nspec == 1:
            f.write(" # Columns are {l, Dl_TT}\n")
        else:
            f.write(" # Columns are {l, Dl_TT, Dl_TE, Dl_TB, Dl_EE, "
                    "Dl_EB, Dl_BB}\n")
        for l in range(lmax + 1):
            f.write("%6d" % l + "".join("%16.8e" % v for v in dl[:, l])
                    + "\n")


def sample_cl_binned_invgamma(key, cfg: ClModelConfig, alm: jnp.ndarray,
                              alpha0: float = -1.0, beta0: float = 0.0,
                              prev_bins=None):
    """Conditional draw of binned Cl | alm via inverse-gamma per bin.

    For the diagonal-Stokes case the inverse-Wishart of the reference
    (sample_Cls_inverse_wishart, comm_Cl_mod.f90:865-1006) reduces to
      P(C_b | a) = InvGamma(alpha0 + n_b/2, beta0 + s_b/2),
      n_b = sum_{l in b} (2l+1),  s_b = sum_{l,m in b} eps_m |a_lm|^2,
    with the default (alpha0=-1, beta0=0) matching the reference's flat
    prior on C_b; proper InvGamma(alpha0, beta0) hyperpriors are supported
    (used e.g. by the Geweke validation). Returns (nmaps, nbins).
    """
    idx = jnp.asarray(bin_index_table(cfg))
    nbins = len(cfg.bin_starts)
    sig = sigma_ell(alm, cfg.lmax)          # (nmaps, lmax+1)
    ell = jnp.arange(cfg.lmax + 1, dtype=sig.dtype)
    wl = 2.0 * ell + 1.0
    # sum of eps|a|^2 over bin = sum_l (2l+1) sigma_l
    ssum = jax.ops.segment_sum((wl * sig).T, idx, num_segments=nbins).T
    nmodes = jax.ops.segment_sum(wl, idx, num_segments=nbins)
    shape = jnp.maximum(alpha0 + nmodes / 2.0, 0.5)
    g = jax.random.gamma(key, shape[None, :].repeat(sig.shape[0], 0))
    draw = (beta0 + ssum / 2.0) / g
    if cfg.sample_bins and prev_bins is not None:
        # bin-file stat flags: only 'S'/'M' bins are redrawn
        # (comm_Cl_mod.f90:889 'cycle' on fixed bins)
        sb = np.asarray(cfg.sample_bins, bool)          # (nbins, <=3)
        m = np.zeros((sig.shape[0], nbins), bool)
        ns = min(sig.shape[0], sb.shape[1])
        m[:ns] = sb.T[:ns]
        draw = jnp.where(jnp.asarray(m), draw, prev_bins)
    return draw


def sample_cl_prior(key, cfg: ClModelConfig, nmaps: int, alpha0: float,
                    beta0: float):
    """Forward draw C_b ~ InvGamma(alpha0, beta0) per bin (Geweke tests)."""
    nbins = len(cfg.bin_starts)
    g = jax.random.gamma(key, jnp.full((nmaps, nbins), alpha0))
    return beta0 / g


def _wishart_bartlett(key, scale_chol, nu: float, p: int):
    """W ~ Wishart(scale, nu) via Bartlett; scale_chol = chol(scale).

    Supports batched leading dims on scale_chol."""
    kA, kC = jax.random.split(key)
    batch = scale_chol.shape[:-2]
    # lower-triangular A: diag sqrt(chi2(nu - i)), offdiag N(0,1)
    df = nu - jnp.arange(p, dtype=scale_chol.dtype)
    c2 = 2.0 * jax.random.gamma(kC, jnp.broadcast_to(df / 2.0, batch + (p,)))
    A = jnp.zeros(batch + (p, p), scale_chol.dtype)
    tril = jnp.tril_indices(p, -1)
    n_off = len(tril[0])
    off = jax.random.normal(kA, batch + (n_off,), scale_chol.dtype)
    A = A.at[..., tril[0], tril[1]].set(off)
    A = jnp.where(jnp.eye(p, dtype=bool), jnp.sqrt(c2)[..., None, :], A)
    LA = scale_chol @ A
    return LA @ jnp.swapaxes(LA, -1, -2)


def sample_cl_binned_invwishart_TE(key, cfg: ClModelConfig, alm: jnp.ndarray):
    """TE-coupled binned C_ell draw: per bin a 2x2 (T,E) inverse-Wishart
    block and a scalar inverse-gamma for B.

    The full inverse-Wishart of the reference
    (sample_Cls_inverse_wishart, comm_Cl_mod.f90:865-1006) for the
    poltype-1 case. alm: (3, nl, nm) [T, E, B]. Returns
    (cl_te (nbins, 2, 2), cl_b (nbins,)).
    """
    idx = jnp.asarray(bin_index_table(cfg))
    nbins = len(cfg.bin_starts)
    nm = alm.shape[-1]
    eps = jnp.concatenate([jnp.ones((1,)), 2.0 * jnp.ones((nm - 1,))])
    # per-ell 2x2 scatter: S_l[X,Y] = sum_m eps Re(a_X conj(a_Y))
    prod = jnp.einsum("m,xlm,ylm->xyl", eps, alm[:2], jnp.conj(alm[:2])).real
    onehot = jax.nn.one_hot(idx, nbins, dtype=prod.dtype)
    S_b = jnp.einsum("xyl,lb->bxy", prod, onehot)
    ell = jnp.arange(cfg.lmax + 1, dtype=prod.dtype)
    nmodes = (2.0 * ell + 1.0) @ onehot
    # C | a ~ IW(S_b, nu = n_b - p - 1) under the flat prior (p = 2)
    k1, k2 = jax.random.split(key)
    nu = jnp.maximum(nmodes - 3.0, 2.1)
    Sb_reg = S_b + 1e-12 * jnp.eye(2)
    inv_chol = jnp.linalg.cholesky(jnp.linalg.inv(Sb_reg))
    keys = jax.random.split(k1, nbins)
    W = jax.vmap(lambda k, L, n: _wishart_bartlett(k, L, n, 2))(
        keys, inv_chol, nu)
    cl_te = jnp.linalg.inv(W + 1e-30 * jnp.eye(2))
    # B: scalar inverse-gamma
    sigB = sigma_ell(alm[2:3], cfg.lmax)
    wl = 2.0 * ell + 1.0
    sB = jnp.einsum("l,lb->b", (wl * sigB[0]), onehot)
    g = jax.random.gamma(k2, jnp.maximum((nmodes - 2.0) / 2.0, 0.5))
    cl_b = (sB / 2.0) / g
    return cl_te, cl_b


def sqrt_psd(mat: jnp.ndarray) -> jnp.ndarray:
    """Symmetric PSD matrix square root via eigh (negative eigenvalues
    clipped) — the reference's compute_hermitian_root(., 0.5) used to build
    sqrtS_mat (comm_Cl_mod.f90 updateS :316-385). Batched over leading dims.
    The SYMMETRIC root (not Cholesky) keeps the CG operator
    S^1/2 A^T N^-1 A S^1/2 self-adjoint."""
    w, v = jnp.linalg.eigh(mat)
    w = jnp.sqrt(jnp.maximum(w, 0.0))
    return jnp.einsum("...ij,...j,...kj->...ik", v, w, v)


def full_cl_matrix(cl_te, cl_b, bin_idx) -> jnp.ndarray:
    """Assemble the (nl, 3, 3) Stokes covariance from per-bin TE blocks and
    B scalars (the output of sample_cl_binned_invwishart_TE)."""
    nl = bin_idx.shape[0]
    out = jnp.zeros((nl, 3, 3), cl_b.dtype)
    out = out.at[:, :2, :2].set(cl_te[bin_idx])
    return out.at[:, 2, 2].set(cl_b[bin_idx])


def apply_sqrtS_TE(cl_te, cl_b, bin_idx, alm):
    """Matrix S^1/2 with T-E coupling: alm (3, nl, nm) -> L_l @ alm where
    L_l = chol(C_l(2x2)) acts on (T,E), sqrt(Cl_B) on B (the reference's
    sqrtS with poltype-1 coupled blocks, comm_Cl_mod.f90:550-601)."""
    L = jnp.linalg.cholesky(cl_te + 1e-30 * jnp.eye(2))
    L_l = L[bin_idx]                                  # (nl, 2, 2)
    te = jnp.einsum("lxy,ylm->xlm", L_l, alm[:2])
    b = alm[2:] * jnp.sqrt(jnp.maximum(cl_b[bin_idx], 0.0))[None, :, None]
    return jnp.concatenate([te, b], axis=0)


def sample_cl_powerlaw_amp(key, cfg: ClModelConfig, alm: jnp.ndarray,
                           beta: jnp.ndarray, lmin: int = 2):
    """Conditional amplitude draw for the power_law/exp/gauss Cl models
    (comm_Cl_mod.f90:1251-1266): with Cl = amp * g_l(beta), the conditional
    P(amp | a) is inverse-gamma with
      shape = (sum_l (2l+1) - 2)/2,  scale = sum_lm eps|a_lm|^2 / g_l / 2.
    Returns (nmaps,) amp draws."""
    ell = jnp.arange(cfg.lmax + 1, dtype=jnp.result_type(float))
    x = jnp.maximum(ell, 1.0) / cfg.ell_pivot
    if cfg.kind == "power_law":
        shape_l = x ** beta[:, None]
    elif cfg.kind == "exp":
        shape_l = jnp.exp(beta[:, None] * x)
    else:
        shape_l = jnp.exp(-0.5 * (x * beta[:, None]) ** 2)
    g_l = 2.0 * jnp.pi * shape_l / jnp.maximum(ell * (ell + 1.0), 1.0)
    sig = sigma_ell(alm, cfg.lmax)                   # (nmaps, nl)
    wl = (2.0 * ell + 1.0) * (ell >= lmin)
    scale = jnp.sum(wl * sig / jnp.maximum(g_l, 1e-300), axis=-1) / 2.0
    ndof = jnp.sum(wl)
    sh = jnp.maximum((ndof - 2.0) / 2.0, 0.5)
    g = jax.random.gamma(key, jnp.broadcast_to(sh, scale.shape))
    return scale / g


def wishart_dof_check(cfg: ClModelConfig) -> np.ndarray:
    """Modes per bin (for posdef/ok checks mirroring comm_Cl_mod:946-979)."""
    idx = bin_index_table(cfg)
    wl = 2 * np.arange(cfg.lmax + 1) + 1
    return np.bincount(idx, weights=wl, minlength=len(cfg.bin_starts))
