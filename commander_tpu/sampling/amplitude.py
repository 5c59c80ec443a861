"""Conditional Gaussian amplitude sampling via preconditioned CG.

The heart of the Gibbs sampler — TPU-native counterpart of the reference's
constrained-realization machinery:
  * operator     cr_matmulA            (comm_cr_mod.f90:771-1024)
  * RHS          cr_computeRHS         (comm_cr_mod.f90:542-769)
  * precond      updateDiffPrecond_diagonal / applyDiffPrecond_diagonal
                 (comm_diffuse_comp_mod.f90:1313-1558, 2186-2235)
  * driver       sample_amps_by_CG     (comm_signal_mod.f90:154-216)

System (fluctuation form): with A_b = B_b sum_c F_bc, prior S = diag(Cl),
solve (1 + S^1/2 A^T N^-1 A S^1/2) u = S^1/2 A^T N^-1 d
      + S^1/2 A^T N^-1/2 eta1 + eta2,   a = S^1/2 u
which draws a ~ P(a | d, Cl, theta). Everything is batched: the per-band
SHTs run as one batched transform over (band x Stokes), and the per-(ell)
block preconditioner is one batched ncomp x ncomp inverse (what the
reference assembles in serial Fortran loops).

Round-1 scope: all bands at one (nside, lmax); constant (per-Stokes) mixing
F; diagonal noise. Pixel-varying mixing and mixed resolutions ride on the
same structure (masks + per-group plans) and land with the spectral-index
sampler.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..model.cl import apply_sqrtS
from ..ops.cg import CGResult, pcg
from ..sphere import sht
from ..sphere.alm import (alm_dot, eps_weights, random_alm_white, real_m0,
                          triangle_mask)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AmplitudeSystem:
    """All arrays defining one CG amplitude solve (a pytree of device arrays).

    Shapes: nband=B, ncomp=C, nmaps=S (1 or 3), npix=P, nl=lmax+1, nm=mmax+1.
    """
    F: jnp.ndarray          # (B, C, S) mixing matrix in band units
    bl: jnp.ndarray         # (B, S, nl) beam * pixel window per band
    inv_rms2: jnp.ndarray   # (B, S, P) = mask / rms^2  (N^-1 diagonal)
    inv_rms: jnp.ndarray    # (B, S, P) = mask / rms    (N^-1/2 diagonal)
    cl: jnp.ndarray         # (C, S, nl) prior spectra
    data: jnp.ndarray       # (B, S, P) band maps
    tri: jnp.ndarray        # (nl, nm) triangle mask
    # Optional WMAP-style QU pixel covariance (comm_N_QUcov_mod.f90):
    # when set, the Q,U rows of invN use these 2x2 blocks instead of the
    # diagonal (T stays diagonal).
    inv_qu: jnp.ndarray | None = None        # (B, P, 2, 2)
    sqrt_inv_qu: jnp.ndarray | None = None   # (B, P, 2, 2)
    # Optional pixel-dependent mixing (per-pixel spectral indices): when
    # set, the operator uses the reference's Y -> F(p) -> YtW -> B path
    # (evalDiffuseBand, comm_diffuse_comp_mod.f90:2027-2109) instead of the
    # constant-mixing alm-space multiply. F then holds the pixel MEAN
    # mixing (used by the preconditioner, like the reference's F_mean).
    F_pix: jnp.ndarray | None = None         # (B, C, S, P)
    # Optional Stokes-coupled prior: symmetric root of the per-(comp, ell)
    # Stokes covariance (TE coupling; comm_Cl_mod.f90 updateS builds
    # sqrtS_mat via compute_hermitian_root). When set it REPLACES the
    # diagonal sqrt(cl) multiply; cl must hold the matching diagonal
    # (used by the preconditioners).
    sqrtS_mat: jnp.ndarray | None = None     # (C, nl, S, S)
    # Optional per-component ell window (COMP_LMAX_AMP/LMIN_AMP): the
    # reference's lmax projection masks (comm_cr_mod.f90:858-860). Applied
    # multiplicatively to the prior spectrum each time Cl is re-evaluated
    # (zero prior power = exact confinement since a = S^1/2 x).
    ell_mask: jnp.ndarray | None = None      # (C, S, nl)


def apply_invN(sys: "AmplitudeSystem", m):
    """N^-1 m with optional QU covariance blocks."""
    out = m * sys.inv_rms2
    if sys.inv_qu is not None:
        msk = (sys.inv_rms2[:, 1:] > 0).astype(m.dtype)
        qu = jnp.einsum("bpij,bjp->bip", sys.inv_qu, m[:, 1:] * msk, precision=jax.lax.Precision.HIGHEST)
        out = jnp.concatenate([out[:, :1], qu * msk], axis=1)
    return out


def apply_sqrt_invN(sys: "AmplitudeSystem", m):
    """N^-1/2 m with optional QU covariance blocks."""
    out = m * sys.inv_rms
    if sys.sqrt_inv_qu is not None:
        msk = (sys.inv_rms[:, 1:] > 0).astype(m.dtype)
        qu = jnp.einsum("bpij,bjp->bip", sys.sqrt_inv_qu, m[:, 1:] * msk, precision=jax.lax.Precision.HIGHEST)
        out = jnp.concatenate([out[:, :1], qu * msk], axis=1)
    return out


def build_system(F, bl, rms, cl, data, mask=None, cov_qu=None,
                 cl_mat=None, ell_mask=None) -> AmplitudeSystem:
    """cl_mat: optional (C, nl, S, S) Stokes-coupled prior covariance
    (TE coupling); when given, cl is overridden by its diagonal and the
    operator uses the symmetric matrix root."""
    F = jnp.asarray(F)
    if F.ndim == 2:
        F = F[..., None].repeat(data.shape[1], axis=-1)
    good = jnp.isfinite(rms) & (rms > 0)
    if mask is not None:
        good = good & (jnp.asarray(mask) > 0.5)
    safe = jnp.where(good, rms, 1.0)
    inv_rms = jnp.where(good, 1.0 / safe, 0.0)
    nl = bl.shape[-1]
    # tri must follow the system's real dtype: an f64 mask would upcast
    # every sqrtS product under jax_enable_x64 (f32 systems then carry
    # complex128 alms while t/p rows stay f32 — a while_loop carry
    # dtype mismatch in the joint CG)
    tri = jnp.asarray(triangle_mask(nl, nl),
                      dtype=jnp.asarray(data).real.dtype)
    inv_qu = sqrt_inv_qu = None
    if cov_qu is not None:
        inv_qu = jnp.linalg.inv(jnp.asarray(cov_qu))
        chol = jnp.linalg.cholesky(inv_qu)
        sqrt_inv_qu = jnp.swapaxes(chol, -1, -2)
    sqrtS_mat = None
    if cl_mat is not None:
        from ..model.cl import sqrt_psd
        cl_mat = jnp.asarray(cl_mat)
        sqrtS_mat = sqrt_psd(cl_mat)
        cl = jnp.einsum("clss->csl", cl_mat)
    cl = jnp.asarray(cl)
    if ell_mask is not None:
        ell_mask = jnp.asarray(ell_mask)
        cl = cl * ell_mask
    return AmplitudeSystem(F=F, bl=jnp.asarray(bl), inv_rms2=inv_rms**2,
                           inv_rms=inv_rms, cl=cl,
                           data=jnp.asarray(data), tri=tri,
                           inv_qu=inv_qu, sqrt_inv_qu=sqrt_inv_qu,
                           sqrtS_mat=sqrtS_mat, ell_mask=ell_mask)


def _sqrtS(sys: AmplitudeSystem, u):
    # real_m0 keeps the solve in the one-dof-per-(l, m=0) subspace of real
    # fields (see sphere.alm.real_m0); applied here so every operator/rhs
    # evaluation stays projected.
    if sys.sqrtS_mat is not None:
        # Stokes-coupled symmetric root (TE coupling); self-adjoint, so the
        # same einsum serves both S^1/2 applications in the CG operator.
        out = jnp.einsum("clxy,cylm->cxlm", sys.sqrtS_mat, u, precision=jax.lax.Precision.HIGHEST)
        return real_m0(out * sys.tri)
    return real_m0(apply_sqrtS(sys.cl, u) * sys.tri)


def _project_bands(sys: AmplitudeSystem, plan, a):
    """a (C,S,nl,nm) -> band alms (B,S,nl,nm): alm_b = bl_b * sum_c F_bc a_c.
    Reference: the getBand accumulation in cr_matmulA (comm_cr_mod:843-954).
    """
    alm_b = jnp.einsum("bcs,cslm->bslm", sys.F, a, precision=jax.lax.Precision.HIGHEST)
    return alm_b * sys.bl[..., None]


def _project_bands_T(sys: AmplitudeSystem, plan, alm_b):
    """Transpose of _project_bands: (B,S,nl,nm) -> (C,S,nl,nm)."""
    alm_b = alm_b * sys.bl[..., None]
    return jnp.einsum("bcs,bslm->cslm", sys.F, alm_b, precision=jax.lax.Precision.HIGHEST)


def _synth(plan, alm_b):
    """Batched band synthesis: spin-0 for S=1, T+spin-2 for S=3."""
    if alm_b.shape[-3] == 3:
        return sht.alm2map_teb(plan, alm_b)
    return sht.alm2map(plan, alm_b)


def _synth_T(plan, maps):
    if maps.shape[-2] == 3:
        return sht.alm2map_teb_adjoint(plan, maps)
    return sht.alm2map_adjoint(plan, maps)


def _pix_weights(plan):
    """Per-pixel quadrature weight w(p) (ring weight of the pixel's ring)."""
    return plan.ring_weight[plan.pix_idx // plan.pmax]


def _forward_pixmix(sys: AmplitudeSystem, plan, a):
    """Band maps with pixel mixing: B_b YtW [sum_c F_bc(p) (Y a_c)(p)].

    YtW here is the eps-metric adjoint pair Yt(w .) so that the operator
    transpose below is EXACT (the quadrature map2alm differs only in the
    m=0 spin-2 epsilon convention)."""
    u = _synth(plan, a)                                # (C, S, P)
    s_b = jnp.einsum("bcsp,csp->bsp", sys.F_pix, u, precision=jax.lax.Precision.HIGHEST)
    alm_b = _synth_T(plan, s_b * _pix_weights(plan)) * sys.bl[..., None]
    return _synth(plan, alm_b)


def _forward_pixmix_T(sys: AmplitudeSystem, plan, g_b):
    """Exact adjoint of _forward_pixmix."""
    alm_b = _synth_T(plan, g_b) * sys.bl[..., None]
    t_b = _synth(plan, alm_b) * _pix_weights(plan)     # adjoint of Yt(w .)
    v_c = jnp.einsum("bcsp,bsp->csp", sys.F_pix, t_b, precision=jax.lax.Precision.HIGHEST)
    return _synth_T(plan, v_c)


def _band_groups(sys: AmplitudeSystem, bc: int, extra=()):
    """Pad the band axis to a multiple of bc and reshape to (G, bc, ...).
    Padded bands have inv_rms = inv_rms2 = 0, so they contribute
    nothing to any N^-1-weighted accumulation."""
    B = sys.F.shape[0]
    G = -(-B // bc)
    Bp = G * bc

    def pg(t):
        t = jnp.pad(t, ((0, Bp - B),) + ((0, 0),) * (t.ndim - 1))
        return t.reshape((G, bc) + t.shape[1:])
    return G, tuple(pg(t) for t in (sys.F, sys.bl) + tuple(extra))


def _bands_normal_chunked(sys: AmplitudeSystem, plan, a, bc: int):
    """A^T N^-1 A a with bands processed bc at a time.

    The (B, S, P) pixel-space intermediates never exist at the full band
    count — the single-chip HBM lever for nside-2048 multi-band systems
    (BASELINE config 4: 9 bands x 50M pixels of synthesis temporaries
    exceed one v5e's 16 GB when batched; the reference's cr_matmulA loops
    bands serially for the same reason, comm_cr_mod.f90:843-954).

    When bc divides B the groups are taken by dynamic_slice inside a
    fori_loop — NO full-size grouped copies are ever materialized (the
    padded-reshape variant put another 3x(B,S,P) of HBM temporaries on
    the device, defeating the point at nside 2048); otherwise the padded
    lax.scan fallback runs."""
    hi = jax.lax.Precision.HIGHEST
    B = sys.F.shape[0]

    def one(F_, bl_, iv_, carry):
        alm_b = jnp.einsum("bcs,cslm->bslm", F_, a,
                           precision=hi) * bl_[..., None]
        m = _synth(plan, alm_b) * iv_
        r_b = _synth_T(plan, m) * bl_[..., None]
        return carry + jnp.einsum("bcs,bslm->cslm", F_, r_b,
                                  precision=hi)

    if B % bc == 0:
        def body(g, carry):
            sl = lambda t: jax.lax.dynamic_slice_in_dim(t, g * bc, bc, 0)
            return one(sl(sys.F), sl(sys.bl), sl(sys.inv_rms2), carry)
        return jax.lax.fori_loop(0, B // bc, body, jnp.zeros_like(a))

    G, (Fg, blg, ivg) = _band_groups(sys, bc, extra=(sys.inv_rms2,))

    def body(carry, xs):
        Fg_, blg_, ivg_ = xs
        return one(Fg_, blg_, ivg_, carry), None
    r, _ = jax.lax.scan(body, jnp.zeros_like(a), (Fg, blg, ivg))
    return r


def apply_A(sys: AmplitudeSystem, plan, u, band_chunk: int = 0):
    """(1 + S^1/2 A^T N^-1 A S^1/2) u — one batched Y and Yt over all
    bands, or band groups of band_chunk when set (diagonal-noise systems
    only; HBM-constrained large-nside runs)."""
    a = _sqrtS(sys, u)
    if sys.F_pix is not None:
        m = apply_invN(sys, _forward_pixmix(sys, plan, a))
        r = _forward_pixmix_T(sys, plan, m)
        return u + _sqrtS(sys, r)
    if band_chunk and sys.inv_qu is None \
            and sys.F.shape[0] > band_chunk:
        return u + _sqrtS(sys, _bands_normal_chunked(sys, plan, a,
                                                     band_chunk))
    alm_b = _project_bands(sys, plan, a)
    m = _synth(plan, alm_b)                      # batch (B, S)
    m = apply_invN(sys, m)
    r_b = _synth_T(plan, m)
    r = _project_bands_T(sys, plan, r_b)
    return u + _sqrtS(sys, r)


def compute_rhs(sys: AmplitudeSystem, plan, key=None, band_chunk: int = 0):
    """S^1/2 A^T N^-1 d (+ fluctuation terms when key is given).

    Reference: cr_computeRHS (comm_cr_mod.f90:542-769) — the eta1 term enters
    as N^-1/2 eta1 added to the inverse-variance-weighted residual, eta2 as a
    white alm draw (:600-612, :689-766). band_chunk processes bands in
    groups like apply_A(band_chunk=...) (per-group eta1 streams keyed by
    fold_in; diagonal-noise systems only).
    """
    k1 = k2 = None
    if key is not None:
        k1, k2 = jax.random.split(key)
    if band_chunk and sys.F_pix is None and sys.inv_qu is None \
            and sys.F.shape[0] > band_chunk:
        hi = jax.lax.Precision.HIGHEST
        C = sys.cl.shape[0]
        B = sys.F.shape[0]
        nl, nm = sys.tri.shape
        cdt = jnp.complex128 if sys.data.dtype == jnp.float64 \
            else jnp.complex64
        acc0 = jnp.zeros((C,) + sys.data.shape[1:2] + (nl, nm), cdt)

        def one(F_, bl_, iv2_, iv_, d_, g, carry):
            w = d_ * iv2_
            if k1 is not None:
                eta1 = jax.random.normal(jax.random.fold_in(k1, g),
                                         d_.shape, d_.dtype)
                w = w + iv_ * eta1
            r_b = _synth_T(plan, w) * bl_[..., None]
            return carry + jnp.einsum("bcs,bslm->cslm", F_, r_b,
                                      precision=hi)

        if B % band_chunk == 0:
            bc = band_chunk

            def body(g, carry):
                sl = lambda t: jax.lax.dynamic_slice_in_dim(t, g * bc,
                                                            bc, 0)
                return one(sl(sys.F), sl(sys.bl), sl(sys.inv_rms2),
                           sl(sys.inv_rms), sl(sys.data), g, carry)
            r = jax.lax.fori_loop(0, B // bc, body, acc0)
        else:
            G, (Fg, blg, iv2g, ivg, dg) = _band_groups(
                sys, band_chunk,
                extra=(sys.inv_rms2, sys.inv_rms, sys.data))

            def body(carry, xs):
                Fg_, blg_, iv2_, iv_, d_, g = xs
                return one(Fg_, blg_, iv2_, iv_, d_, g, carry), None
            r, _ = jax.lax.scan(body, acc0,
                                (Fg, blg, iv2g, ivg, dg, jnp.arange(G)))
        rhs = _sqrtS(sys, r)
    else:
        w = apply_invN(sys, sys.data)
        if key is not None:
            eta1 = jax.random.normal(k1, sys.data.shape, sys.data.dtype)
            w = w + apply_sqrt_invN(sys, eta1)
        if sys.F_pix is not None:
            rhs = _sqrtS(sys, _forward_pixmix_T(sys, plan, w))
        else:
            r_b = _synth_T(plan, w)
            rhs = _sqrtS(sys, _project_bands_T(sys, plan, r_b))
    if key is not None:
        eta2 = random_alm_white(k2, rhs.shape[:-2] + rhs.shape[-2:],
                                sys.data.dtype) * sys.tri
        rhs = rhs + eta2
    return rhs


def build_preconditioner(sys: AmplitudeSystem, plan):
    """Block-diagonal preconditioner: per (ell, Stokes) ncomp x ncomp blocks
    M = I + S^1/2 F^T B^T <N^-1> B F S^1/2, with N^-1 approximated by its
    harmonic diagonal kappa_b = sum_p invN_bp / (4 pi) — the same
    approximation as updateDiffPrecond_diagonal
    (comm_diffuse_comp_mod.f90:1313-1558), built as ONE batched inverse.
    Returns apply(r) closure.
    """
    # kappa_bs: harmonic-space diagonal of Yt invN Y = sum_p invN_p |Y_lm(p)|^2
    # ~ sum_p invN_p / (4 pi), exact for uniform invN.
    kappa = jnp.sum(sys.inv_rms2, axis=-1) / (4.0 * np.pi)
    sqcl = jnp.sqrt(jnp.maximum(sys.cl, 0.0))      # (C,S,nl)
    fb = jnp.einsum("bcs,bsl->bcsl", sys.F, sys.bl)  # F_bc b_l
    # G[s,l,c,d] = sum_b F_bc b_l F_bd b_l kappa_b
    G = jnp.einsum("bcsl,bdsl,bs->slcd", fb, fb, kappa, precision=jax.lax.Precision.HIGHEST)
    S_half = jnp.einsum("csl->slc", sqcl)
    # dtype-pinned eye: the f64 default under jax_enable_x64 would
    # upcast the whole preconditioner (and then the CG carry) for f32
    # systems
    M = jnp.eye(sys.F.shape[1], dtype=G.dtype) \
        + S_half[..., :, None] * G * S_half[..., None, :]
    # Jacobi equilibration before the batched inverse: at production lmax
    # the S^1/2 G S^1/2 entries span ~1e10 of dynamic range and a plain
    # f32 inverse loses the small eigendirections (CG stalls at ~1e-1
    # residual at nside 512 / lmax 1024 in float32); scaling by the
    # diagonal keeps the inverse accurate in either precision.
    d = jnp.sqrt(jnp.clip(jnp.diagonal(M, axis1=-2, axis2=-1), 1e-30))
    E = 1.0 / d
    Mn = M * E[..., :, None] * E[..., None, :]
    M_inv = jnp.linalg.inv(Mn) * E[..., :, None] * E[..., None, :]

    def apply(r):
        return jnp.einsum("slcd,dslm->cslm", M_inv, r, precision=jax.lax.Precision.HIGHEST)

    return apply


def build_preconditioner_pseudoinv(sys: AmplitudeSystem, plan):
    """Pseudo-inverse preconditioner (CG_PRECOND_TYPE = pseudoinv).

    TPU-native form of the reference's second preconditioner family
    (initDiffPrecond_pseudoinv / updateDiffPrecond_pseudoinv /
    applyDiffPrecond_pseudoinv, comm_diffuse_comp_mod.f90:1255-1293,
    1560-1660, 2238-2380): per (Stokes, ell) build the tall "design" matrix

        U = [ alpha_b  b_l  F_bc  sqrt(Cl_c) ]   (data rows, one per band)
            [ I_C                           ]   (prior rows)

    with alpha_b = sqrt(sum tau^2 / sum tau), tau = N^-1 diag per band
    (comm_N_rms_mod.f90:219-245), so the CG operator is approximately
    A ~ U^T blockdiag(T_b, I) U with T_b the alm-normalized band noise.
    The preconditioner is M^-1 = U^+ blockdiag(T_b^-1, I) (U^+)^T where
    T_b^-1 is applied EXACTLY in pixel space (Yt W N W Y scaled by
    alpha^2 — the WY/N/YtW sequence of applyDiffPrecond_pseudoinv),
    which is what lets pseudoinv handle strongly inhomogeneous noise.
    All (Stokes, ell) pseudo-inverses are one batched jnp.linalg.pinv.
    """
    B, C = sys.F.shape[0], sys.F.shape[1]
    S, nl = sys.bl.shape[1], sys.bl.shape[2]
    tau = sys.inv_rms2                                   # (B,S,P)
    s1 = jnp.sum(tau, axis=-1)
    s2 = jnp.sum(tau * tau, axis=-1)
    alpha = jnp.sqrt(jnp.where(s1 > 0, s2 / jnp.maximum(s1, 1e-300), 0.0))
    sqcl = jnp.sqrt(jnp.maximum(sys.cl, 0.0))            # (C,S,nl)
    # U_data[s,l,b,c] = alpha[b,s] * bl[b,s,l] * F[b,c,s] * sqcl[c,s,l]
    U_data = jnp.einsum("bs,bsl,bcs,csl->slbc", alpha, sys.bl, sys.F, sqcl, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.broadcast_to(jnp.eye(C, dtype=U_data.dtype), (S, nl, C, C))
    U = jnp.concatenate([U_data, eye], axis=2)           # (S,nl,B+C,C)
    pinvU = jnp.linalg.pinv(U)                           # (S,nl,C,B+C)
    P_data = pinvU[..., :B]                              # (S,nl,C,B)
    P_prior = pinvU[..., B:]                             # (S,nl,C,C)
    # Pixel-space N with mask (N=0 on masked pixels, like invN=0).
    N_pix = jnp.where(sys.inv_rms2 > 0, 1.0 / jnp.maximum(sys.inv_rms2, 1e-300), 0.0)
    w_pix = _pix_weights(plan)
    alpha2 = alpha ** 2

    def apply(r):
        r = real_m0(r * sys.tri)
        # data section: band alms from (U^+)^T, then T_b^-1, then U^+
        alm_b = jnp.einsum("slcb,cslm->bslm", P_data, r, precision=jax.lax.Precision.HIGHEST)
        m = _synth(plan, alm_b) * w_pix                  # W Y
        m = m * N_pix                                    # N
        alm_b = _synth_T(plan, m * w_pix)                # Yt W
        alm_b = alm_b * alpha2[..., None, None]
        z = jnp.einsum("slcb,bslm->cslm", P_data, alm_b, precision=jax.lax.Precision.HIGHEST)
        # prior section: P_prior P_prior^T r
        w2 = jnp.einsum("sldc,dslm->cslm", P_prior, r, precision=jax.lax.Precision.HIGHEST)
        z = z + jnp.einsum("slcd,dslm->cslm", P_prior, w2, precision=jax.lax.Precision.HIGHEST)
        return real_m0(z * sys.tri)

    return apply


# ---------------------------------------------------------------------------
# Low-ell dense preconditioner (CMB-style; updateLowlPrecond,
# comm_diffuse_comp_mod.f90:5098-5259)
# ---------------------------------------------------------------------------

def _lowl_basis_size(C, S, L):
    return C * S * (L + 1) ** 2


def _lowl_indices(L):
    """Triangle (l, m>0) index lists for the low-ell real-dof basis."""
    mm, ll = np.meshgrid(np.arange(1, L + 1), np.arange(L + 1))
    keep = mm <= ll
    return np.arange(L + 1), ll[keep], mm[keep]


def pack_lowl(a, L):
    """Restrict alm (C,S,nl,nm) to the l<=L triangle and pack into a real
    vector under which the eps metric is the standard dot:
    [m=0: Re; m>0: sqrt2 Re, sqrt2 Im] — (L+1)^2 dofs per (c,s)."""
    l0, ll, mm = _lowl_indices(L)
    sq2 = np.sqrt(2.0)
    re0 = jnp.real(a[..., l0, 0])
    re = sq2 * jnp.real(a[..., ll, mm])
    im = sq2 * jnp.imag(a[..., ll, mm])
    return jnp.concatenate([re0, re, im], axis=-1)


def unpack_lowl(v, C, S, L, nl, nm, dtype):
    """Inverse of pack_lowl, zero-padded to (C,S,nl,nm)."""
    l0, ll, mm = _lowl_indices(L)
    n0, nr = L + 1, len(ll)
    sq2 = np.sqrt(2.0)
    out = jnp.zeros((C, S, nl, nm), dtype)
    out = out.at[..., l0, 0].set(v[..., :n0].astype(dtype))
    rest = (v[..., n0:n0 + nr] + 1j * v[..., n0 + nr:]) / sq2
    return out.at[..., ll, mm].set(rest.astype(dtype))


def lowres_system(sys: AmplitudeSystem, nside_lo: int, lmax_lo: int):
    """Degrade an AmplitudeSystem to (nside_lo, lmax_lo) for the low-ell
    dense preconditioner — the reference evaluates its low-ell operator
    columns on nside_chisq_lowres with invN_lowres
    (comm_diffuse_comp_mod.f90:5117-5160). Inverse-variance co-add of
    N^-1 over child pixels; beams/Cl truncated in ell."""
    from ..sphere.healpix import udgrade_indices
    from ..sphere.sht import get_plan
    idx = np.asarray(udgrade_indices(
        int(round(np.sqrt(sys.inv_rms2.shape[-1] / 12))), nside_lo))
    inv_rms2_lo = jnp.sum(sys.inv_rms2[..., idx], axis=-1)
    inv_rms_lo = jnp.sqrt(inv_rms2_lo)
    nl_lo = lmax_lo + 1
    sys_lo = dataclasses.replace(
        sys, inv_rms2=inv_rms2_lo, inv_rms=inv_rms_lo,
        bl=sys.bl[..., :nl_lo], cl=sys.cl[..., :nl_lo],
        data=jnp.zeros_like(inv_rms2_lo),
        tri=jnp.asarray(triangle_mask(nl_lo, nl_lo)),
        inv_qu=None, sqrt_inv_qu=None,
        F_pix=None if sys.F_pix is None else jnp.mean(sys.F_pix[..., idx], -1),
        sqrtS_mat=None if sys.sqrtS_mat is None else sys.sqrtS_mat[:, :nl_lo])
    plan_lo = get_plan(nside_lo, lmax_lo, spin2=(sys.bl.shape[1] == 3))
    return sys_lo, plan_lo


def build_preconditioner_lowl(sys: AmplitudeSystem, plan, lmax_lowl: int,
                              nside_lo: int | None = None):
    """Hybrid preconditioner: dense inverse over ALL components' modes with
    l <= lmax_lowl, block-diagonal elsewhere.

    The dense block is the exact CG operator of a degraded system applied
    to every unit vector of the low-ell real-dof basis — the reference's
    updateLowlPrecond loop over (l,m) unit alms with lowres invN
    (comm_diffuse_comp_mod.f90:5098-5259), here ONE vmapped batch of
    operator applications. applyLowlPrecond (:5259-…) replaces the
    diagonal result on the low-ell subspace; same here.
    """
    C, S = sys.F.shape[1], sys.bl.shape[1]
    nl, nm = sys.tri.shape
    L = lmax_lowl
    if nside_lo is None:
        nside_lo = max(2, int(2 ** np.ceil(np.log2(max(L, 2)))) // 2)
    lmax_lo = min(2 * L, 3 * nside_lo - 1, nl - 1)
    sys_lo, plan_lo = lowres_system(sys, nside_lo, lmax_lo)
    n = _lowl_basis_size(C, S, L)
    basis = jnp.eye(n, dtype=sys.bl.dtype)
    cdtype = jnp.complex128 if sys.bl.dtype == jnp.float64 else jnp.complex64

    def col(v):
        u = unpack_lowl(v.reshape(C, S, -1), C, S, L, lmax_lo + 1,
                        lmax_lo + 1, cdtype)
        return pack_lowl(apply_A(sys_lo, plan_lo, u), L).reshape(-1)

    M_dense = jax.lax.map(col, basis, batch_size=min(n, 256)).T
    M_dense = 0.5 * (M_dense + M_dense.T)
    M_dense_inv = jnp.linalg.inv(M_dense)
    diag_apply = build_preconditioner(sys, plan)

    def apply(r):
        z = diag_apply(r)
        v = pack_lowl(r, L).reshape(-1)
        zl = (M_dense_inv @ v).reshape(C, S, -1)
        zl = unpack_lowl(zl, C, S, L, nl, nm, r.dtype)
        keep = jnp.zeros((nl, 1), z.real.dtype).at[: L + 1].set(1.0)
        return z * (1.0 - keep) + zl * keep

    return apply


_PRECONDS = {"diagonal": build_preconditioner,
             "pseudoinv": build_preconditioner_pseudoinv}


def sample_amplitudes(sys: AmplitudeSystem, plan, key=None, x0=None,
                      tol=1e-8, maxiter=300, precond: str = "diagonal",
                      lowl_lmax: int = -1) -> tuple[jnp.ndarray, CGResult]:
    """Draw component amplitudes a ~ P(a | d, Cl, theta) (or the Wiener mean
    when key is None). Returns (a, CGResult). Reference driver:
    sample_amps_by_CG (comm_signal_mod.f90:154-216). precond selects the
    reference's CG_PRECOND_TYPE in {diagonal, pseudoinv}; lowl_lmax >= 0
    additionally switches on the dense low-ell block (LMAX_PRECOND_LOWL)."""
    rhs = compute_rhs(sys, plan, key)
    if lowl_lmax >= 0:
        M_inv = build_preconditioner_lowl(sys, plan, lowl_lmax)
    else:
        M_inv = _PRECONDS[precond](sys, plan)
    res = pcg(partial(apply_A, sys, plan), rhs, x0=x0, M_inv=M_inv,
              dot=alm_dot, tol=tol, maxiter=maxiter)
    a = _sqrtS(sys, res.x)
    return a, res


def sample_amplitudes_chunked(sys: AmplitudeSystem, plan, key=None,
                              tol=1e-8, maxiter=300, chunk=10,
                              precond: str = "diagonal",
                              band_chunk: int = 0,
                              dump_every: int = 0, dump_fn=None):
    """Production CR draw for LARGE plans: the same PCG iteration as
    sample_amplitudes but executed `chunk` iterations per jit call with
    the (x, r, z, p, rz) state carried across calls.

    Two reasons this is the big-run path (BASELINE.md round 3): the
    monolithic lax.while_loop MISCOMPUTES on the TPU runtime when a
    >2 GiB constant is live, and >100-iteration single calls have crashed
    the axon TPU worker; chunked execution is bit-identical to the
    monolithic loop on CPU and converges at nside 1024 / lmax 2048 in
    20 iterations where the monolithic loop diverged. Returns
    (a, CGResult)."""
    from ..ops.cg import CGResult

    @jax.jit
    def _init(sys, plan, key):
        rhs = compute_rhs(sys, plan, key, band_chunk=band_chunk)
        M_inv = _PRECONDS[precond](sys, plan)
        z0 = M_inv(rhs)
        bnorm = jnp.sqrt(alm_dot(rhs, rhs))
        return (jnp.zeros_like(rhs), rhs, z0, z0, alm_dot(rhs, z0), bnorm)

    @partial(jax.jit, static_argnums=3)
    def _chunk(sys, plan, st, n):
        M_inv = _PRECONDS[precond](sys, plan)
        A = partial(apply_A, sys, plan, band_chunk=band_chunk)
        x, r, z, p, rz, bnorm = st

        def body(i, s):
            x, r, z, p, rz = s
            Ap = A(p)
            alpha = rz / alm_dot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M_inv(r)
            rz_new = alm_dot(r, z)
            p = z + (rz_new / rz) * p
            return (x, r, z, p, rz_new)

        x, r, z, p, rz = jax.lax.fori_loop(0, n, body, (x, r, z, p, rz))
        rel = jnp.sqrt(alm_dot(r, r)) / bnorm
        return (x, r, z, p, rz, bnorm), rel.astype(jnp.float32)

    st = _init(sys, plan, key)
    iters = 0
    rel = jnp.asarray(jnp.inf)
    while iters < maxiter:
        n = min(chunk, maxiter - iters)
        if dump_every > 0:
            # align chunk boundaries to the dump cadence so the dumped
            # solution is exactly the every-Nth-iteration state
            # (OUTPUT_EVERY_NTH_CG_ITERATION, comm_cr_mod.f90:275-321)
            n = min(n, dump_every - (iters % dump_every) or dump_every)
        st, rel = _chunk(sys, plan, st, n)
        iters += n
        if dump_every > 0 and dump_fn is not None \
                and iters % dump_every == 0:
            # the reference dumps sqrt(S)-scaled amplitudes (the sample
            # as the components would hold it), not the CG variable x
            dump_fn(iters, _sqrtS(sys, st[0]))
        if float(np.asarray(rel)) <= tol:
            break
    x = st[0]
    a = _sqrtS(sys, x)
    rel = jnp.asarray(float(np.asarray(rel)))
    return a, CGResult(x=x, iters=jnp.asarray(iters), rel_res=rel,
                       converged=rel <= tol)
