"""Joint amplitude system: diffuse alms + template/md amplitudes + point
sources in one CG solve.

TPU-native counterpart of the reference's full constrained-realization
solution vector, which packs [diffuse alms | template amps | ptsrc amps]
(cr_amp2x/cr_x2amp, comm_cr_utils.f90; band loop of cr_matmulA,
comm_cr_mod.f90:843-954 where ptsrc/template contributions are added in
pixel space) with the component classes:
  * md        comm_md_comp_mod.f90      — per-band monopole+dipole (4 real
              amplitudes per band, pixel templates [1, x, y, z])
  * template  comm_template_comp_mod.f90 — one amplitude per fixed map
  * ptsrc     comm_ptsrc_comp_mod.f90   — per-source amplitudes with
              per-band beam "postage stamps" (Tnu), dense preconditioner
The solution is a pytree {a, t, p}; cg.pcg iterates it directly. The
reference's rank-0 dense preconditioners for templates/sources become a
small normal-equation inverse applied batched.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cg import pcg
from ..sphere import healpix
from ..sphere.alm import alm_dot, random_alm_white
from . import amplitude as amp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TemplateSet:
    """Fixed pixel-space templates with one amplitude each.

    maps: (T, B, S, P) — md components are built with band-local support.
    prior_mean/prior_istd: optional Gaussian priors on amplitudes.
    """
    maps: jnp.ndarray
    prior_mean: jnp.ndarray   # (T,)
    prior_istd: jnp.ndarray   # (T,) inverse std (0 = improper/flat)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PtsrcSet:
    """Point-source catalog with per-band postage stamps.

    pix: (nsrc, npatch) int32 pixel indices (RING)
    stamp: (B, S, nsrc, npatch) response of unit source amplitude
    """
    pix: jnp.ndarray
    stamp: jnp.ndarray
    prior_mean: jnp.ndarray
    prior_istd: jnp.ndarray


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class JointState:
    a: jnp.ndarray                       # diffuse (C,S,nl,nm) complex
    t: Optional[jnp.ndarray] = None      # template amps (T,)
    p: Optional[jnp.ndarray] = None      # ptsrc amps (nsrc,)


def make_md_templates(nside: int, nband: int, nmaps: int = 1,
                      dtype=np.float64) -> TemplateSet:
    """Monopole+dipole templates per band (T channel only), matching the
    reference md component (one per band, comm_signal_mod.f90:84-85)."""
    vec = healpix.pix2vec_ring(nside)       # (P, 3)
    npix = vec.shape[0]
    base = np.concatenate([np.ones((1, npix)), vec.T], axis=0)  # (4, P)
    maps = np.zeros((4 * nband, nband, nmaps, npix), dtype)
    for b in range(nband):
        maps[4 * b: 4 * b + 4, b, 0, :] = base
    return TemplateSet(maps=jnp.asarray(maps),
                       prior_mean=jnp.zeros(4 * nband, dtype),
                       prior_istd=jnp.zeros(4 * nband, dtype))


def gaussian_stamp_ptsrc(nside: int, src_pix: np.ndarray, F_src: np.ndarray,
                         bl_fwhm_arcmin: np.ndarray, nmaps: int = 1,
                         npatch: int = 64, dtype=np.float64) -> PtsrcSet:
    """Build beam stamps for sources at given pixels.

    F_src: (B, nsrc) band response of unit amplitude (SED x bandpass);
    stamps are Gaussian beams evaluated on the npatch nearest pixels —
    the same role as the reference's Tnu maps (comm_ptsrc_comp_mod.f90:45).
    """
    vec = healpix.pix2vec_ring(nside)
    nsrc = len(src_pix)
    nband = F_src.shape[0]
    pix = np.zeros((nsrc, npatch), np.int32)
    stamp = np.zeros((nband, nmaps, nsrc, npatch), dtype)
    omega = 4 * np.pi / (12 * nside * nside)
    for i, sp in enumerate(src_pix):
        d = vec @ vec[sp]
        idx = np.argpartition(-d, npatch)[:npatch]
        pix[i] = idx.astype(np.int32)
        theta = np.arccos(np.clip(d[idx], -1, 1))
        for b in range(nband):
            sig = np.deg2rad(bl_fwhm_arcmin[b] / 60) / np.sqrt(8 * np.log(2))
            prof = np.exp(-0.5 * (theta / sig) ** 2)
            prof /= max(prof.sum() * omega, 1e-300)   # unit integral (amp = flux-like)
            stamp[b, 0, i] = F_src[b, i] * prof
    return PtsrcSet(pix=jnp.asarray(pix), stamp=jnp.asarray(stamp),
                    prior_mean=jnp.zeros(nsrc, dtype),
                    prior_istd=jnp.zeros(nsrc, dtype))


def febecop_stamp_ptsrc(path: str, nside: int, src_theta: np.ndarray,
                        src_phi: np.ndarray, F_src: np.ndarray,
                        nside_febecop: int, band_labels=None,
                        npatch: int = 64, nmaps: int = 1,
                        dtype=np.float64) -> PtsrcSet:
    """Read per-source FEBeCoP effective-beam stamps from the reference's
    HDF layout and build a PtsrcSet.

    File layout (read_febecop_beam, comm_ptsrc_comp_mod.f90:796-880):
    group ``[<band_label>/]<center_pix>`` with datasets ``indices`` (RING
    pixel indices at nside_febecop) and ``values`` (beam response). The
    center pixel is ang2pix_ring(nside_febecop, source position) (:815).
    Resolution changes are handled by inverse-variance-free averaging over
    NEST children (degrade) / replication (upgrade) like the reference.
    Stamps are truncated to the npatch strongest pixels and normalized to
    unit integral (flux-like amplitudes, matching gaussian_stamp_ptsrc).
    """
    import h5py

    nsrc = len(src_theta)
    nband = F_src.shape[0]
    pix_out = np.zeros((nsrc, npatch), np.int32)
    stamp = np.zeros((nband, nmaps, nsrc, npatch), dtype)
    omega = 4 * np.pi / (12 * nside * nside)
    centers = healpix.ang2pix_ring(nside_febecop, src_theta, src_phi)
    with h5py.File(path, "r") as f:
        for i in range(nsrc):
            per_band = []
            for b in range(nband):
                grp = f
                if band_labels is not None:
                    grp = f[str(band_labels[b])]
                g = grp[str(int(centers[i]))]
                ind = np.asarray(g["indices"])
                val = np.asarray(g["values"], np.float64)
                if nside_febecop != nside:
                    # move to target nside via NEST parent/child relations
                    r2n_fb = healpix.ring2nest_table(nside_febecop)
                    n2r = healpix.nest2ring_table(nside)
                    if nside < nside_febecop:
                        q = (nside_febecop // nside) ** 2
                        parents = r2n_fb[ind] // q
                        uniq, inv = np.unique(parents, return_inverse=True)
                        acc = np.zeros(len(uniq))
                        np.add.at(acc, inv, val)
                        ind, val = n2r[uniq], acc / q
                    else:
                        q = (nside // nside_febecop) ** 2
                        base = r2n_fb[ind][:, None] * q + np.arange(q)
                        ind = n2r[base.reshape(-1)]
                        val = np.repeat(val, q)
                per_band.append((ind, val))
            # ONE shared pixel patch per source across bands: rank pixels
            # by their summed |response| over bands (the reference keeps a
            # per-(src, band) support; a shared patch keeps stamps
            # rectangular for the batched scatter/gather)
            allpix = np.unique(np.concatenate([pb[0] for pb in per_band]))
            score = np.zeros(len(allpix))
            col = {p: j for j, p in enumerate(allpix)}
            for ind, val in per_band:
                for p, v in zip(ind, val):
                    score[col[p]] += abs(v)
            k = min(npatch, len(allpix))
            top = allpix[np.argpartition(-score, k - 1)[:k]] if k < len(allpix) \
                else allpix
            pix_out[i, :len(top)] = top.astype(np.int32)
            lut = {p: j for j, p in enumerate(top)}
            for b, (ind, val) in enumerate(per_band):
                v = np.zeros(npatch)
                for p, x in zip(ind, val):
                    j = lut.get(p)
                    if j is not None:
                        v[j] = x
                v /= max(v.sum() * omega, 1e-300)
                stamp[b, 0, i] = F_src[b, i] * v
    return PtsrcSet(pix=jnp.asarray(pix_out), stamp=jnp.asarray(stamp),
                    prior_mean=jnp.zeros(nsrc, dtype),
                    prior_istd=jnp.zeros(nsrc, dtype))


# ---------------------------------------------------------------------------
# Pixel-space projections
# ---------------------------------------------------------------------------

def _templates_fwd(ts: TemplateSet, t):
    return jnp.einsum("t,tbsp->bsp", t, ts.maps)


def _templates_adj(ts: TemplateSet, m):
    return jnp.einsum("bsp,tbsp->t", m, ts.maps)


def _ptsrc_fwd(ps: PtsrcSet, p, npix: int):
    """amps (nsrc,) -> maps (B,S,P) via scatter-add of stamps.

    The scatter runs on a FLAT (B*S*P,) buffer: a last-axis scatter on
    a (B,S,P) operand makes XLA:TPU assign the scattered dim major, and
    the tiny (B,S) minor dims then tile to (4,128) — a 57x HBM padding
    blow-up on every consumer of the result (round-5 nside-512 OOM)."""
    vals = ps.stamp * p[None, None, :, None]        # (B,S,nsrc,npatch)
    B, S = vals.shape[0], vals.shape[1]
    flat_pix = ps.pix.reshape(-1)                   # (nsrc*npatch,)
    idx = ((jnp.arange(B * S) * npix)[:, None]
           + flat_pix[None, :]).reshape(-1)
    out = jnp.zeros((B * S * npix,), vals.dtype)
    out = out.at[idx].add(vals.reshape(-1))
    return out.reshape(B, S, npix)


def _ptsrc_adj(ps: PtsrcSet, m):
    """maps (B,S,P) -> amps (nsrc,) (flat gather; see _ptsrc_fwd)."""
    B, S, npix = m.shape
    flat_pix = ps.pix.reshape(-1)
    idx = ((jnp.arange(B * S) * npix)[:, None]
           + flat_pix[None, :]).reshape(-1)
    gath = m.reshape(-1)[idx].reshape(B, S, *ps.pix.shape)
    return jnp.einsum("bsnk,bsnk->n", gath, ps.stamp)


# ---------------------------------------------------------------------------
# Joint operator / RHS / preconditioner / driver
# ---------------------------------------------------------------------------

def joint_dot(x: JointState, y: JointState):
    d = alm_dot(x.a, y.a)
    if x.t is not None:
        d = d + jnp.sum(x.t * y.t)
    if x.p is not None:
        d = d + jnp.sum(x.p * y.p)
    return d


def _band_maps(sys, plan, x: JointState, ts, ps):
    a = amp._sqrtS(sys, x.a)
    if sys.F_pix is not None:
        # per-pixel mixing rides through the joint system exactly as in
        # the reference's cr_matmulA (comm_cr_mod.f90:771-1024 evaluates
        # every component class, incl. pixel-mixing diffuse rows, in the
        # same distributed matvec)
        m = amp._forward_pixmix(sys, plan, a)
    else:
        m = amp._synth(plan, amp._project_bands(sys, plan, a))
    if ts is not None:
        m = m + _templates_fwd(ts, x.t)
    if ps is not None:
        m = m + _ptsrc_fwd(ps, x.p, m.shape[-1])
    return m


def _band_maps_adj(sys, plan, m, ts, ps) -> JointState:
    if sys.F_pix is not None:
        a = amp._sqrtS(sys, amp._forward_pixmix_T(sys, plan, m))
    else:
        a = amp._sqrtS(sys, amp._project_bands_T(sys, plan,
                                                 amp._synth_T(plan, m)))
    t = _templates_adj(ts, m) if ts is not None else None
    p = _ptsrc_adj(ps, m) if ps is not None else None
    return JointState(a=a, t=t, p=p)


def apply_A_joint(sys, plan, ts, ps, x: JointState) -> JointState:
    m = _band_maps(sys, plan, x, ts, ps)
    m = m * sys.inv_rms2
    r = _band_maps_adj(sys, plan, m, ts, ps)
    a = x.a + r.a
    t = None if ts is None else x.t * jnp.square(ts.prior_istd) + r.t
    p = None if ps is None else x.p * jnp.square(ps.prior_istd) + r.p
    # improper flat prior on t/p: identity term only via priors; add tiny
    # ridge for CG definiteness when prior_istd == 0
    if ts is not None:
        t = t + 1e-12 * x.t
    if ps is not None:
        p = p + 1e-12 * x.p
    return JointState(a=a, t=t, p=p)


def compute_rhs_joint(sys, plan, ts, ps, key=None) -> JointState:
    w = sys.data * sys.inv_rms2
    if key is not None:
        k1, k2 = jax.random.split(key)
        eta1 = jax.random.normal(k1, sys.data.shape, sys.data.dtype)
        w = w + eta1 * sys.inv_rms
    r = _band_maps_adj(sys, plan, w, ts, ps)
    a, t, p = r.a, r.t, r.p
    if ts is not None:
        t = t + jnp.square(ts.prior_istd) * ts.prior_mean
    if ps is not None:
        p = p + jnp.square(ps.prior_istd) * ps.prior_mean
    if key is not None:
        eta2 = random_alm_white(k2, a.shape, sys.data.dtype) * sys.tri
        a = a + eta2
        # prior fluctuation terms for t/p (zero when flat prior)
        if ts is not None:
            kt, k2 = jax.random.split(k2)
            t = t + ts.prior_istd * jax.random.normal(kt, t.shape, t.dtype)
        if ps is not None:
            kp, k2 = jax.random.split(k2)
            p = p + ps.prior_istd * jax.random.normal(kp, p.shape, p.dtype)
    return JointState(a=a, t=t, p=p)


def build_joint_preconditioner(sys, plan, ts, ps):
    """Diffuse block preconditioner + dense normal-equation blocks for
    templates and sources (the reference's invM_diff / invM_temp / invM_src,
    comm_cr_precond_mod.f90:25-37)."""
    M_diff = amp.build_preconditioner(sys, plan)
    Mt_inv = Mp_inv = None
    if ts is not None:
        G = jnp.einsum("tbsp,bsp,ubsp->tu", ts.maps, sys.inv_rms2, ts.maps)
        G = G + jnp.diag(jnp.square(ts.prior_istd) + 1e-12)
        Mt_inv = jnp.linalg.inv(G)
    if ps is not None:
        # diagonal of the source-source normal matrix (off-diagonals are
        # negligible unless sources overlap; reference uses dense on rank 0)
        diag = jnp.einsum("bsnk,bsnk->n", jnp.square(ps.stamp),
                          sys.inv_rms2[:, :, ps.pix.reshape(-1)].reshape(
                              ps.stamp.shape[0], ps.stamp.shape[1],
                              *ps.pix.shape))
        Mp_inv = 1.0 / (diag + jnp.square(ps.prior_istd) + 1e-12)

    def apply(r: JointState) -> JointState:
        return JointState(
            a=M_diff(r.a),
            t=None if Mt_inv is None else Mt_inv @ r.t,
            p=None if Mp_inv is None else Mp_inv * r.p)

    return apply


def sample_joint(sys, plan, ts=None, ps=None, key=None, tol=1e-8,
                 maxiter=500):
    """Draw (a, t, p) ~ P(. | d, Cl, theta) jointly (Wiener mean if key is
    None). Returns (JointState with a unwhitened, CGResult)."""
    rhs = compute_rhs_joint(sys, plan, ts, ps, key)
    M_inv = build_joint_preconditioner(sys, plan, ts, ps)
    res = pcg(partial(apply_A_joint, sys, plan, ts, ps), rhs, M_inv=M_inv,
              dot=joint_dot, tol=tol, maxiter=maxiter)
    x = res.x
    return JointState(a=amp._sqrtS(sys, x.a), t=x.t, p=x.p), res


def sample_template_amp_masked(key, res_map, T_map, inv_rms2, mask,
                               prior_mean=0.0, prior_std=None,
                               sample: bool = True):
    """Masked single-template amplitude Gibbs draw OUTSIDE the CG.

    Reference: sample_partialsky_tempamps (comm_signal_mod.f90:459-524) —
    per template with a mask: mu = <T invN r>_mask / <T invN T>_mask,
    sigma^2 = 1/<T invN T>_mask, combined with the Gaussian prior
    (mu_p, sigma_p), then amp = mu + sigma N(0,1) in 'sample' mode (the
    posterior mean in 'optimize' mode).

    res_map/T_map/inv_rms2/mask: (..., npix) for one band.
    """
    w = inv_rms2 * mask
    num = jnp.sum(w * res_map * T_map)
    den = jnp.sum(w * T_map * T_map)
    mu = num / den
    var = 1.0 / den
    if prior_std is not None:
        vp = prior_std * prior_std
        mu = (mu * vp + prior_mean * var) / (vp + var)
        var = var * vp / (var + vp)
    if sample and key is not None:
        return mu + jnp.sqrt(var) * jax.random.normal(key, (), res_map.dtype)
    return mu


# ---------------------------------------------------------------------------
# Per-source spectral indices (samplePtsrcSpecInd,
# comm_ptsrc_comp_mod.f90:1492-1971)
# ---------------------------------------------------------------------------

def ptsrc_sed(nuratio, alphas):
    """Radio SED factor per (band, source): (nu_b/nu0)^(-2+alpha_i)
    (evalSED, comm_ptsrc_comp_mod.f90:322)."""
    return jnp.power(jnp.asarray(nuratio)[:, None],
                     (-2.0 + jnp.asarray(alphas))[None, :])


def restamp_ptsrc(ps_unit: PtsrcSet, nuratio, alphas) -> PtsrcSet:
    """Bake the current per-source SED into the unit-profile stamps."""
    F = ptsrc_sed(nuratio, alphas)                     # (B, nsrc)
    return dataclasses.replace(
        ps_unit, stamp=ps_unit.stamp * F[:, None, :, None])


def sample_ptsrc_alpha(key, ps_unit: PtsrcSet, nuratio, res, amps, alphas,
                       inv_rms2, grid, prior_mean=None, prior_istd=None):
    """Grid-inversion draw of each source's spectral index alpha.

    ps_unit: UNIT-profile stamps (SED factor NOT baked in); res: (B,S,P)
    residual of the full model (all sources subtracted at the current
    alphas); amps: (nsrc,) current amplitudes. Batched over sources and
    grid on the VPU — the reference loops sources serially on rank 0.
    Returns (nsrc,) new alphas."""
    B, S, nsrc, npatch = ps_unit.stamp.shape
    G = grid.shape[0]
    r_patch = res[:, :, ps_unit.pix]                   # (B,S,nsrc,npatch)
    iv_patch = inv_rms2[:, :, ps_unit.pix]
    F_cur = ptsrc_sed(nuratio, alphas)                 # (B,nsrc)
    own = ps_unit.stamp * (F_cur[:, None, :, None]
                           * amps[None, None, :, None])
    r_full = r_patch + own                             # incl. own source
    F_g = jnp.power(jnp.asarray(nuratio)[:, None, None],
                    (-2.0 + grid)[None, None, :])      # (B,1,G)
    model = (ps_unit.stamp[..., None] * amps[None, None, :, None, None]
             * F_g[:, None, :, None, :])               # (B,S,nsrc,np,G)
    dlt = r_full[..., None] - model
    lnl = -0.5 * jnp.sum(iv_patch[..., None] * dlt * dlt,
                         axis=(0, 1, 3))               # (nsrc, G)
    if prior_mean is not None and prior_istd is not None:
        lnl = lnl - 0.5 * jnp.square(
            (grid[None, :] - prior_mean[:, None]) * prior_istd[:, None])
    from .specind import _cdf_invert
    return _cdf_invert(key, lnl, grid)


def optimize_ptsrc(ps_unit: PtsrcSet, nuratio, res, amps, alphas,
                   inv_rms2, alpha_bounds=(-4.0, 1.0)):
    """operation=optimize: Powell fit of (amplitude, alpha) per source —
    the reference's powell(x, lnL_ptsrc_multi) path
    (comm_ptsrc_comp_mod.f90:1518-1570). Host-side loop over sources
    (rank-0 in the reference); returns (amps, alphas) ML values."""
    import numpy as np

    from ..ops.powell import powell

    B, S, nsrc, npatch = ps_unit.stamp.shape
    r_patch = np.asarray(res[:, :, ps_unit.pix])
    iv_patch = np.asarray(inv_rms2[:, :, ps_unit.pix])
    unit = np.asarray(ps_unit.stamp)
    nur = np.asarray(nuratio)
    F_cur = np.asarray(ptsrc_sed(nuratio, alphas))
    amps = np.asarray(amps).copy()
    alphas = np.asarray(alphas).copy()
    for i in range(nsrc):
        r_i = r_patch[:, :, i] + unit[:, :, i] \
            * (F_cur[:, i, None] * amps[i])[:, None]

        def negl(x, i=i, r_i=r_i):
            a, al = x
            al = np.clip(al, *alpha_bounds)
            F = nur ** (-2.0 + al)
            m = unit[:, :, i] * (F[:, None, None] * a)
            d = r_i - m
            return float(np.sum(iv_patch[:, :, i] * d * d))

        x, fx, _ = powell(negl, np.array([amps[i], alphas[i]]))
        amps[i] = x[0]
        alphas[i] = float(np.clip(x[1], *alpha_bounds))
    return amps, alphas
