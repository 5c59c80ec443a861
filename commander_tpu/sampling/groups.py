"""CG sampling groups: per-group conditional amplitude solves.

TPU-native counterpart of the reference's sampling-group machinery:
  * group definition   define_cg_samp_groups (comm_param_mod.f90:2381-2429):
    user groups (CG_SAMPLING_GROUPxx, with 'md' expanding to band labels)
    plus ONE auto group per included component, maxiter 150 for cmb /
    non-diffuse and COMP_CG_SAMP_GROUP_MAXITER otherwise;
  * group loop         commander.f90:211-221 (sample_amps_by_CG per group);
  * component masking  CG_mask / cr_mask (comm_comp_mod.f90:351,
    comm_cr_utils.f90:118): non-member amplitudes are held FIXED and their
    signal is subtracted from the data, so each solve is the exact Gibbs
    conditional for the group's amplitudes;
  * group masks        CG_SAMPLING_GROUP_MASKxx processing masks applied to
    invN for the solve.

Every group's sub-system reuses the batched amplitude/joint machinery; a
template-only group (md rows, relquad) is solved by a DIRECT dense draw of
its Gaussian conditional instead of CG — exact where the reference budgets
maxiter 3.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..sphere.alm import alm_dot
from . import amplitude as amp
from . import joint as joint_mod


@dataclasses.dataclass(frozen=True)
class SampGroup:
    """Static definition of one CG sampling group."""
    name: str
    comp_idx: tuple = ()       # diffuse component indices
    temp_idx: tuple = ()       # template-row indices (md / relquad / fixed)
    ptsrc: bool = False        # point-source amplitudes in this group
    maxiter: int = 150
    mask: Optional[object] = None   # (S, P) processing mask or None


def _diffuse_signal(sys, plan, a, comp_idx):
    """Band maps of the diffuse components in comp_idx (empty -> zeros)."""
    if len(comp_idx) == 0:
        return jnp.zeros_like(sys.data)
    idx = np.asarray(comp_idx, np.int64)
    if sys.F_pix is not None:
        sub = dataclasses.replace(sys, F=sys.F[:, idx],
                                  F_pix=sys.F_pix[:, idx])
        return amp._forward_pixmix(sub, plan, a[idx])
    sub = dataclasses.replace(sys, F=sys.F[:, idx])
    alm_b = amp._project_bands(sub, plan, a[idx])
    return amp._synth(plan, alm_b)


def _template_signal(ts, t, temp_idx):
    if ts is None or len(temp_idx) == 0:
        return 0.0
    idx = np.asarray(temp_idx, np.int64)
    return jnp.einsum("tbsp,t->bsp", ts.maps[idx], t[idx])


def _group_system(sys, plan, state_a, t, p, ts, ps, g: SampGroup):
    """Sub-system for group g: non-member signal subtracted from the data,
    group mask applied to invN."""
    other_comps = tuple(i for i in range(state_a.shape[0])
                        if i not in g.comp_idx)
    sky = _diffuse_signal(sys, plan, state_a, other_comps)
    if ts is not None:
        other_t = tuple(i for i in range(ts.maps.shape[0])
                        if i not in g.temp_idx)
        sky = sky + _template_signal(ts, t, other_t)
    if ps is not None and not g.ptsrc:
        sky = sky + joint_mod._ptsrc_fwd(ps, p, sys.data.shape[-1])
    data_g = sys.data - sky
    inv_rms2, inv_rms = sys.inv_rms2, sys.inv_rms
    if g.mask is not None:
        m = jnp.asarray(g.mask, sys.data.dtype)
        inv_rms2 = inv_rms2 * m
        inv_rms = inv_rms * jnp.sqrt(m)
    idx = np.asarray(g.comp_idx, np.int64) if g.comp_idx else None
    return dataclasses.replace(
        sys, data=data_g, inv_rms2=inv_rms2, inv_rms=inv_rms,
        F=sys.F[:, idx] if idx is not None else sys.F[:, :0],
        F_pix=None if sys.F_pix is None
        else (sys.F_pix[:, idx] if idx is not None else sys.F_pix[:, :0]),
        cl=sys.cl[idx] if idx is not None else sys.cl[:0],
        sqrtS_mat=None if sys.sqrtS_mat is None
        else (sys.sqrtS_mat[idx] if idx is not None
              else sys.sqrtS_mat[:0]))


def _solve_templates_direct(sys_g, ts, temp_idx, key):
    """Exact Gaussian conditional for a template-only group:
    (T^t N^-1 T + P) t = T^t N^-1 d + P mu (+ fluctuations).
    The reference solves this with a 3-iteration CG (tutorial md group);
    here the dense (T x T) system is solved directly."""
    idx = np.asarray(temp_idx, np.int64)
    T = ts.maps[idx]                      # (T, B, S, P)
    istd = ts.prior_istd[idx]
    mu = ts.prior_mean[idx]
    G = jnp.einsum("tbsp,bsp,ubsp->tu", T, sys_g.inv_rms2, T)
    G = G + jnp.diag(jnp.square(istd) + 1e-12)
    rhs = jnp.einsum("tbsp,bsp->t", T, sys_g.data * sys_g.inv_rms2)
    rhs = rhs + jnp.square(istd) * mu
    if key is not None:
        k1, k2 = jax.random.split(key)
        eta1 = jax.random.normal(k1, sys_g.data.shape, sys_g.data.dtype)
        rhs = rhs + jnp.einsum("tbsp,bsp->t", T, sys_g.inv_rms * eta1)
        rhs = rhs + istd * jax.random.normal(k2, istd.shape, istd.dtype)
    return jnp.linalg.solve(G, rhs)


def _solve_ptsrc_only(sys_g, ps, key, maxiter, tol):
    """CG over source amplitudes alone (operator = stamp gather/scatter)."""
    from ..ops.cg import pcg
    npix = sys_g.data.shape[-1]

    def A(p):
        m = joint_mod._ptsrc_fwd(ps, p, npix) * sys_g.inv_rms2
        return (joint_mod._ptsrc_adj(ps, m)
                + (jnp.square(ps.prior_istd) + 1e-12) * p)

    rhs = joint_mod._ptsrc_adj(ps, sys_g.data * sys_g.inv_rms2)
    rhs = rhs + jnp.square(ps.prior_istd) * ps.prior_mean
    if key is not None:
        k1, k2 = jax.random.split(key)
        eta1 = jax.random.normal(k1, sys_g.data.shape, sys_g.data.dtype)
        rhs = rhs + joint_mod._ptsrc_adj(ps, sys_g.inv_rms * eta1)
        rhs = rhs + ps.prior_istd * jax.random.normal(
            k2, ps.prior_istd.shape, ps.prior_istd.dtype)
    diag = jnp.einsum("bsnk,bsnk->n", jnp.square(ps.stamp),
                      sys_g.inv_rms2[:, :, ps.pix.reshape(-1)].reshape(
                          ps.stamp.shape[0], ps.stamp.shape[1],
                          *ps.pix.shape))
    Mp = 1.0 / (diag + jnp.square(ps.prior_istd) + 1e-12)
    res = pcg(A, rhs, M_inv=lambda r: Mp * r,
              dot=lambda x, y: jnp.sum(x * y), tol=tol, maxiter=maxiter)
    return res.x, res


def sample_amplitudes_grouped(groups: Sequence[SampGroup], sys, plan,
                              state_a, t, p, ts, ps, key, tol=1e-8,
                              optimize=False, precond="diagonal",
                              lowl_lmax=-1):
    """Gibbs sweep over CG sampling groups (commander.f90:211-221).

    Returns (a, t, p, last CGResult). Each group draws its members'
    conditional given the CURRENT values of all non-members."""
    a = state_a
    res_last = None
    for gi, g in enumerate(groups):
        k_g = None if key is None else jax.random.fold_in(key, gi)
        sys_g = _group_system(sys, plan, a, t, p, ts, ps, g)
        if len(g.comp_idx) == 0 and not g.ptsrc:
            if ts is None or len(g.temp_idx) == 0:
                continue
            t_new = _solve_templates_direct(
                sys_g, ts, g.temp_idx, None if optimize else k_g)
            t = t.at[np.asarray(g.temp_idx, np.int64)].set(t_new)
            continue
        if len(g.comp_idx) == 0 and g.ptsrc:
            p_new, res_last = _solve_ptsrc_only(
                sys_g, ps, None if optimize else k_g, g.maxiter, tol)
            p = p_new
            continue
        ts_g = None
        if ts is not None and len(g.temp_idx) > 0:
            idx = np.asarray(g.temp_idx, np.int64)
            ts_g = joint_mod.TemplateSet(maps=ts.maps[idx],
                                         prior_mean=ts.prior_mean[idx],
                                         prior_istd=ts.prior_istd[idx])
        ps_g = ps if g.ptsrc else None
        if ts_g is not None or ps_g is not None:
            x, res_last = joint_mod.sample_joint(
                sys_g, plan, ts_g, ps_g,
                key=None if optimize else k_g,
                tol=tol, maxiter=g.maxiter)
            a_g, t_g, p_g = x.a, x.t, x.p
            if t_g is not None:
                t = t.at[np.asarray(g.temp_idx, np.int64)].set(t_g)
            if p_g is not None:
                p = p_g
        else:
            a_g, res_last = amp.sample_amplitudes(
                sys_g, plan, key=None if optimize else k_g,
                tol=tol, maxiter=g.maxiter, precond=precond,
                lowl_lmax=lowl_lmax)
        a = a.at[np.asarray(g.comp_idx, np.int64)].set(a_g)
    return a, t, p, res_last


def build_groups(cfg, diffuse_names, template_names, has_ptsrc,
                 ptsrc_labels=(), nmaps=1, npix=0, data_dir=None):
    """Lower the parameter-file group definitions into SampGroups.

    Mirrors define_cg_samp_groups: user groups first (with 'md' expanded to
    the band-named md template rows), then one auto group per component.
    """
    from ..io import fits as fitsio
    import os

    name_to_comp = {n: i for i, n in enumerate(diffuse_names)}
    groups = []

    def temp_rows_for(label):
        rows = []
        for i, tn in enumerate(template_names or ()):
            if tn == label or tn.startswith(f"md_{label}_") \
                    or tn.startswith(f"{label}_"):
                rows.append(i)
        return tuple(rows)

    def load_mask(spec):
        if not spec or str(spec).lower() in ("fullsky", "none"):
            return None
        mpath = str(spec)
        if not os.path.isabs(mpath):
            mpath = os.path.join(data_dir or ".", mpath)
        if not os.path.exists(mpath):
            raise FileNotFoundError(
                f"CG sampling group mask file not found: {mpath}")
        mm = np.asarray(fitsio.read_map(mpath))
        nsm = int(np.sqrt(mm.shape[-1] / 12))
        nso = int(np.sqrt(npix / 12))
        if nsm != nso and npix:
            from ..sphere.healpix import udgrade_indices
            idx = np.asarray(udgrade_indices(nsm, nso)) if nsm > nso \
                else None
            if idx is not None:
                mm = mm[..., idx[:, 0]] if idx.ndim == 2 else mm[..., idx]
            else:
                idx = np.asarray(udgrade_indices(nso, nsm))
                mm = mm[..., idx].mean(axis=-1)
        mm = (mm > 0.5).astype(np.float32)
        if mm.ndim == 1:
            mm = np.broadcast_to(mm, (nmaps, mm.shape[-1])).copy()
        return mm[:nmaps]

    for ug in getattr(cfg, "cg_user_groups", []) or []:
        comp_idx, temp_idx, has_src = [], [], False
        tokens = list(ug.get("comps", []))
        if "md" in tokens:
            # 'md' expands to all band labels (define_cg_samp_groups md
            # expansion) -> every md template row
            tokens += [b.label for b in cfg.bands]
        for tok in tokens:
            if tok in name_to_comp:
                comp_idx.append(name_to_comp[tok])
            if tok in (ptsrc_labels or ()):
                has_src = has_ptsrc
            temp_idx += list(temp_rows_for(tok))
        groups.append(SampGroup(
            name=",".join(ug.get("comps", [])),
            comp_idx=tuple(sorted(set(comp_idx))),
            temp_idx=tuple(sorted(set(temp_idx))),
            ptsrc=has_src,
            maxiter=int(ug.get("maxiter") or 0) or cfg.cg_maxiter,
            mask=load_mask(ug.get("mask"))))

    # one auto group per included component (cmb and non-diffuse -> 150,
    # else COMP_CG_SAMP_GROUP_MAXITER)
    for c in cfg.comps:
        if c.cclass == "diffuse" and c.ctype not in ("md", "cmb_relquad",
                                                     "template"):
            if c.label not in name_to_comp:
                continue
            mi = 150 if c.ctype == "cmb" else (c.cg_samp_group_maxiter
                                               or cfg.cg_maxiter)
            groups.append(SampGroup(name=c.label,
                                    comp_idx=(name_to_comp[c.label],),
                                    maxiter=mi))
        elif c.ctype == "md":
            rows = tuple(i for i, tn in enumerate(template_names or ())
                         if tn.startswith("md_"))
            if rows:
                groups.append(SampGroup(name="md", temp_idx=rows,
                                        maxiter=150))
        elif c.cclass == "template" or c.ctype == "cmb_relquad":
            rows = temp_rows_for(c.label)
            if rows:
                groups.append(SampGroup(name=c.label, temp_idx=rows,
                                        maxiter=150))
        elif c.cclass == "ptsrc" and has_ptsrc:
            groups.append(SampGroup(name=c.label, ptsrc=True, maxiter=150))
    return tuple(groups)
