"""Multi-resolution CG: bands grouped by (nside, lmax), shared components.

The reference keeps every band at its own resolution and loops bands inside
cr_matmulA (comm_cr_mod.f90:843-954), with lmax projection masks
(:858-860, :931-933) translating between component and band band-limits.
TPU-native version: bands are grouped by (nside, lmax); each group is one
batched AmplitudeSystem with its own SHT plan; component alms live at the
common component lmax and are truncated per group (synthesis) / padded back
(adjoint). Groups vectorize internally; the group loop is a short unrolled
Python loop inside jit.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..model.cl import apply_sqrtS
from ..ops.cg import pcg
from ..sphere.alm import alm_dot, random_alm_white, real_m0, triangle_mask
from . import amplitude as amp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MultiSystem:
    """Per-resolution-group systems + shared component-space prior."""
    groups: tuple                  # tuple[AmplitudeSystem] (band-stacked)
    cl: jnp.ndarray                # (C, S, nl) at component lmax
    tri: jnp.ndarray               # (nl, nm)


def build_multi_system(group_systems: Sequence[amp.AmplitudeSystem],
                       cl) -> MultiSystem:
    cl = jnp.asarray(cl)
    nl = cl.shape[-1]
    return MultiSystem(groups=tuple(group_systems), cl=cl,
                       tri=jnp.asarray(triangle_mask(nl, nl)))


def _sqrtS(ms: MultiSystem, u):
    return real_m0(apply_sqrtS(ms.cl, u) * ms.tri)


def _truncate(a, nl_g):
    return a[..., :nl_g, :nl_g]


def _pad_back(r_g, nl):
    nl_g = r_g.shape[-1]
    pad = [(0, 0)] * (r_g.ndim - 2) + [(0, nl - nl_g), (0, nl - nl_g)]
    return jnp.pad(r_g, pad)


def apply_A_multi(ms: MultiSystem, plans: Sequence, u):
    """(1 + S^1/2 sum_g A_g^T N_g^-1 A_g S^1/2) u."""
    a = _sqrtS(ms, u)
    nl = a.shape[-1]
    r = jnp.zeros_like(a)
    for g, (sys_g, plan_g) in enumerate(zip(ms.groups, plans)):
        a_g = _truncate(a, plan_g.lmax + 1)
        alm_b = amp._project_bands(sys_g, plan_g, a_g)
        m = amp._synth(plan_g, alm_b) * sys_g.inv_rms2
        r_b = amp._synth_T(plan_g, m)
        r = r + _pad_back(amp._project_bands_T(sys_g, plan_g, r_b), nl)
    return u + _sqrtS(ms, r)


def compute_rhs_multi(ms: MultiSystem, plans, key=None):
    nl = ms.cl.shape[-1]
    C = ms.cl.shape[0]
    S = ms.groups[0].data.shape[1]
    dtype = ms.groups[0].data.dtype
    r = None
    keys = jax.random.split(key, len(ms.groups) + 1) if key is not None else None
    for g, (sys_g, plan_g) in enumerate(zip(ms.groups, plans)):
        w = sys_g.data * sys_g.inv_rms2
        if key is not None:
            eta1 = jax.random.normal(keys[g], sys_g.data.shape, dtype)
            w = w + eta1 * sys_g.inv_rms
        r_b = amp._synth_T(plan_g, w)
        contrib = _pad_back(amp._project_bands_T(sys_g, plan_g, r_b), nl)
        r = contrib if r is None else r + contrib
    rhs = _sqrtS(ms, r)
    if key is not None:
        eta2 = random_alm_white(keys[-1], (C, S, nl, nl), dtype) * ms.tri
        rhs = real_m0(rhs + eta2)
    return rhs


def build_preconditioner_multi(ms: MultiSystem, plans):
    """Summed per-(ell,Stokes) blocks over all groups (reference
    updateDiffPrecond_diagonal accumulates over bands the same way)."""
    nl = ms.cl.shape[-1]
    C = ms.cl.shape[0]
    S = ms.groups[0].data.shape[1]
    G = jnp.zeros((S, nl, C, C), ms.groups[0].data.dtype)
    for sys_g, plan_g in zip(ms.groups, plans):
        kappa = jnp.sum(sys_g.inv_rms2, axis=-1) / (4.0 * np.pi)
        nl_g = plan_g.lmax + 1
        fb = jnp.einsum("bcs,bsl->bcsl", sys_g.F, sys_g.bl)
        Gg = jnp.einsum("bcsl,bdsl,bs->slcd", fb, fb, kappa)
        G = G.at[:, :nl_g].add(Gg)
    sqcl = jnp.sqrt(jnp.maximum(ms.cl, 0.0))
    S_half = jnp.einsum("csl->slc", sqcl)
    M = jnp.eye(C) + S_half[..., :, None] * G * S_half[..., None, :]
    M_inv = jnp.linalg.inv(M)

    def apply(r):
        return jnp.einsum("slcd,dslm->cslm", M_inv, r)

    return apply


def sample_amplitudes_multi(ms: MultiSystem, plans, key=None, x0=None,
                            tol=1e-8, maxiter=300):
    rhs = compute_rhs_multi(ms, plans, key)
    M_inv = build_preconditioner_multi(ms, plans)
    res = pcg(partial(apply_A_multi, ms, plans), rhs, x0=x0, M_inv=M_inv,
              dot=alm_dot, tol=tol, maxiter=maxiter)
    return _sqrtS(ms, res.x), res
