"""Amplitude CG with the SHTs m/ring-sharded across a device mesh (P2).

For large single transforms (nside >= 1024) the reference distributes each
SHT across ranks (sharp_execute_mpi); the per-band loop of cr_matmulA then
runs every band's transform distributed (comm_cr_mod.f90:843-954). Here the
whole CG operator is built from the sharded transforms of
parallel.sht_shard: band alms (B, S, nl, nm) feed ONE m-sharded batched
synthesis, the noise weighting happens in the ring-sharded padded layout,
and the adjoint returns m-sharded alms. CG inner products over the sharded
arrays reduce globally through XLA collectives.

Scope: constant-mixing diagonal-noise systems (S = 1 spin-0 and S = 3
polarized via the sharded spin-2 kernels) — the P2 regime of BASELINE
configs 3-4 (high-nside CMB+foreground amplitude solves).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.cg import pcg
from ..sphere.alm import alm_dot
from ..sampling import amplitude as amp
from .sht_shard import (map_to_rings, rings_to_map, sharded_alm2map_rings,
                        sharded_alm2map_adjoint_rings,
                        sharded_alm2map_spin2_rings,
                        sharded_spin2_adjoint_rings)


def _pad_bands(x, mult):
    """Zero-pad the leading (band) axis to a multiple of the band-shard."""
    pad = (-x.shape[0]) % mult
    if pad == 0:
        return x
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))


def _synth_sharded(plan, mesh, alm_b, axis, band_axis=None):
    """Band alms (B,S,nl,nm) -> padded-ring Stokes maps (B,S,...), sharded.

    S=1: spin-0; S=3: T spin-0 + (E,B) spin-2 (mirrors amp._synth).
    With `band_axis` the band dim is sharded over the second mesh axis
    (P3 x P2 2-D layout); bands are zero-padded to the shard multiple."""
    B = alm_b.shape[0]
    if band_axis is not None:
        alm_b = _pad_bands(alm_b, mesh.shape[band_axis])
    if alm_b.shape[1] == 3:
        T = sharded_alm2map_rings(plan, alm_b[:, 0], mesh, axis,
                                  batch_axis=band_axis)
        Pc = sharded_alm2map_spin2_rings(plan, alm_b[:, 1], alm_b[:, 2],
                                         mesh, axis, batch_axis=band_axis)
        out = jnp.stack([T, Pc.real.astype(T.dtype),
                         Pc.imag.astype(T.dtype)], axis=1)
    else:
        out = sharded_alm2map_rings(plan, alm_b, mesh, axis,
                                    batch_axis=band_axis)
    return out[:B]


def _synth_T_sharded(plan, mesh, fr, axis, band_axis=None):
    """Adjoint of _synth_sharded: ring maps (B,S,...) -> alms (B,S,nl,nm_p)."""
    Bb = fr.shape[0]
    if band_axis is not None:
        fr = _pad_bands(fr, mesh.shape[band_axis])
    if fr.shape[1] == 3:
        T = sharded_alm2map_adjoint_rings(plan, fr[:, 0], mesh, axis,
                                          ndim_batch=1, batch_axis=band_axis)
        E, B = sharded_spin2_adjoint_rings(
            plan, fr[:, 1] + 1j * fr[:, 2], mesh, axis, ndim_batch=1,
            batch_axis=band_axis)
        out = jnp.stack([T, E, B], axis=1)
    else:
        out = sharded_alm2map_adjoint_rings(plan, fr, mesh, axis,
                                            ndim_batch=fr.ndim - 2,
                                            batch_axis=band_axis)
    return out[:Bb]


def ring_layout_invN(sys: amp.AmplitudeSystem, plan, mesh: Mesh,
                     axis: str = "sphere"):
    """Pre-shard N^-1 (and data) into the padded-ring layout."""
    ndev = mesh.shape[axis]
    inv2 = map_to_rings(plan, sys.inv_rms2, ndev)
    inv1 = map_to_rings(plan, sys.inv_rms, ndev)
    data = map_to_rings(plan, sys.data, ndev)
    return inv2, inv1, data


def apply_A_sharded(sys: amp.AmplitudeSystem, plan, mesh: Mesh,
                    inv2_r, u, axis: str = "sphere", band_axis=None):
    """(1 + S^1/2 A^T N^-1 A S^1/2) u with distributed SHTs.

    With `band_axis` the per-band synthesis/noise/adjoint stages run on a
    2-D (band x sphere) mesh: each band group owns whole bands (P3,
    cr_matmulA's band loop) while each band's transform is m/ring-sharded
    within the group (P2). The band reduction in _project_bands_T is left
    to XLA's partitioner (an all_reduce over the band axis)."""
    a = amp._sqrtS(sys, u)
    alm_b = amp._project_bands(sys, plan, a)            # (B,S,nl,nm)
    fr = _synth_sharded(plan, mesh, alm_b, axis, band_axis)
    fr = fr * inv2_r
    r_b = _synth_T_sharded(plan, mesh, fr, axis, band_axis)
    r_b = r_b[..., : plan.mmax + 1]
    r = amp._project_bands_T(sys, plan, r_b)
    return u + amp._sqrtS(sys, r)


def compute_rhs_sharded(sys, plan, mesh, inv2_r, inv1_r, data_r, key=None,
                        axis: str = "sphere", band_axis=None):
    w = data_r * inv2_r
    if key is not None:
        k1, k2 = jax.random.split(key)
        eta1 = jax.random.normal(k1, data_r.shape, data_r.dtype)
        w = w + eta1 * inv1_r
    r_b = _synth_T_sharded(plan, mesh, w, axis, band_axis)
    r_b = r_b[..., : plan.mmax + 1]
    rhs = amp._sqrtS(sys, amp._project_bands_T(sys, plan, r_b))
    if key is not None:
        from ..sphere.alm import random_alm_white
        eta2 = random_alm_white(k2, rhs.shape, sys.data.dtype) * sys.tri
        rhs = rhs + eta2
    return rhs


def sample_amplitudes_sharded(sys: amp.AmplitudeSystem, plan, mesh: Mesh,
                              key=None, tol=1e-8, maxiter=300,
                              axis: str = "sphere", band_axis=None):
    """Distributed-SHT amplitude draw (Wiener mean when key is None).

    `band_axis` enables the 2-D band x sphere layout: pass a mesh with
    axes (band_axis, axis) and the CG operator runs with bands distributed
    across band groups AND every SHT distributed within its group.

    Note: the fluctuation draw in the ring layout includes the padded
    (invalid) slots; they carry zero inv_rms so they do not contribute.
    """
    inv2_r, inv1_r, data_r = ring_layout_invN(sys, plan, mesh, axis)
    if band_axis is not None and inv2_r.shape[0] % mesh.shape[band_axis] == 0:
        # placement hint only — with a non-divisible band count the arrays
        # stay replicated and the shard_map band padding handles layout
        sh = NamedSharding(mesh, P(band_axis))
        inv2_r, inv1_r, data_r = jax.device_put((inv2_r, inv1_r, data_r), sh)
    rhs = compute_rhs_sharded(sys, plan, mesh, inv2_r, inv1_r, data_r, key,
                              axis, band_axis)
    M_inv = amp.build_preconditioner(sys, plan)
    res = pcg(partial(apply_A_sharded, sys, plan, mesh, inv2_r,
                      axis=axis, band_axis=band_axis), rhs,
              M_inv=M_inv, dot=alm_dot, tol=tol, maxiter=maxiter)
    return amp._sqrtS(sys, res.x), res


# ---------------------------------------------------------------------------
# Full-model sharded CG (round 5): pixel mixing + joint template/ptsrc rows
# ---------------------------------------------------------------------------
#
# The reference's distributed cr_matmulA carries the WHOLE model — per-
# pixel mixing, point-source and template rows — through the same MPI-
# sharded SHTs (comm_cr_mod.f90:771-1024). This section lifts the same
# generality onto the device mesh: every Y/Yt runs m/ring-sharded (P2,
# optionally x band groups, P3), the pixel-mixing products and template
# rows evaluate in the ring-sharded layout, and the point-source patch
# scatter/gather (an O(npix) op) stays in the replicated pixel layout
# with layout conversion at the boundary. Multires bands are the bl=0
# truncation special case (per-band b_l already encodes COMP/BAND lmax
# windows in this framework's shared-resolution layout).

def _ring_weights(plan, mesh, axis):
    """Quadrature weights w(p) in the padded-ring layout."""
    from ..sampling.amplitude import _pix_weights
    return map_to_rings(plan, _pix_weights(plan), mesh.shape[axis])


def full_model_ring_payload(sys: amp.AmplitudeSystem, plan, mesh: Mesh,
                            ts=None, axis: str = "sphere"):
    """Pre-shard the pixel-space model pieces into the ring layout:
    (inv2, inv1, data, F_pix or None, template maps or None, w)."""
    ndev = mesh.shape[axis]
    inv2, inv1, data = ring_layout_invN(sys, plan, mesh, axis)
    fpix_r = None
    if sys.F_pix is not None:
        fpix_r = map_to_rings(plan, sys.F_pix, ndev)
    ts_r = None
    if ts is not None:
        ts_r = map_to_rings(plan, ts.maps, ndev)
    w_r = _ring_weights(plan, mesh, axis)
    return inv2, inv1, data, fpix_r, ts_r, w_r


def _band_maps_sharded(sys, plan, mesh, x, ts, ps, fpix_r, ts_r, w_r,
                       axis, band_axis):
    """Model band maps in ring layout for the joint state x=(a, t, p):
    the distributed counterpart of joint._band_maps, incl. the pixel-
    mixing path of amplitude._forward_pixmix."""
    from ..sampling import joint as joint_mod

    a = amp._sqrtS(sys, x.a)
    if fpix_r is not None:
        # comp pixel fields (C,S,rings) -> per-pixel mixing -> band alms
        u_r = _synth_sharded(plan, mesh, a, axis, None)
        s_b = jnp.einsum("bcsrw,csrw->bsrw", fpix_r, u_r,
                         precision=jax.lax.Precision.HIGHEST)
        alm_b = _synth_T_sharded(plan, mesh, s_b * w_r, axis, band_axis)
        alm_b = alm_b[..., : plan.mmax + 1] * sys.bl[..., None]
    else:
        alm_b = amp._project_bands(sys, plan, a)
    m_r = _synth_sharded(plan, mesh, alm_b, axis, band_axis)
    if ts is not None:
        m_r = m_r + jnp.einsum("t,tbsrw->bsrw", x.t, ts_r)
    if ps is not None:
        p_map = joint_mod._ptsrc_fwd(ps, x.p, 12 * plan.nside ** 2)
        m_r = m_r + map_to_rings(plan, p_map, mesh.shape[axis])
    return m_r


def _band_maps_adj_sharded(sys, plan, mesh, m_r, ts, ps, fpix_r, ts_r,
                           w_r, axis, band_axis):
    """Exact adjoint of _band_maps_sharded -> JointState rows."""
    from ..sampling import joint as joint_mod

    r_b = _synth_T_sharded(plan, mesh, m_r, axis, band_axis)
    r_b = r_b[..., : plan.mmax + 1]
    if fpix_r is not None:
        alm_b = r_b * sys.bl[..., None]
        t_r = _synth_sharded(plan, mesh, alm_b, axis, band_axis) * w_r
        v_r = jnp.einsum("bcsrw,bsrw->csrw", fpix_r, t_r,
                         precision=jax.lax.Precision.HIGHEST)
        a = _synth_T_sharded(plan, mesh, v_r, axis, None)
        a = amp._sqrtS(sys, a[..., : plan.mmax + 1])
    else:
        a = amp._sqrtS(sys, amp._project_bands_T(sys, plan, r_b))
    t = None
    if ts is not None:
        t = jnp.einsum("bsrw,tbsrw->t", m_r, ts_r)
    p = None
    if ps is not None:
        p = joint_mod._ptsrc_adj(ps, rings_to_map(plan, m_r))
    return joint_mod.JointState(a=a, t=t, p=p)


def sample_joint_sharded(sys: amp.AmplitudeSystem, plan, mesh: Mesh,
                         ts=None, ps=None, key=None, tol=1e-8,
                         maxiter=300, axis: str = "sphere",
                         band_axis=None):
    """Full-model distributed CR draw: the sharded counterpart of
    joint.sample_joint (and of amplitude's pixel-mixing operator when
    sys.F_pix is set). Returns (JointState, CGResult)."""
    from ..sampling import joint as joint_mod

    inv2_r, inv1_r, data_r, fpix_r, ts_r, w_r = full_model_ring_payload(
        sys, plan, mesh, ts, axis)

    def apply_A(x):
        m = _band_maps_sharded(sys, plan, mesh, x, ts, ps, fpix_r, ts_r,
                               w_r, axis, band_axis)
        m = m * inv2_r
        r = _band_maps_adj_sharded(sys, plan, mesh, m, ts, ps, fpix_r,
                                   ts_r, w_r, axis, band_axis)
        a = x.a + r.a
        t = None if ts is None \
            else x.t * jnp.square(ts.prior_istd) + r.t + 1e-12 * x.t
        p = None if ps is None \
            else x.p * jnp.square(ps.prior_istd) + r.p + 1e-12 * x.p
        return joint_mod.JointState(a=a, t=t, p=p)

    # RHS (mirrors joint.compute_rhs_joint in the ring layout)
    w = data_r * inv2_r
    if key is not None:
        k1, k2 = jax.random.split(key)
        eta1 = jax.random.normal(k1, data_r.shape, data_r.dtype)
        w = w + eta1 * inv1_r
    r = _band_maps_adj_sharded(sys, plan, mesh, w, ts, ps, fpix_r, ts_r,
                               w_r, axis, band_axis)
    a, t, p = r.a, r.t, r.p
    if ts is not None:
        t = t + jnp.square(ts.prior_istd) * ts.prior_mean
    if ps is not None:
        p = p + jnp.square(ps.prior_istd) * ps.prior_mean
    if key is not None:
        from ..sphere.alm import random_alm_white
        a = a + random_alm_white(k2, a.shape, sys.data.dtype) * sys.tri
        if ts is not None:
            kt, k2 = jax.random.split(k2)
            t = t + ts.prior_istd * jax.random.normal(kt, t.shape, t.dtype)
        if ps is not None:
            kp, k2 = jax.random.split(k2)
            p = p + ps.prior_istd * jax.random.normal(kp, p.shape, p.dtype)
    rhs = joint_mod.JointState(a=a, t=t, p=p)

    M = joint_mod.build_joint_preconditioner(sys, plan, ts, ps)
    res = pcg(apply_A, rhs, M_inv=M, dot=joint_mod.joint_dot, tol=tol,
              maxiter=maxiter)
    x = res.x
    return joint_mod.JointState(a=amp._sqrtS(sys, x.a), t=x.t, p=x.p), res
