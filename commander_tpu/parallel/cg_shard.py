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
