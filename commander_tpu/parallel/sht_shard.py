"""Multi-chip SHT: m-sharded Legendre stage + all_to_all ring transpose.

The P2 parallelism of SURVEY.md §2.11 — the reference shards alms by m and
maps by rings across MPI ranks, with the transpose hidden inside
``sharp_execute_mpi``. TPU-native version under ``shard_map``:

  * alm (and the Legendre table) are sharded on the m axis: the Legendre
    contraction is embarrassingly parallel over m;
  * one ``all_to_all`` re-shards the ring spectra F from m-shards to
    ring-shards (the libsharp transpose, riding ICI);
  * the Bluestein ring stage and the pixel gather run ring-local, with
    maps produced in the padded (nring, pmax) ring layout sharded by ring
    blocks (equal shapes; the npix layout is a local reshape/gather away).

Requires nring % ndev == 0 is NOT necessary — ring rows are padded to a
multiple of the mesh size.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..sphere.sht import SHTPlan, ring_synthesis, ring_analysis


def _pad_axis(x, axis: int, mult: int):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def sharded_alm2map_rings(plan: SHTPlan, alm: jnp.ndarray, mesh: Mesh,
                          axis: str = "sphere"):
    """Y with the single transform sharded across `axis`.

    alm: (..., nl, nm) complex (replicated input is fine; it is resharded).
    Returns padded-ring maps (..., nring_pad, pmax) sharded on the ring
    axis (invalid slots zero).
    """
    ndev = mesh.shape[axis]
    nl = plan.lmax + 1
    nm_p = -(-(plan.mmax + 1) // ndev) * ndev
    nring = plan.nring
    nring_p = -(-nring // ndev) * ndev

    alm_p = _pad_axis(alm.astype(plan.cdtype), -1, ndev)
    lam_p = _pad_axis(plan.lam0, -1, ndev)
    parity_p = _pad_axis(plan.parity, -1, ndev)
    tri_p = _pad_axis(plan.lmmask, -1, ndev)
    scale = jnp.concatenate([jnp.ones((1,)), 2.0 * jnp.ones((nm_p - 1,))]
                            ).astype(plan.rdtype)
    synth_A = _pad_axis(_pad_axis(plan.synth_A, 0, ndev), 1, ndev)
    synth_Vh = _pad_axis(plan.synth_Vh, 0, ndev)
    synth_B = _pad_axis(plan.synth_B, 0, ndev)

    spec_m = P(*([None] * (alm.ndim - 1) + [axis]))
    spec_ring = P(*([None] * (alm.ndim - 2) + [axis, None]))

    @partial(shard_map, mesh=mesh,
             in_specs=(spec_m, P(None, None, axis), P(None, axis),
                       P(None, axis), P(axis, None), P(axis, None),
                       P(axis, None), P(axis)),
             out_specs=spec_ring)
    def kernel(a_m, lam_m, par_m, tri_m, sA_r, sVh_r, sB_r, scale_m):
        # Legendre stage: local m-block, all rings (north half in table)
        a_m = a_m * tri_m
        Fn = jnp.einsum("...lm,rlm->...rm", a_m, lam_m)
        Fs = jnp.einsum("...lm,rlm->...rm", a_m * par_m, lam_m)
        south = jnp.flip(Fs[..., : plan.nh - 1, :], axis=-2)
        F = jnp.concatenate([Fn, south], axis=-2)          # (..., nring, nm/k)
        F = F * scale_m
        F = jnp.pad(F, [(0, 0)] * (F.ndim - 2)
                    + [(0, nring_p - nring), (0, 0)])      # (..., nring_p, nm/k)
        # transpose: m-shards -> ring-shards (the libsharp MPI transpose)
        F = jax.lax.all_to_all(F, axis, split_axis=F.ndim - 2,
                               concat_axis=F.ndim - 1, tiled=True)
        # ring-local Bluestein synthesis: F (..., nring_p/k, nm_p)
        u = F * sA_r[:, : F.shape[-1]]
        flat = u.reshape(-1, u.shape[-1])
        U = jnp.fft.fft(flat, n=plan.Ls, axis=-1).reshape(
            *u.shape[:-1], plan.Ls)
        w = jnp.fft.ifft((U * sVh_r).reshape(-1, plan.Ls), axis=-1).reshape(
            *u.shape[:-1], plan.Ls)
        w = jax.lax.slice_in_dim(w, plan.mmax, plan.mmax + plan.pmax, axis=-1)
        return (w * sB_r).real.astype(plan.rdtype)

    return kernel(alm_p, lam_p, parity_p, tri_p, synth_A, synth_Vh, synth_B,
                  scale)


def rings_to_map(plan: SHTPlan, fr: jnp.ndarray) -> jnp.ndarray:
    """Padded-ring layout (..., nring_pad, pmax) -> (..., npix)."""
    flat = fr[..., : plan.nring, :].reshape(*fr.shape[:-2], -1)
    return flat[..., plan.pix_idx]


def map_to_rings(plan: SHTPlan, maps: jnp.ndarray, mult: int) -> jnp.ndarray:
    """(..., npix) -> padded-ring layout (..., nring_pad, pmax)."""
    flat = maps[..., plan.pad_src] * plan.pad_valid
    fr = flat.reshape(*maps.shape[:-1], plan.nring, plan.pmax)
    return _pad_axis(fr, -2, mult)


def sharded_alm2map_adjoint_rings(plan: SHTPlan, fr: jnp.ndarray, mesh: Mesh,
                                  axis: str = "sphere", ndim_batch: int = 1):
    """Yt with the transform sharded across `axis` (adjoint of
    sharded_alm2map_rings): padded-ring maps (ring-sharded) -> alm
    (m-sharded output, replicate with jax.device_put if needed).
    """
    ndev = mesh.shape[axis]
    nl = plan.lmax + 1
    nm = plan.mmax + 1
    nm_p = -(-nm // ndev) * ndev
    nring = plan.nring
    nring_p = -(-nring // ndev) * ndev

    lam_p = _pad_axis(plan.lam0, -1, ndev)
    parity_p = _pad_axis(plan.parity, -1, ndev)
    tri_p = _pad_axis(plan.lmmask, -1, ndev)
    ana_A = _pad_axis(plan.ana_A, 0, ndev)
    ana_Vh = _pad_axis(plan.ana_Vh, 0, ndev)
    ana_B = _pad_axis(_pad_axis(plan.ana_B, 0, ndev), 1, ndev)

    nb = ndim_batch
    spec_ring = P(*([None] * nb + [axis, None]))
    spec_m = P(*([None] * nb + [None, axis]))

    @partial(shard_map, mesh=mesh,
             in_specs=(spec_ring, P(None, None, axis), P(None, axis),
                       P(None, axis), P(axis, None), P(axis, None),
                       P(axis, None)),
             out_specs=spec_m)
    def kernel(f_r, lam_m, par_m, tri_m, aA_r, aVh_r, aB_r):
        # ring-local Bluestein analysis
        u = f_r.astype(plan.cdtype) * aA_r
        flat = u.reshape(-1, u.shape[-1])
        U = jnp.fft.fft(flat, n=plan.La, axis=-1).reshape(
            *u.shape[:-1], plan.La)
        w = jnp.fft.ifft((U * aVh_r).reshape(-1, plan.La), axis=-1).reshape(
            *u.shape[:-1], plan.La)
        w = jax.lax.slice_in_dim(w, plan.pmax - 1,
                                 plan.pmax - 1 + aB_r.shape[-1], axis=-1)
        F = w * aB_r                                   # (..., nring_p/k, nm_p)
        # transpose back: ring-shards -> m-shards
        F = jax.lax.all_to_all(F, axis, split_axis=F.ndim - 1,
                               concat_axis=F.ndim - 2, tiled=True)
        # F now (..., nring_p, nm_p/k); Legendre adjoint on local m-block
        Fn = F[..., : plan.nh, :]
        Fs = jnp.flip(F[..., plan.nh: nring, :], axis=-2)
        a = jnp.einsum("...rm,rlm->...lm", Fn, lam_m)
        a = a + jnp.einsum("...rm,rlm->...lm", Fs,
                           lam_m[: plan.nh - 1]) * par_m
        return a * tri_m

    return kernel(fr, lam_p, parity_p, tri_p, ana_A, ana_Vh, ana_B)
