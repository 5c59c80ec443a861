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
from jax import shard_map

from ..sphere.sht import SHTPlan, ring_synthesis, ring_analysis


def _pad_axis(x, axis: int, mult: int):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _batch_specs(nbatch: int, batch_axis):
    """Leading batch-dim specs: dim 0 optionally sharded on a second mesh
    axis (the P3 band axis of a band x sphere 2-D mesh)."""
    if batch_axis is None:
        return [None] * nbatch
    assert nbatch >= 1, "batch_axis requires a leading batch dimension"
    return [batch_axis] + [None] * (nbatch - 1)


def sharded_alm2map_rings(plan: SHTPlan, alm: jnp.ndarray, mesh: Mesh,
                          axis: str = "sphere", batch_axis: str | None = None):
    """Y with the single transform sharded across `axis`.

    alm: (..., nl, nm) complex (replicated input is fine; it is resharded).
    Returns padded-ring maps (..., nring_pad, pmax) sharded on the ring
    axis (invalid slots zero). With `batch_axis`, the leading batch dim
    (band) is additionally sharded on that mesh axis (2-D band x sphere).
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

    spec_m = P(*(_batch_specs(alm.ndim - 1, batch_axis) + [axis]))
    spec_ring = P(*(_batch_specs(alm.ndim - 2, batch_axis) + [axis, None]))

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


def sharded_alm2map_spin2_rings(plan: SHTPlan, alm_E: jnp.ndarray,
                                alm_B: jnp.ndarray, mesh: Mesh,
                                axis: str = "sphere",
                                batch_axis: str | None = None):
    """Spin-2 Y sharded across `axis`: (E, B) alms -> complex polarization
    P = Q + iU in the padded-ring layout (ring-sharded).

    Same structure as the spin-0 kernel, with both (+2, -2) Legendre tables
    m-sharded and the two ring streams transposed in ONE all_to_all
    (stacked on a leading axis). HEALPix convention as
    sphere.sht.alm2map_spin2."""
    assert plan.lam_p2 is not None, "plan built without spin2=True"
    ndev = mesh.shape[axis]
    nring = plan.nring
    nring_p = -(-nring // ndev) * ndev
    nm_p = -(-(plan.mmax + 1) // ndev) * ndev

    cp = _pad_axis(-(alm_E + 1j * alm_B).astype(plan.cdtype), -1, ndev)
    cm = _pad_axis(-(alm_E - 1j * alm_B).astype(plan.cdtype), -1, ndev)
    lp = _pad_axis(plan.lam_p2, -1, ndev)
    lm = _pad_axis(plan.lam_m2, -1, ndev)
    parity_p = _pad_axis(plan.parity, -1, ndev)
    tri_p = _pad_axis(plan.lmmask, -1, ndev)
    mpos = jnp.concatenate([jnp.zeros((1,)), jnp.ones((nm_p - 1,))]
                           ).astype(plan.rdtype)
    synth_A = _pad_axis(_pad_axis(plan.synth_A, 0, ndev), 1, ndev)
    synth_Vh = _pad_axis(plan.synth_Vh, 0, ndev)
    synth_B = _pad_axis(plan.synth_B, 0, ndev)

    nb = alm_E.ndim - 2
    spec_m = P(*(_batch_specs(nb + 1, batch_axis) + [axis]))
    spec_ring = P(*(_batch_specs(nb, batch_axis) + [axis, None]))

    def _leg(a, par, tab_n, tab_s):
        Fn = jnp.einsum("...lm,rlm->...rm", a, tab_n)
        Fs = jnp.einsum("...lm,rlm->...rm", a * par, tab_s)
        south = jnp.flip(Fs[..., : plan.nh - 1, :], axis=-2)
        F = jnp.concatenate([Fn, south], axis=-2)
        return jnp.pad(F, [(0, 0)] * (F.ndim - 2)
                       + [(0, nring_p - nring), (0, 0)])

    @partial(shard_map, mesh=mesh,
             in_specs=(spec_m, spec_m, P(None, None, axis), P(None, None, axis),
                       P(None, axis), P(None, axis), P(axis, None),
                       P(axis, None), P(axis, None), P(axis)),
             out_specs=spec_ring)
    def kernel(cp_m, cm_m, lp_m, lm_m, par_m, tri_m, sA_r, sVh_r, sB_r,
               mpos_m):
        Sp = _leg(cp_m * tri_m, par_m, lp_m, lm_m)
        Sm = _leg(cm_m * tri_m, par_m, lm_m, lp_m) * mpos_m
        F2 = jnp.stack([Sp, Sm])                     # (2, ..., nring_p, nm/k)
        F2 = jax.lax.all_to_all(F2, axis, split_axis=F2.ndim - 2,
                                concat_axis=F2.ndim - 1, tiled=True)

        def blue(F):
            u = F * sA_r[:, : F.shape[-1]]
            flat = u.reshape(-1, u.shape[-1])
            U = jnp.fft.fft(flat, n=plan.Ls, axis=-1).reshape(
                *u.shape[:-1], plan.Ls)
            w = jnp.fft.ifft((U * sVh_r).reshape(-1, plan.Ls),
                             axis=-1).reshape(*u.shape[:-1], plan.Ls)
            w = jax.lax.slice_in_dim(w, plan.mmax, plan.mmax + plan.pmax,
                                     axis=-1)
            return w * sB_r

        return blue(F2[0]) + jnp.conj(blue(F2[1]))

    return kernel(cp, cm, lp, lm, parity_p, tri_p, synth_A, synth_Vh,
                  synth_B, mpos)


def sharded_spin2_adjoint_rings(plan: SHTPlan, fr: jnp.ndarray, mesh: Mesh,
                                axis: str = "sphere", ndim_batch: int = 1,
                                batch_axis: str | None = None):
    """Adjoint of sharded_alm2map_spin2_rings: padded-ring complex
    P = Q + iU (ring-sharded) -> (E_hat, B_hat) m-sharded.

    Mirrors sphere.sht.alm2map_spin2_adjoint exactly (eps-metric)."""
    assert plan.lam_p2 is not None
    ndev = mesh.shape[axis]
    nring = plan.nring
    nm = plan.mmax + 1
    nm_p = -(-nm // ndev) * ndev

    lp = _pad_axis(plan.lam_p2, -1, ndev)
    lm = _pad_axis(plan.lam_m2, -1, ndev)
    parity_p = _pad_axis(plan.parity, -1, ndev)
    tri_p = _pad_axis(plan.lmmask, -1, ndev)
    ana_A = _pad_axis(plan.ana_A, 0, ndev)
    ana_Vh = _pad_axis(plan.ana_Vh, 0, ndev)
    ana_B = _pad_axis(_pad_axis(plan.ana_B, 0, ndev), 1, ndev)
    mpos = jnp.concatenate([jnp.zeros((1,)), jnp.ones((nm_p - 1,))]
                           ).astype(plan.rdtype)
    eps = jnp.concatenate([jnp.ones((1,)), 2.0 * jnp.ones((nm_p - 1,))]
                          ).astype(plan.rdtype)

    nb = ndim_batch
    spec_ring = P(*(_batch_specs(nb, batch_axis) + [axis, None]))
    spec_m = P(*(_batch_specs(nb, batch_axis) + [None, axis]))

    def _leg_adj(F, par, tab_n, tab_s):
        Fn = F[..., : plan.nh, :]
        Fs = jnp.flip(F[..., plan.nh: nring, :], axis=-2)
        a = jnp.einsum("...rm,rlm->...lm", Fn, tab_n)
        a = a + jnp.einsum("...rm,rlm->...lm", Fs,
                           tab_s[: plan.nh - 1]) * par
        return a

    @partial(shard_map, mesh=mesh,
             in_specs=(spec_ring, P(None, None, axis), P(None, None, axis),
                       P(None, axis), P(None, axis), P(axis, None),
                       P(axis, None), P(axis, None), P(axis), P(axis)),
             out_specs=(spec_m, spec_m))
    def kernel(f_r, lp_m, lm_m, par_m, tri_m, aA_r, aVh_r, aB_r, mpos_m,
               eps_m):
        def blue(u):
            u = u * aA_r
            flat = u.reshape(-1, u.shape[-1])
            U = jnp.fft.fft(flat, n=plan.La, axis=-1).reshape(
                *u.shape[:-1], plan.La)
            w = jnp.fft.ifft((U * aVh_r).reshape(-1, plan.La),
                             axis=-1).reshape(*u.shape[:-1], plan.La)
            w = jax.lax.slice_in_dim(w, plan.pmax - 1,
                                     plan.pmax - 1 + aB_r.shape[-1], axis=-1)
            return w * aB_r

        Gp = blue(f_r.astype(plan.cdtype))
        K = blue(jnp.conj(f_r).astype(plan.cdtype))
        F2 = jnp.stack([Gp, K])                      # (2, ..., nring_p/k, nm_p)
        F2 = jax.lax.all_to_all(F2, axis, split_axis=F2.ndim - 1,
                                concat_axis=F2.ndim - 2, tiled=True)
        Up = _leg_adj(F2[0], par_m, lp_m, lm_m) * tri_m
        Um = _leg_adj(F2[1], par_m, lm_m, lp_m) * tri_m * mpos_m
        Eh = -(Up + Um) / eps_m
        Bh = 1j * (Up - Um) / eps_m
        return Eh, Bh

    return kernel(fr, lp, lm, parity_p, tri_p, ana_A, ana_Vh, ana_B, mpos,
                  eps)


def sharded_alm2map_adjoint_rings(plan: SHTPlan, fr: jnp.ndarray, mesh: Mesh,
                                  axis: str = "sphere", ndim_batch: int = 1,
                                  batch_axis: str | None = None):
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
    spec_ring = P(*(_batch_specs(nb, batch_axis) + [axis, None]))
    spec_m = P(*(_batch_specs(nb, batch_axis) + [None, axis]))

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


# ---------------------------------------------------------------------------
# On-the-fly (tableless) sharded transforms: the nside >= 1024 path where
# even the m-shard of a Legendre table would not fit HBM. The recurrence
# state (seeds, coefficients) is sharded on m; each device regenerates its
# m-block Lambda chunks on the fly (sht_otf), then the standard all_to_all
# ring transpose + ring-local Bluestein stages run as in the table kernels.
# ---------------------------------------------------------------------------

def _otf_local(otf, seed_mant, seed_exp, A, Bc, beta, parity_m, m_vals):
    """Rebuild a LegendreOTF view over a local m-block inside shard_map."""
    import dataclasses as dc

    return dc.replace(otf, seed_mant=seed_mant, seed_exp=seed_exp, A=A,
                      Bc=Bc, beta=beta, parity_m=parity_m, m_vals=m_vals,
                      mmax=m_vals.shape[0] - 1)


def _otf_sharded_parts(otf, ndev):
    parts = dict(
        seed_mant=_pad_axis(otf.seed_mant, -1, ndev),
        seed_exp=_pad_axis(otf.seed_exp, -1, ndev),
        A=_pad_axis(otf.A, -1, ndev),
        Bc=_pad_axis(otf.Bc, -1, ndev),
        beta=_pad_axis(otf.beta, -1, ndev),
        parity_m=_pad_axis(otf.parity_m, -1, ndev),
        m_vals=_pad_axis(otf.m_vals, -1, ndev),
    )
    specs = dict(seed_mant=P(None, "__AX__"), seed_exp=P(None, "__AX__"),
                 A=P(None, "__AX__"), Bc=P(None, "__AX__"),
                 beta=P(None, "__AX__"), parity_m=P("__AX__"),
                 m_vals=P("__AX__"))
    return parts, specs


def sharded_alm2map_otf_rings(plan: SHTPlan, otf, alm: jnp.ndarray,
                              mesh: Mesh, axis: str = "sphere"):
    """Tableless Y sharded across `axis`: on-the-fly Legendre per m-block +
    all_to_all ring transpose + ring-local Bluestein. Output as
    sharded_alm2map_rings (padded-ring maps, ring-sharded)."""
    from ..sphere.sht_otf import synth_legendre_otf

    ndev = mesh.shape[axis]
    nring = plan.nring
    nring_p = -(-nring // ndev) * ndev
    nm_p = -(-(plan.mmax + 1) // ndev) * ndev

    alm_p = _pad_axis(alm.astype(plan.cdtype), -1, ndev)
    parts, specs = _otf_sharded_parts(otf, ndev)
    fix = lambda s: P(*[axis if x == "__AX__" else x for x in s])
    scale = jnp.concatenate([jnp.ones((1,)), 2.0 * jnp.ones((nm_p - 1,))]
                            ).astype(plan.rdtype)
    synth_A = _pad_axis(_pad_axis(plan.synth_A, 0, ndev), 1, ndev)
    synth_Vh = _pad_axis(plan.synth_Vh, 0, ndev)
    synth_B = _pad_axis(plan.synth_B, 0, ndev)

    spec_m = P(*([None] * (alm.ndim - 1) + [axis]))
    spec_ring = P(*([None] * (alm.ndim - 2) + [axis, None]))
    part_keys = sorted(parts)

    @partial(shard_map, mesh=mesh,
             in_specs=(spec_m,) + tuple(fix(specs[k]) for k in part_keys)
             + (P(axis, None), P(axis, None), P(axis, None), P(axis)),
             out_specs=spec_ring)
    def kernel(a_m, *rest):
        pk = dict(zip(part_keys, rest[: len(part_keys)]))
        sA_r, sVh_r, sB_r, scale_m = rest[len(part_keys):]
        lotf = _otf_local(otf, pk["seed_mant"], pk["seed_exp"], pk["A"],
                          pk["Bc"], pk["beta"], pk["parity_m"],
                          pk["m_vals"])
        Fn, Fs = synth_legendre_otf(lotf, None, a_m, plan.nh)
        south = jnp.flip(Fs[..., : plan.nh - 1, :], axis=-2)
        F = jnp.concatenate([Fn, south], axis=-2) * scale_m
        F = jnp.pad(F, [(0, 0)] * (F.ndim - 2)
                    + [(0, nring_p - nring), (0, 0)])
        F = jax.lax.all_to_all(F, axis, split_axis=F.ndim - 2,
                               concat_axis=F.ndim - 1, tiled=True)
        u = F * sA_r[:, : F.shape[-1]]
        flat = u.reshape(-1, u.shape[-1])
        U = jnp.fft.fft(flat, n=plan.Ls, axis=-1).reshape(
            *u.shape[:-1], plan.Ls)
        w = jnp.fft.ifft((U * sVh_r).reshape(-1, plan.Ls), axis=-1).reshape(
            *u.shape[:-1], plan.Ls)
        w = jax.lax.slice_in_dim(w, plan.mmax, plan.mmax + plan.pmax,
                                 axis=-1)
        return (w * sB_r).real.astype(plan.rdtype)

    return kernel(alm_p, *[parts[k] for k in part_keys], synth_A, synth_Vh,
                  synth_B, scale)


def sharded_adjoint_otf_rings(plan: SHTPlan, otf, fr: jnp.ndarray,
                              mesh: Mesh, axis: str = "sphere",
                              ndim_batch: int = 1):
    """Tableless Yt sharded across `axis` (adjoint of
    sharded_alm2map_otf_rings)."""
    from ..sphere.sht_otf import adjoint_legendre_otf

    ndev = mesh.shape[axis]
    nring = plan.nring

    parts, specs = _otf_sharded_parts(otf, ndev)
    fix = lambda s: P(*[axis if x == "__AX__" else x for x in s])
    ana_A = _pad_axis(plan.ana_A, 0, ndev)
    ana_Vh = _pad_axis(plan.ana_Vh, 0, ndev)
    ana_B = _pad_axis(_pad_axis(plan.ana_B, 0, ndev), 1, ndev)

    nb = ndim_batch
    spec_ring = P(*([None] * nb + [axis, None]))
    spec_m = P(*([None] * nb + [None, axis]))
    part_keys = sorted(parts)

    @partial(shard_map, mesh=mesh,
             in_specs=(spec_ring,) + tuple(fix(specs[k]) for k in part_keys)
             + (P(axis, None), P(axis, None), P(axis, None)),
             out_specs=spec_m)
    def kernel(f_r, *rest):
        pk = dict(zip(part_keys, rest[: len(part_keys)]))
        aA_r, aVh_r, aB_r = rest[len(part_keys):]
        u = f_r.astype(plan.cdtype) * aA_r
        flat = u.reshape(-1, u.shape[-1])
        U = jnp.fft.fft(flat, n=plan.La, axis=-1).reshape(
            *u.shape[:-1], plan.La)
        w = jnp.fft.ifft((U * aVh_r).reshape(-1, plan.La), axis=-1).reshape(
            *u.shape[:-1], plan.La)
        w = jax.lax.slice_in_dim(w, plan.pmax - 1,
                                 plan.pmax - 1 + aB_r.shape[-1], axis=-1)
        F = w * aB_r
        F = jax.lax.all_to_all(F, axis, split_axis=F.ndim - 1,
                               concat_axis=F.ndim - 2, tiled=True)
        lotf = _otf_local(otf, pk["seed_mant"], pk["seed_exp"], pk["A"],
                          pk["Bc"], pk["beta"], pk["parity_m"],
                          pk["m_vals"])
        F_n = F[..., : plan.nh, :]
        F_s = jnp.flip(F[..., plan.nh: nring, :], axis=-2)
        pad = plan.nh - 1 - F_s.shape[-2]
        F_s = jnp.pad(F_s, [(0, 0)] * (F_s.ndim - 2)
                      + [(0, pad + 1), (0, 0)])
        return adjoint_legendre_otf(lotf, F_n, F_s)

    return kernel(fr, *[parts[k] for k in part_keys], ana_A, ana_Vh, ana_B)
