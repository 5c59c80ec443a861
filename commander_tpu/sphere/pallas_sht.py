"""Pallas TPU kernel: fused on-the-fly Legendre synthesis.

The performance core of the large-lmax SHT (see sht_otf.py for the
XLA-level version): for each (ring-block, m-block) tile the kernel runs
the full scaled three-term recurrence over l INSIDE the kernel — carries
(lambda_{l-1}, lambda_l, block exponents) live in VMEM/registers for the
whole l-loop instead of round-tripping through HBM per scan step, and the
per-l accumulation F += a_l * lambda_l fuses into the same loop. Emits the
even/odd (l+m)-parity accumulators from which north/south hemisphere ring
spectra follow (F_n = Fe + Fo, F_s = Fe - Fo).

Correctness is pinned against the host Wigner tables (tests run the
interpret path; the compiled path shares the same kernel body).
"""
from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sht_otf import _SCALE_POW, LegendreOTF


def _synth_kernel(nl: int, lmax: int, mp: int,
                  seed_m_ref, seed_e_ref, A_ref, B_ref, beta_ref, x_ref,
                  norm_ref,
                  a_re_ref, a_im_ref,
                  fe_re_ref, fe_im_ref, fo_re_ref, fo_im_ref):
    BH, BM = seed_m_ref.shape
    big = jnp.float32(2.0 ** _SCALE_POW)
    bigi = jnp.float32(2.0 ** -_SCALE_POW)
    x = x_ref[:, 0:1]                                   # (BH, 1)
    m_ids = pl.program_id(1) * BM + jax.lax.broadcasted_iota(
        jnp.int32, (BH, BM), 1)
    m_par = 1.0 - 2.0 * (m_ids % 2).astype(jnp.float32)  # (-1)^m

    def body(l, carry):
        prev, prev_e, cur, cur_e, ac_er, ac_ei, ac_or, ac_oi = carry
        start = jnp.maximum(m_ids, abs(mp)) == l
        cur = jnp.where(start, seed_m_ref[:, :], cur)
        cur_e = jnp.where(start, seed_e_ref[:, :], cur_e)
        prev = jnp.where(start, 0.0, prev)
        prev_e = jnp.where(start, 0, prev_e)
        emit = jnp.where(cur_e == 0, cur,
                         jnp.where(cur_e == -1, cur * bigi,
                                   jnp.where(cur_e == -2,
                                             cur * (bigi * bigi), 0.0)))
        emit = emit * norm_ref[l, 0]
        # accumulate F += a_l * lambda_l into parity accumulators
        a_re = a_re_ref[l, :]                            # (BM,)
        a_im = a_im_ref[l, :]
        l_par = 1.0 - 2.0 * jnp.float32(l % 2)
        even = 0.5 * (1.0 + l_par * m_par)               # (BH, BM)
        we = even * emit
        wo = emit - we
        ac_er = ac_er + we * a_re[None, :]
        ac_ei = ac_ei + we * a_im[None, :]
        ac_or = ac_or + wo * a_re[None, :]
        ac_oi = ac_oi + wo * a_im[None, :]
        # recurrence l -> l+1
        alpha = A_ref[l, :][None, :] * x + B_ref[l, :][None, :]
        de = prev_e - cur_e
        sc = jnp.where(de == 0, 1.0, jnp.where(de <= -1, bigi, big))
        sc = jnp.where(de <= -2, 0.0, sc)
        new = alpha * cur - beta_ref[l, :][None, :] * prev * sc
        grow = jnp.abs(new) > big
        new = jnp.where(grow, new * bigi, new)
        cur_sc = jnp.where(grow, cur * bigi, cur)
        new_e = cur_e + grow.astype(jnp.int32)
        return (cur_sc, cur_e, new, new_e, ac_er, ac_ei, ac_or, ac_oi)

    z = jnp.zeros((BH, BM), jnp.float32)
    zi = jnp.zeros((BH, BM), jnp.int32)
    init = (z, zi, z, jnp.full((BH, BM), -128, jnp.int32), z, z, z, z)
    out = jax.lax.fori_loop(0, nl, body, init)
    _, _, _, _, ac_er, ac_ei, ac_or, ac_oi = out
    fe_re_ref[:, :] = ac_er
    fe_im_ref[:, :] = ac_ei
    fo_re_ref[:, :] = ac_or
    fo_im_ref[:, :] = ac_oi


def synth_legendre_pallas(otf: LegendreOTF, alm: jnp.ndarray, nh: int,
                          block_h: int = 64, block_m: int = 128,
                          interpret: bool = False):
    """alm (nl, nm) complex64 -> (F_n, F_s) (nh, nm) complex64.

    Pallas version of sht_otf.synth_legendre_otf (single map; vmap for
    batches). Pads (nh, nm) up to block multiples."""
    nl = otf.lmax + 1
    nm = otf.mmax + 1
    nh_p = -(-nh // block_h) * block_h
    nm_p = -(-nm // block_m) * block_m

    padm = lambda a2: jnp.pad(a2, ((0, nh_p - a2.shape[0]),
                                   (0, nm_p - a2.shape[1])))
    padl = lambda a2: jnp.pad(a2, ((0, 0), (0, nm_p - a2.shape[1])))
    seeds = padm(otf.seed_mant.astype(jnp.float32))
    seede = padm(otf.seed_exp)
    A = padl(otf.A.astype(jnp.float32))
    B = padl(otf.Bc.astype(jnp.float32))
    beta = padl(otf.beta.astype(jnp.float32))
    x = jnp.pad(otf.x.astype(jnp.float32), (0, nh_p - nh))[:, None]
    norm = otf.norm.astype(jnp.float32)[:, None]
    a_re = padl(alm.real.astype(jnp.float32))
    a_im = padl(alm.imag.astype(jnp.float32))

    grid = (nh_p // block_h, nm_p // block_m)
    bs = pl.BlockSpec((block_h, block_m), lambda i, j: (i, j))
    bs_l = pl.BlockSpec((nl, block_m), lambda i, j: (0, j))
    bs_x = pl.BlockSpec((block_h, 1), lambda i, j: (i, 0))
    bs_n = pl.BlockSpec((nl, 1), lambda i, j: (0, 0))

    out_shape = [jax.ShapeDtypeStruct((nh_p, nm_p), jnp.float32)] * 4
    kern = partial(_synth_kernel, nl, otf.lmax, otf.mp)
    fe_re, fe_im, fo_re, fo_im = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bs, bs, bs_l, bs_l, bs_l, bs_x, bs_n, bs_l, bs_l],
        out_specs=[bs, bs, bs, bs],
        out_shape=out_shape,
        interpret=interpret,
    )(seeds, seede, A, B, beta, x, norm, a_re, a_im)

    Fe = (fe_re + 1j * fe_im)[:nh, :nm]
    Fo = (fo_re + 1j * fo_im)[:nh, :nm]
    return Fe + Fo, Fe - Fo


def _adj_kernel(nl: int, lmax: int, mp: int,
                seed_m_ref, seed_e_ref, A_ref, B_ref, beta_ref, x_ref,
                norm_ref,
                ge_re_ref, ge_im_ref, go_re_ref, go_im_ref,
                a_re_ref, a_im_ref):
    """Adjoint of the Legendre stage: a[l,m] += sum_r lambda_l(r) G(r,m),
    with the even/odd (l+m)-parity split of the hemisphere sums (same
    contraction as adjoint_legendre_otf; the l-recurrence is identical to
    the synthesis kernel). Ring-block partial sums accumulate in the
    revisited output block across the sequential TPU grid axis."""
    BH, BM = seed_m_ref.shape
    big = jnp.float32(2.0 ** _SCALE_POW)
    bigi = jnp.float32(2.0 ** -_SCALE_POW)
    x = x_ref[:, 0:1]
    m_ids = pl.program_id(0) * BM + jax.lax.broadcasted_iota(
        jnp.int32, (BH, BM), 1)
    m_par = 1.0 - 2.0 * (m_ids % 2).astype(jnp.float32)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        a_re_ref[:, :] = jnp.zeros_like(a_re_ref)
        a_im_ref[:, :] = jnp.zeros_like(a_im_ref)

    ge_re = ge_re_ref[:, :]
    ge_im = ge_im_ref[:, :]
    go_re = go_re_ref[:, :]
    go_im = go_im_ref[:, :]

    def body(l, carry):
        prev, prev_e, cur, cur_e = carry
        start = jnp.maximum(m_ids, abs(mp)) == l
        cur = jnp.where(start, seed_m_ref[:, :], cur)
        cur_e = jnp.where(start, seed_e_ref[:, :], cur_e)
        prev = jnp.where(start, 0.0, prev)
        prev_e = jnp.where(start, 0, prev_e)
        emit = jnp.where(cur_e == 0, cur,
                         jnp.where(cur_e == -1, cur * bigi,
                                   jnp.where(cur_e == -2,
                                             cur * (bigi * bigi), 0.0)))
        emit = emit * norm_ref[l, 0]
        l_par = 1.0 - 2.0 * jnp.float32(l % 2)
        even = 0.5 * (1.0 + l_par * m_par)               # (BH, BM)
        we = even * emit
        wo = emit - we
        row_re = jnp.sum(we * ge_re + wo * go_re, axis=0)[None, :]
        row_im = jnp.sum(we * ge_im + wo * go_im, axis=0)[None, :]
        idx = (pl.dslice(l, 1), slice(None))
        a_re_ref[idx] = a_re_ref[idx] + row_re
        a_im_ref[idx] = a_im_ref[idx] + row_im
        # recurrence l -> l+1
        alpha = A_ref[l, :][None, :] * x + B_ref[l, :][None, :]
        de = prev_e - cur_e
        sc = jnp.where(de == 0, 1.0, jnp.where(de <= -1, bigi, big))
        sc = jnp.where(de <= -2, 0.0, sc)
        new = alpha * cur - beta_ref[l, :][None, :] * prev * sc
        grow = jnp.abs(new) > big
        new = jnp.where(grow, new * bigi, new)
        cur_sc = jnp.where(grow, cur * bigi, cur)
        new_e = cur_e + grow.astype(jnp.int32)
        return (cur_sc, cur_e, new, new_e)

    z = jnp.zeros((BH, BM), jnp.float32)
    zi = jnp.zeros((BH, BM), jnp.int32)
    jax.lax.fori_loop(0, nl, body, (z, zi, z, jnp.full((BH, BM), -128,
                                                       jnp.int32)))


def adjoint_legendre_pallas(otf: LegendreOTF, F_n: jnp.ndarray,
                            F_s: jnp.ndarray, block_h: int = 64,
                            block_m: int = 128, interpret: bool = False):
    """(F_north, F_south) (nh, nm) complex64 -> alm (nl, nm) complex64.

    Pallas version of sht_otf.adjoint_legendre_otf: the grid is
    (m-blocks, ring-blocks) with the ring axis innermost so each m-block's
    (nl, BM) output stays resident in VMEM while ring-block partial sums
    accumulate (the Y^t of comm_map_mod.f90:511-530 at scale)."""
    nl = otf.lmax + 1
    nm = otf.mmax + 1
    nh = F_n.shape[0]
    nh_p = -(-nh // block_h) * block_h
    nm_p = -(-nm // block_m) * block_m

    padm = lambda a2: jnp.pad(a2, ((0, nh_p - a2.shape[0]),
                                   (0, nm_p - a2.shape[1])))
    padl = lambda a2: jnp.pad(a2, ((0, 0), (0, nm_p - a2.shape[1])))
    seeds = padm(otf.seed_mant.astype(jnp.float32))
    seede = padm(otf.seed_exp)
    A = padl(otf.A.astype(jnp.float32))
    B = padl(otf.Bc.astype(jnp.float32))
    beta = padl(otf.beta.astype(jnp.float32))
    x = jnp.pad(otf.x.astype(jnp.float32), (0, nh_p - nh))[:, None]
    norm = otf.norm.astype(jnp.float32)[:, None]
    Ge = F_n + F_s
    Go = F_n - F_s
    ge_re, ge_im = padm(Ge.real.astype(jnp.float32)), \
        padm(Ge.imag.astype(jnp.float32))
    go_re, go_im = padm(Go.real.astype(jnp.float32)), \
        padm(Go.imag.astype(jnp.float32))

    grid = (nm_p // block_m, nh_p // block_h)      # ring axis innermost
    bs = pl.BlockSpec((block_h, block_m), lambda j, i: (i, j))
    bs_l = pl.BlockSpec((nl, block_m), lambda j, i: (0, j))
    bs_x = pl.BlockSpec((block_h, 1), lambda j, i: (i, 0))
    bs_n = pl.BlockSpec((nl, 1), lambda j, i: (0, 0))

    out_shape = [jax.ShapeDtypeStruct((nl, nm_p), jnp.float32)] * 2
    kern = partial(_adj_kernel, nl, otf.lmax, otf.mp)
    a_re, a_im = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bs, bs, bs_l, bs_l, bs_l, bs_x, bs_n, bs, bs, bs, bs],
        out_specs=[bs_l, bs_l],
        out_shape=out_shape,
        interpret=interpret,
    )(seeds, seede, A, B, beta, x, norm, ge_re, ge_im, go_re, go_im)
    return (a_re + 1j * a_im)[:, :nm]


def alm2map_pallas(plan, otf: LegendreOTF, alm: jnp.ndarray,
                   block_h: int = 64, block_m: int = 128,
                   interpret: bool = False):
    """Full Y on the Pallas Legendre stage: same semantics as
    sht_otf.alm2map_otf (single map; f32 path)."""
    from .sht import _gather_pix, ring_synthesis

    F_n, F_s = synth_legendre_pallas(otf, alm.astype(jnp.complex64),
                                     plan.nh, block_h, block_m, interpret)
    south = jnp.flip(F_s[: plan.nh - 1, :], axis=-2)
    F = jnp.concatenate([F_n, south], axis=-2)
    scale = jnp.concatenate([jnp.ones((1,)),
                             2.0 * jnp.ones((plan.mmax,))]).astype(
        jnp.float32)
    f = ring_synthesis(plan, (F * scale).astype(plan.cdtype))
    return _gather_pix(plan, f.real.astype(plan.rdtype))


def map2alm_pallas(plan, otf: LegendreOTF, maps: jnp.ndarray,
                   block_h: int = 64, block_m: int = 128,
                   interpret: bool = False):
    """Full YtW on the Pallas Legendre-adjoint stage: same semantics as
    sht_otf.map2alm_otf (single map; f32 path)."""
    from .sht import _pad_to_rings, ring_analysis

    w = plan.ring_weight
    fpad = _pad_to_rings(plan, maps) * w[:, None]
    F = ring_analysis(plan, fpad.astype(plan.cdtype))
    F_n = F[: plan.nh, :]
    F_s = jnp.flip(F[plan.nh:, :], axis=-2)
    pad = plan.nh - 1 - F_s.shape[-2]
    F_s = jnp.pad(F_s, [(0, pad + 1), (0, 0)])
    return adjoint_legendre_pallas(otf, F_n.astype(jnp.complex64),
                                   F_s.astype(jnp.complex64),
                                   block_h, block_m, interpret)
