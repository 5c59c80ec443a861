"""Pallas TPU kernels: fused on-the-fly Legendre synthesis / adjoint.

The performance core of the large-lmax SHT (see sht_otf.py for the
XLA-level version). The table path streams a (nh, nl, nm) Lambda table
from HBM — 34 GB at nside 1024 / lmax 2048, beyond one chip — and the
XLA OTF path regenerates Lambda by recurrence but round-trips every
(nh, nm) carry and every (L, nh, nm) Lambda block through HBM. Here the
whole pipeline is fused on-chip:

  * grid (ring-blocks, m-blocks, l-chunks); the scaled three-term
    recurrence carries (lambda_{l-1}, lambda_l, block exponents) live in
    VMEM scratch that persists across the innermost l-chunk axis — no
    HBM traffic for the recurrence at all;
  * the batch of alm vectors is processed INSIDE the kernel, so the
    recurrence cost is amortized over the whole batch (the XLA path and
    the earlier vmap-of-kernel design paid it per batch element);
  * per l the accumulation F_{n,s} += a_l * lambda_l fuses into the
    recurrence loop; north/south hemisphere spectra accumulate directly
    (lambda(pi-theta) = (-1)^(l+m) lambda(theta));
  * l-chunks entirely below an m-block's first m are skipped (the
    triangular (l >= m) structure — half the nominal work);
  * the sqrt((2l+1)/4pi) normalization is folded into the recurrence
    coefficients host-side (_coeff_pack), removing a per-l multiply.

Numerical scaling matches sht_otf._rec_step exactly, including the
emergence-boundary fix: after a rescale the carried lambda_l keeps the
*incremented* exponent (prev_e <- new_e), otherwise the beta*prev term is
double-scaled on the next step (this was the round-1 compiled-mode
corruption: the kernel carried the stale exponent).

Reference: libsharp's on-the-fly recurrence (SURVEY §2.3); the Y/Yt pair
of comm_map_mod.f90:437-530 at scale.
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

_INTERPRET = False  # set True to force interpret mode (tests on CPU)

# MXU dot precision: "bf16x3" = manual 3-pass bf16 split (err ~1e-6;
# Mosaic rejects lax Precision.HIGH so the split is done by hand),
# "highest" = 6-pass (err ~4e-7, 2x dot cost), "default" = 1-pass bf16
# (err ~3e-3, diagnostics only). Module-level knob so the bench can
# sweep it.
_MXU_PRECISION = "bf16x3"

# lam scratch layout: "post" stores (LC, 8, BH) contiguously and
# transposes once per chunk before the dot; "pre" stores (8, 1, BH)
# slices into the (8, LC, BH) batch-first layout per step (no chunk
# transpose, pricier stores). Measured knob.
_MXU_STORE = "pre"


def _mxu_dot(a, b, dims):
    """dot_general at the module precision knob (f32 accumulate)."""
    if _MXU_PRECISION != "bf16x3":
        return jax.lax.dot_general(
            a, b, dimension_numbers=dims,
            precision=jax.lax.Precision(_MXU_PRECISION),
            preferred_element_type=jnp.float32)
    ah = a.astype(jnp.bfloat16).astype(jnp.float32)
    al = a - ah
    bh = b.astype(jnp.bfloat16).astype(jnp.float32)
    bl = b - bh
    d = lambda x, y: jax.lax.dot_general(
        x, y, dimension_numbers=dims,
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    return d(ah, bh) + d(ah, bl) + d(al, bh)



def _rup(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def _coeff_pack(nside: int, lmax: int, mp: int, mmax: int,
                block_h: int, block_m: int, block_l: int):
    """Host-side padded recurrence coefficients with the per-l norm
    sqrt((2l+1)/4pi) folded in: lamhat_l = norm_l * d^l_{m,mp} obeys
      lamhat_{l+1} = (Ahat_l x + Bhat_l) lamhat_l - betahat_l lamhat_{l-1}
    with Ahat = A n_{l+1}/n_l, betahat = beta n_{l+1}/n_{l-1} and seeds
    premultiplied by n_{l0(m)}."""
    from scipy.special import gammaln
    from . import healpix

    nm = mmax + 1
    g = healpix.ring_geometry(nside)
    nh = 2 * nside
    th = g.theta[:nh]
    cth2, sth2 = np.cos(th / 2.0), np.sin(th / 2.0)
    m = np.arange(nm, dtype=np.float64)[None, :]
    amp = abs(mp)

    with np.errstate(divide="ignore"):
        lc, ls = np.log(cth2)[:, None], np.log(sth2)[:, None]
    hi = m >= amp
    logc_hi = 0.5 * (gammaln(2 * m + 1) - gammaln(m + mp + 1)
                     - gammaln(m - mp + 1))
    logv_hi = logc_hi + (m + mp) * lc + (m - mp) * ls
    sign_hi = np.broadcast_to((-1.0) ** (m - mp), logv_hi.shape)
    logc_lo = 0.5 * (gammaln(2 * amp + 1) - gammaln(amp + m + 1)
                     - gammaln(amp - m + 1))
    if mp > 0:
        logv_lo = logc_lo + (mp + m) * lc + (mp - m) * ls
        sign_lo = np.ones_like(logv_hi)
    else:
        logv_lo = logc_lo + (amp - m) * lc + (amp + m) * ls
        sign_lo = np.broadcast_to((-1.0) ** (amp + m), logv_hi.shape)
    logv = np.where(hi, logv_hi, logv_lo)
    sign = np.where(hi, sign_hi, sign_lo)
    # fold the seed norm n_{l0} with l0 = max(m, |mp|)
    l0 = np.maximum(m, amp)
    logv = logv + 0.5 * np.log((2 * l0 + 1) / (4 * np.pi))
    lbig = _SCALE_POW * np.log(2.0)
    seed_exp = np.minimum(np.ceil(logv / lbig), 0.0)
    seed_mant = sign * np.exp(logv - seed_exp * lbig)
    bad = ~np.isfinite(logv)
    seed_mant[bad] = 0.0
    seed_exp[bad] = -128.0

    nl = lmax + 1
    ell = np.arange(nl, dtype=np.float64)[:, None]
    n_of = lambda l: np.sqrt((2 * l + 1) / (4 * np.pi))
    r_up = n_of(ell + 1) / n_of(ell)                    # n_{l+1}/n_l
    with np.errstate(divide="ignore", invalid="ignore"):
        r_skip = n_of(ell + 1) / n_of(np.maximum(ell - 1, 0))
        wl1 = np.sqrt(np.maximum(((ell + 1) ** 2 - m**2)
                                 * ((ell + 1) ** 2 - mp**2), 0.0)) / (ell + 1)
        wl = np.where(ell > 0,
                      np.sqrt(np.maximum((ell**2 - m**2) * (ell**2 - mp**2),
                                         0.0)) / np.maximum(ell, 1), 0.0)
        A = (2 * ell + 1) / wl1 * r_up
        Bc = -(2 * ell + 1) * (m * mp) / np.maximum(ell * (ell + 1), 1) \
            / wl1 * r_up
        beta = wl / wl1 * r_skip
    for arr in (A, Bc, beta):
        arr[~np.isfinite(arr)] = 0.0

    nh_p = _rup(nh, block_h)
    nm_p = _rup(nm, block_m)
    nl_p = _rup(nl, block_l)
    padm = lambda a: np.pad(a, ((0, nh_p - a.shape[0]),
                                (0, nm_p - a.shape[1])))
    padl = lambda a: np.pad(a, ((0, nl_p - a.shape[0]),
                                (0, nm_p - a.shape[1])))
    # host numpy (not device arrays): these are closed over inside user
    # jits, and the axon TPU relay cannot read device buffers back to host
    # for MLIR constant embedding (int32 readback UNIMPLEMENTED)
    f32 = lambda a: np.ascontiguousarray(a.astype(np.float32))
    return (f32(padm(seed_mant)),
            np.ascontiguousarray(padm(seed_exp).astype(np.int32)),
            f32(padl(A)), f32(padl(Bc)), f32(padl(beta)),
            f32(np.pad(g.z[:nh], (0, nh_p - nh))[:, None]))


def _emit(cur, cur_e, bigi):
    """Gate the scaled mantissa: representable iff exponent in {0,-1,-2}."""
    return jnp.where(cur_e == 0, cur,
                     jnp.where(cur_e == -1, cur * bigi,
                               jnp.where(cur_e == -2, cur * (bigi * bigi),
                                         0.0)))


def _rec_advance(cur, cur_e, prev, prev_e, alpha, beta_l, big, bigi):
    """One scaled recurrence step l -> l+1 (shared by both kernels)."""
    de = prev_e - cur_e
    sc = jnp.where(de == 0, 1.0, jnp.where(de <= -1, bigi, big))
    sc = jnp.where(de <= -2, 0.0, sc)
    new = alpha * cur - beta_l * prev * sc
    grow = jnp.abs(new) > big
    new = jnp.where(grow, new * bigi, new)
    cur_sc = jnp.where(grow, cur * bigi, cur)
    # emergence-boundary fix: the rescaled cur carries the incremented
    # exponent into the next step's prev_e (sht_otf.py:160-166)
    new_e = cur_e + grow.astype(jnp.int32)
    return cur_sc, new_e, new, new_e


def _synth_kernel(mp: int, BH: int, BM: int, LC: int, KLAST: int,
                  seed_m_ref, seed_e_ref, A_ref, B_ref, beta_ref, x_ref,
                  a_re_ref, a_im_ref,
                  fn_re_ref, fn_im_ref, fs_re_ref, fs_im_ref,
                  prev_s, pe_s, cur_s, ce_s):
    """Even/odd-parity-split accumulation (round-4 VPU lever): during the
    l loop the four out refs hold the EVEN-l and ODD-l partial sums
    (e_re, e_im, o_re, o_im) — 2 fused updates per l instead of 4 —
    and only after the last l-chunk are they combined into the
    north/south spectra via F_n = E + O, F_s = (-1)^m (E - O)
    (lambda(pi-theta) = (-1)^(l+m) lambda(theta)). Halves the dominant
    accumulation FLOPs of the ROADMAP roofline analysis."""
    k = pl.program_id(2)
    big = jnp.float32(2.0 ** _SCALE_POW)
    bigi = jnp.float32(2.0 ** -_SCALE_POW)
    x = x_ref[:, 0:1]                                   # (BH, 1)
    m_ids = pl.program_id(1) * BM + jax.lax.broadcasted_iota(
        jnp.int32, (BH, BM), 1)
    m_par = 1.0 - 2.0 * (m_ids % 2).astype(jnp.float32)  # (-1)^m

    @pl.when(k == 0)
    def _init():
        z = jnp.zeros_like(prev_s)
        prev_s[...] = z
        cur_s[...] = z
        pe_s[...] = jnp.zeros_like(pe_s)
        ce_s[...] = jnp.full_like(ce_s, -128)
        for r in (fn_re_ref, fn_im_ref, fs_re_ref, fs_im_ref):
            r[...] = jnp.zeros_like(r)

    # skip l-chunks entirely below this m-block's first m (triangular)
    run = (k + 1) * LC > pl.program_id(1) * BM

    @pl.when(run)
    def _work():
        def substep(carry, i_loc, e_re_ref, e_im_ref):
            """One l step accumulating into the given parity refs."""
            prev, prev_e, cur, cur_e = carry
            l = k * LC + i_loc
            start = jnp.maximum(m_ids, abs(mp)) == l
            cur2 = jnp.where(start, seed_m_ref[...], cur)
            cur_e2 = jnp.where(start, seed_e_ref[...], cur_e)
            prev2 = jnp.where(start, 0.0, prev)
            prev_e2 = jnp.where(start, 0, prev_e)
            lam = _emit(cur2, cur_e2, bigi)              # (BH, BM)
            a_re = a_re_ref[:, i_loc, :]                 # (B, BM)
            a_im = a_im_ref[:, i_loc, :]
            e_re_ref[...] += lam[None] * a_re[:, None, :]
            e_im_ref[...] += lam[None] * a_im[:, None, :]
            alpha = A_ref[i_loc, :][None, :] * x + B_ref[i_loc, :][None, :]
            return _rec_advance(cur2, cur_e2, prev2, prev_e2, alpha,
                                beta_ref[i_loc, :][None, :], big, bigi)

        def body(i2, carry):
            # LC is even and chunks start at even l: parity is STATIC
            # within the unrolled pair (even -> fn_* refs as E, odd ->
            # fs_* refs as O)
            carry = substep(carry, 2 * i2, fn_re_ref, fn_im_ref)
            return substep(carry, 2 * i2 + 1, fs_re_ref, fs_im_ref)

        out = jax.lax.fori_loop(
            0, LC // 2, body,
            (prev_s[...], pe_s[...], cur_s[...], ce_s[...]))
        prev_s[...], pe_s[...], cur_s[...], ce_s[...] = out

    @pl.when(k == KLAST)
    def _finalize():
        e_re, o_re = fn_re_ref[...], fs_re_ref[...]
        e_im, o_im = fn_im_ref[...], fs_im_ref[...]
        fn_re_ref[...] = e_re + o_re
        fn_im_ref[...] = e_im + o_im
        fs_re_ref[...] = m_par[None] * (e_re - o_re)
        fs_im_ref[...] = m_par[None] * (e_im - o_im)


def _coeff_pack_traced(otf: LegendreOTF, block_h: int, block_m: int,
                       block_l: int):
    """The _coeff_pack arrays derived IN-JIT from the LegendreOTF pytree.

    Numerically identical to _coeff_pack (validated by
    tests/test_pallas_sht.py::test_traced_pack_matches_host): the
    sqrt((2l+1)/4pi) norm ratios fold into the otf recurrence arrays and
    the seed mantissas, then everything pads to block multiples. Deriving
    the pack from traced inputs instead of host numpy keeps these
    O(lmax^2) arrays OUT of the compiled program's constants — at
    lmax 3000 the embedded constants exceeded the axon remote compiler's
    request size limit (HTTP 413, BASELINE.md round 3)."""
    nl = otf.lmax + 1
    nm = otf.mmax + 1
    nh = otf.x.shape[0]
    nh_p = _rup(nh, block_h)
    nm_p = _rup(nm, block_m)
    nl_p = _rup(nl, block_l)
    f32 = jnp.float32
    ell = jnp.arange(nl, dtype=f32)[:, None]
    n_of = lambda l: jnp.sqrt((2.0 * l + 1.0) / (4.0 * jnp.pi))
    r_up = n_of(ell + 1.0) / n_of(ell)
    r_skip = n_of(ell + 1.0) / n_of(jnp.maximum(ell - 1.0, 0.0))
    A = otf.A.astype(f32) * r_up
    Bc = otf.Bc.astype(f32) * r_up
    beta = otf.beta.astype(f32) * r_skip
    # seed fold: n_{l0} with l0 = max(m, |mp|)
    l0 = jnp.maximum(otf.m_vals.astype(f32), float(abs(otf.mp)))
    seeds = otf.seed_mant.astype(f32) * n_of(l0)[None, :]
    seede = otf.seed_exp
    padm = lambda a: jnp.pad(a, ((0, nh_p - a.shape[0]),
                                 (0, nm_p - a.shape[1])))
    padl = lambda a: jnp.pad(a, ((0, nl_p - a.shape[0]),
                                 (0, nm_p - a.shape[1])))
    return (padm(seeds), padm(seede), padl(A), padl(Bc), padl(beta),
            jnp.pad(otf.x.astype(f32), (0, nh_p - nh))[:, None])


# Below this many bytes of recurrence-coefficient constants the packs are
# embedded as compile-time HLO constants (fast: nothing recomputed or
# re-streamed per transform — the round-2 behavior measured at 25.1 SHT/s
# at nside 1024); above it they are derived in-jit from the plan pytree
# (mandatory at lmax 3000, where the constant-laden HLO exceeded the
# remote compiler's request size limit; BASELINE.md round-3/4 notes).
_CONST_PACK_MAX_BYTES = 120_000_000


def _pick_pack(otf: LegendreOTF, nside: int, block_h: int, block_m: int,
               block_l: int):
    nl_p = _rup(otf.lmax + 1, block_l)
    nm_p = _rup(otf.mmax + 1, block_m)
    nh_p = _rup(otf.x.shape[0], block_h)
    const_bytes = 4 * (3 * nl_p * nm_p + 2 * nh_p * nm_p)
    if const_bytes <= _CONST_PACK_MAX_BYTES:
        return tuple(jnp.asarray(t) for t in _coeff_pack(
            nside, otf.lmax, otf.mp, otf.mmax, block_h, block_m, block_l))
    return _coeff_pack_traced(otf, block_h, block_m, block_l)


def synth_legendre_pallas(otf: LegendreOTF, alm: jnp.ndarray, nh: int,
                          block_h: int = 128, block_m: int = 128,
                          block_l: int = 128, interpret: bool = False,
                          max_b: int = 8):
    """alm (..., nl, nm) complex64 -> (F_n, F_s) (..., nh, nm) complex64.

    Batched Pallas version of sht_otf.synth_legendre_otf; the batch is
    processed inside the kernel in groups of max_b."""
    nside = nh // 2
    nl = otf.lmax + 1
    nm = otf.mmax + 1
    block_h = min(block_h, _rup(nh, 8))
    block_m = min(block_m, _rup(nm, 128))
    block_l = min(block_l, _rup(nl, 8))
    seeds, seede, A, B, beta, x = _pick_pack(otf, nside, block_h,
                                             block_m, block_l)
    nh_p, nm_p = seeds.shape
    nl_p = A.shape[0]

    batch = alm.shape[:-2]
    a2 = alm.reshape((-1, nl, nm))
    Btot = a2.shape[0]

    grid = (nh_p // block_h, nm_p // block_m, nl_p // block_l)
    bs_hm = pl.BlockSpec((block_h, block_m), lambda i, j, k: (i, j))
    bs_lm = pl.BlockSpec((block_l, block_m), lambda i, j, k: (k, j))
    bs_x = pl.BlockSpec((block_h, 1), lambda i, j, k: (i, 0))

    Fn_parts, Fs_parts = [], []
    for b0 in range(0, Btot, max_b):
        Bc_ = min(max_b, Btot - b0)
        a_blk = a2[b0:b0 + Bc_]
        a_re = jnp.pad(a_blk.real.astype(jnp.float32),
                       ((0, 0), (0, nl_p - nl), (0, nm_p - nm)))
        a_im = jnp.pad(a_blk.imag.astype(jnp.float32),
                       ((0, 0), (0, nl_p - nl), (0, nm_p - nm)))
        bs_a = pl.BlockSpec((Bc_, block_l, block_m),
                            lambda i, j, k: (0, k, j))
        bs_o = pl.BlockSpec((Bc_, block_h, block_m),
                            lambda i, j, k: (0, i, j))
        out_shape = [jax.ShapeDtypeStruct((Bc_, nh_p, nm_p), jnp.float32)] * 4
        kern = partial(_synth_kernel, otf.mp, block_h, block_m, block_l,
                       grid[2] - 1)
        fn_re, fn_im, fs_re, fs_im = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[bs_hm, bs_hm, bs_lm, bs_lm, bs_lm, bs_x, bs_a, bs_a],
            out_specs=[bs_o] * 4,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((block_h, block_m), jnp.float32),
                            pltpu.VMEM((block_h, block_m), jnp.int32),
                            pltpu.VMEM((block_h, block_m), jnp.float32),
                            pltpu.VMEM((block_h, block_m), jnp.int32)],
            interpret=interpret or _INTERPRET,
        )(seeds, seede, A, B, beta, x, a_re, a_im)
        Fn_parts.append((fn_re + 1j * fn_im)[:, :nh, :nm])
        Fs_parts.append((fs_re + 1j * fs_im)[:, :nh, :nm])
    Fn = jnp.concatenate(Fn_parts, 0).reshape(batch + (nh, nm))
    Fs = jnp.concatenate(Fs_parts, 0).reshape(batch + (nh, nm))
    return Fn, Fs


def _adj_kernel(mp: int, BH: int, BM: int, nl: int,
                seed_m_ref, seed_e_ref, A_ref, B_ref, beta_ref, x_ref,
                gn_re_ref, gn_im_ref, gs_re_ref, gs_im_ref,
                a_re_ref, a_im_ref):
    """a[l,m] = sum_r lambda_l(r) (G_n(r,m) + (-1)^(l+m) G_s(r,m)),
    accumulated over ring blocks (innermost grid axis; the (B, nl, BM)
    output block stays VMEM-resident per m-block)."""
    big = jnp.float32(2.0 ** _SCALE_POW)
    bigi = jnp.float32(2.0 ** -_SCALE_POW)
    x = x_ref[:, 0:1]
    j = pl.program_id(0)
    m_ids = j * BM + jax.lax.broadcasted_iota(jnp.int32, (BH, BM), 1)
    m_par = 1.0 - 2.0 * (m_ids % 2).astype(jnp.float32)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        a_re_ref[...] = jnp.zeros_like(a_re_ref)
        a_im_ref[...] = jnp.zeros_like(a_im_ref)

    gn_re, gn_im = gn_re_ref[...], gn_im_ref[...]        # (B, BH, BM)
    gs_re, gs_im = gs_re_ref[...], gs_im_ref[...]
    gs_re_m = gs_re * m_par[None]
    gs_im_m = gs_im * m_par[None]
    # parity-split precombination (round-4 VPU lever): per l the
    # integrand is gn + (-1)^l gs_m, so precombine the even/odd forms
    # ONCE per block and do a single multiply-reduce per l instead of
    # add + scale + multiply-reduce
    ge_re, ge_im = gn_re + gs_re_m, gn_im + gs_im_m      # even l
    go_re, go_im = gn_re - gs_re_m, gn_im - gs_im_m      # odd l

    def substep(carry, l, g_re, g_im):
        prev, prev_e, cur, cur_e = carry
        start = jnp.maximum(m_ids, abs(mp)) == l
        cur2 = jnp.where(start, seed_m_ref[...], cur)
        cur_e2 = jnp.where(start, seed_e_ref[...], cur_e)
        prev2 = jnp.where(start, 0.0, prev)
        prev_e2 = jnp.where(start, 0, prev_e)
        lam = _emit(cur2, cur_e2, bigi)
        row_re = jnp.sum(lam[None] * g_re, axis=1)
        row_im = jnp.sum(lam[None] * g_im, axis=1)
        idx = (slice(None), pl.dslice(l, 1), slice(None))
        a_re_ref[idx] += row_re[:, None, :]
        a_im_ref[idx] += row_im[:, None, :]
        alpha = A_ref[l, :][None, :] * x + B_ref[l, :][None, :]
        return _rec_advance(cur2, cur_e2, prev2, prev_e2, alpha,
                            beta_ref[l, :][None, :], big, bigi)

    def body(i2, carry):
        # BM is even, so the triangular start l0 = j*BM is even and the
        # parity of each unrolled substep is static
        carry = substep(carry, 2 * i2, ge_re, ge_im)
        return substep(carry, 2 * i2 + 1, go_re, go_im)

    z = jnp.zeros((BH, BM), jnp.float32)
    zi = jnp.zeros((BH, BM), jnp.int32)
    carry0 = (z, zi, z, jnp.full((BH, BM), -128, jnp.int32))
    l0_half = jnp.minimum(j * BM, nl) // 2               # triangular start
    carry = jax.lax.fori_loop(l0_half, nl // 2, body, carry0)
    if nl % 2 == 1:                                      # final even l
        substep(carry, nl - 1, ge_re, ge_im)


def adjoint_legendre_pallas(otf: LegendreOTF, F_n: jnp.ndarray,
                            F_s: jnp.ndarray, block_h: int = 64,
                            block_m: int = 128, interpret: bool = False,
                            max_b: int | None = None):
    """(F_n, F_s) (..., nh, nm) complex64 -> alm (..., nl, nm) complex64.

    Grid is (m-blocks, ring-blocks) with rings innermost so each m-block's
    (B, nl, BM) output block stays VMEM-resident while ring partial sums
    accumulate (the Yt of comm_map_mod.f90:511-530 at scale)."""
    nl = otf.lmax + 1
    nm = otf.mmax + 1
    nh = F_n.shape[-2]
    nside = nh // 2
    block_h = min(block_h, _rup(nh, 8))
    block_m = min(block_m, _rup(nm, 128))
    nl_p = _rup(nl, 8)
    if max_b is None:
        # TWO (B, nl, BM) out blocks (a_re, a_im) stay VMEM-resident and
        # Mosaic may double-buffer each: keep 2 x 2 x out under ~5 MB of
        # the 16 MB VMEM
        max_b = max(1, int(5e6 // (2 * 2 * nl_p * block_m * 4)))
    seeds, seede, A, B, beta, x = _pick_pack(otf, nside, block_h,
                                             block_m, 8)
    nh_p, nm_p = seeds.shape

    batch = F_n.shape[:-2]
    Fn2 = F_n.reshape((-1, nh, nm))
    Fs2 = F_s.reshape((-1, nh, nm))
    Btot = Fn2.shape[0]

    grid = (nm_p // block_m, nh_p // block_h)            # rings innermost
    bs_hm = pl.BlockSpec((block_h, block_m), lambda j, i: (i, j))
    bs_lm = pl.BlockSpec((A.shape[0], block_m), lambda j, i: (0, j))
    bs_x = pl.BlockSpec((block_h, 1), lambda j, i: (i, 0))

    parts = []
    for b0 in range(0, Btot, max_b):
        Bc_ = min(max_b, Btot - b0)
        padg = lambda g: jnp.pad(g.astype(jnp.float32),
                                 ((0, 0), (0, nh_p - nh), (0, nm_p - nm)))
        gn_re, gn_im = padg(Fn2[b0:b0 + Bc_].real), padg(Fn2[b0:b0 + Bc_].imag)
        gs_re, gs_im = padg(Fs2[b0:b0 + Bc_].real), padg(Fs2[b0:b0 + Bc_].imag)
        bs_g = pl.BlockSpec((Bc_, block_h, block_m), lambda j, i: (0, i, j))
        bs_a = pl.BlockSpec((Bc_, A.shape[0], block_m), lambda j, i: (0, 0, j))
        out_shape = [jax.ShapeDtypeStruct((Bc_, A.shape[0], nm_p),
                                          jnp.float32)] * 2
        kern = partial(_adj_kernel, otf.mp, block_h, block_m, nl)
        a_re, a_im = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[bs_hm, bs_hm, bs_lm, bs_lm, bs_lm, bs_x,
                      bs_g, bs_g, bs_g, bs_g],
            out_specs=[bs_a] * 2,
            out_shape=out_shape,
            interpret=interpret or _INTERPRET,
        )(seeds, seede, A, B, beta, x, gn_re, gn_im, gs_re, gs_im)
        parts.append((a_re + 1j * a_im)[:, :nl, :nm])
    return jnp.concatenate(parts, 0).reshape(batch + (nl, nm))


# ---------------------------------------------------------------------------
# MXU kernels (round-5): h-on-lanes recurrence + batched dot accumulation
# ---------------------------------------------------------------------------
#
# The ROADMAP round-4 addendum layout, with one further lever: the
# north/south parity split folds into the contraction's M dimension by
# PRE-SIGNING the alm batch with (-1)^l host-side —
#   F_n(m,h) = sum_l Lambda_lm(h) a_l,
#   F_s(m,h) = (-1)^m sum_l (-1)^l Lambda_lm(h) a_l,
# so stacking [a_ri ; (-1)^l a_ri] gives BOTH streams from ONE batched
# dot_general with M = 4B (B batch x re/im x n/s), K = LC, N = BH.
# The recurrence runs on (8 m sublanes, BH h lanes) tiles, emits each
# Lambda step to a (LC, 8, BH) VMEM scratch at the contiguous leading
# index (no lane shuffles), and the per-chunk contraction is a single
# m-batched dot_general — the accumulation FLOPs (73% of the kernel per
# the ROADMAP roofline) move from the VPU to the MXU.
# Reference: libsharp's on-the-fly recurrence (SURVEY §2.3).


def _pick_pack_T(otf: LegendreOTF, nside: int, block_h: int,
                 block_l: int):
    """Transposed coefficient pack for the MXU kernels:
    seeds/seed_exp (nm_p8, nh_p), A/B/beta (nm_p8, nl_p), x (1, nh_p)
    with nm padded to a multiple of 8 (m on sublanes). Coefficients are
    2-D m-major — (8, LC) blocks are a legal Mosaic tiling and land
    with m already on sublanes; a trailing unit dim would tile
    1 -> 128 lanes on HBM (2 GB per coefficient at lmax 2000, the
    flagship OOM) and l-major blocks would need per-chunk transposes."""
    seeds, seede, A, B, beta, x = _pick_pack(otf, nside, block_h, 8,
                                             block_l)
    tr = lambda a: jnp.asarray(a).T if not isinstance(a, np.ndarray) \
        else np.ascontiguousarray(a.T)
    return (tr(seeds), tr(seede), tr(A), tr(B), tr(beta),
            jnp.asarray(x).reshape(1, -1))


def _synth_kernel_mxu(mp: int, BH: int, LC: int,
                      seed_m_ref, seed_e_ref, A_ref, B_ref, beta_ref,
                      x_ref, a_ref, out_ref,
                      lam_s, prev_s, pe_s, cur_s, ce_s):
    """grid (h-blocks, m8-blocks, l-chunks). Blocks:
    seeds (8, BH) @ (j, i); A/B/beta (8, LC) @ (j, k);
    x (1, BH) @ (0, i); a [8, 4B, LC] @ (j, 0, k) — a = [a_ri; (-1)^l
    a_ri] laid out (nm, 4B, nl); out (8, 4B, BH) @ (j, 0, i) RAW
    accumulator [F_n_ri ; F~_s_ri] — the (-1)^m south sign and the
    re/im unstack happen host-side. Mosaic's batched matmul requires
    the m batch dim at position 0 of BOTH operands, so the (LC, 8, BH)
    lam scratch (contiguous per-step stores) is transposed once per
    chunk before the dot."""
    k = pl.program_id(2)
    big = jnp.float32(2.0 ** _SCALE_POW)
    bigi = jnp.float32(2.0 ** -_SCALE_POW)
    x = x_ref[...]                                       # (1, BH)
    m_ids = pl.program_id(1) * 8 + jax.lax.broadcasted_iota(
        jnp.int32, (8, BH), 0)

    @pl.when(k == 0)
    def _init():
        z = jnp.zeros_like(prev_s)
        prev_s[...] = z
        cur_s[...] = z
        pe_s[...] = jnp.zeros_like(pe_s)
        ce_s[...] = jnp.full_like(ce_s, -128)
        out_ref[...] = jnp.zeros_like(out_ref)

    run = (k + 1) * LC > pl.program_id(1) * 8            # triangular skip

    @pl.when(run)
    def _work():
        # coefficients arrive as (8 m, LC) blocks; per l step a one-hot
        # lane reduction extracts the (8, 1) column (Mosaic has no
        # dynamic lane indexing)
        def substep(i_loc, carry):
            prev, prev_e, cur, cur_e = carry
            l = k * LC + i_loc
            start = jnp.maximum(m_ids, abs(mp)) == l
            cur2 = jnp.where(start, seed_m_ref[...], cur)
            cur_e2 = jnp.where(start, seed_e_ref[...], cur_e)
            prev2 = jnp.where(start, 0.0, prev)
            prev_e2 = jnp.where(start, 0, prev_e)
            lam = _emit(cur2, cur_e2, bigi)              # (8, BH)
            if _MXU_STORE == "pre":
                lam_s[:, pl.dslice(i_loc, 1), :] = lam[:, None, :]
            else:
                lam_s[i_loc] = lam
            sel = (jax.lax.broadcasted_iota(jnp.int32, (1, LC), 1)
                   == i_loc).astype(jnp.float32)
            A_l = jnp.sum(A_ref[...] * sel, axis=1, keepdims=True)
            B_l = jnp.sum(B_ref[...] * sel, axis=1, keepdims=True)
            bt_l = jnp.sum(beta_ref[...] * sel, axis=1, keepdims=True)
            alpha = A_l * x + B_l                        # (8,1)*(1,BH)
            return _rec_advance(cur2, cur_e2, prev2, prev_e2, alpha,
                                bt_l * jnp.ones_like(x),
                                big, bigi)

        out = jax.lax.fori_loop(
            0, LC, substep,
            (prev_s[...], pe_s[...], cur_s[...], ce_s[...]))
        prev_s[...], pe_s[...], cur_s[...], ce_s[...] = out
        # m-batched MXU contraction: (8, 4B, LC) x (8, LC, BH)
        # -> (8, 4B, BH), batch dim m (position 0), contraction l
        lam_b = lam_s[...] if _MXU_STORE == "pre" \
            else jnp.transpose(lam_s[...], (1, 0, 2))
        out_ref[...] += _mxu_dot(a_ref[...], lam_b,
                                 (((2,), (1,)), ((0,), (0,))))


def synth_legendre_pallas_mxu(otf: LegendreOTF, alm: jnp.ndarray, nh: int,
                              block_h: int = 2048, block_l: int = 128,
                              interpret: bool = False, max_b: int = 8):
    """alm (..., nl, nm) complex64 -> (F_n, F_s) (..., nh, nm) complex64.

    MXU-contraction variant of synth_legendre_pallas (same semantics)."""
    nside = nh // 2
    nl = otf.lmax + 1
    nm = otf.mmax + 1
    block_h = min(block_h, _rup(nh, 128))
    block_l = min(block_l, _rup(nl, 8))
    seeds, seede, A, B, beta, x = _pick_pack_T(otf, nside, block_h,
                                               block_l)
    nm_p, nh_p = seeds.shape
    nl_p = A.shape[1]

    batch = alm.shape[:-2]
    a2 = alm.reshape((-1, nl, nm))
    Btot = a2.shape[0]
    parl = (1.0 - 2.0 * (np.arange(nl) % 2)).astype(np.float32)
    m_par = (1.0 - 2.0 * (np.arange(nm) % 2)).astype(np.float32)

    grid = (nh_p // block_h, nm_p // 8, nl_p // block_l)
    bs_seed = pl.BlockSpec((8, block_h), lambda i, j, k: (j, i))
    bs_c = pl.BlockSpec((8, block_l), lambda i, j, k: (j, k))
    bs_x = pl.BlockSpec((1, block_h), lambda i, j, k: (0, i))

    Fn_parts, Fs_parts = [], []
    for b0 in range(0, Btot, max_b):
        Bc_ = min(max_b, Btot - b0)
        a_blk = a2[b0:b0 + Bc_]
        a_ri = jnp.concatenate([a_blk.real, a_blk.imag],
                               0).astype(jnp.float32)   # (2B, nl, nm)
        a_st = jnp.concatenate([a_ri, a_ri * parl[None, :, None]], 0)
        a_T = jnp.pad(a_st.transpose(0, 2, 1),
                      ((0, 0), (0, nm_p - nm), (0, nl_p - nl)))
        M = 4 * Bc_
        a_T = a_T.transpose(1, 0, 2)                      # (nm_p, M, nl_p)
        bs_a = pl.BlockSpec((8, M, block_l), lambda i, j, k: (j, 0, k))
        bs_o = pl.BlockSpec((8, M, block_h), lambda i, j, k: (j, 0, i))
        kern = partial(_synth_kernel_mxu, otf.mp, block_h, block_l)
        raw = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[bs_seed, bs_seed, bs_c, bs_c, bs_c, bs_x, bs_a],
            out_specs=bs_o,
            out_shape=jax.ShapeDtypeStruct((nm_p, M, nh_p), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((8, block_l, block_h) if _MXU_STORE == "pre"
                           else (block_l, 8, block_h), jnp.float32),
                pltpu.VMEM((8, block_h), jnp.float32),
                pltpu.VMEM((8, block_h), jnp.int32),
                pltpu.VMEM((8, block_h), jnp.float32),
                pltpu.VMEM((8, block_h), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret or _INTERPRET,
        )(seeds, seede, A, B, beta, x, a_T)
        raw = raw[:nm, :, :nh]                            # (nm, 4B, nh)
        fn = raw[:, :2 * Bc_].transpose(1, 2, 0)          # (2B, nh, nm)
        fs = (raw[:, 2 * Bc_:] * m_par[:, None, None]).transpose(1, 2, 0)
        Fn_parts.append(fn[:Bc_] + 1j * fn[Bc_:])
        Fs_parts.append(fs[:Bc_] + 1j * fs[Bc_:])
    Fn = jnp.concatenate(Fn_parts, 0).reshape(batch + (nh, nm))
    Fs = jnp.concatenate(Fs_parts, 0).reshape(batch + (nh, nm))
    return Fn, Fs


def _adj_kernel_mxu(mp: int, BH: int, LC: int, NCH: int,
                    seed_m_ref, seed_e_ref, A_ref, B_ref, beta_ref,
                    x_ref, g_ref, out_ref, lam_s):
    """grid (m8-blocks, h-blocks) with rings innermost; the (8, 4B,
    nl_p) raw output block [a_n_ri ; a~_s_ri] stays VMEM-resident per
    m-block while ring-block partial sums accumulate. g = [g_n_ri ;
    (-1)^m g_s_ri] laid out (8, 4B, BH) batch-m-first; the (-1)^l
    combine a = a_n + (-1)^l a~_s happens host-side."""
    j = pl.program_id(0)
    big = jnp.float32(2.0 ** _SCALE_POW)
    bigi = jnp.float32(2.0 ** -_SCALE_POW)
    x = x_ref[...]
    m_ids = j * 8 + jax.lax.broadcasted_iota(jnp.int32, (8, BH), 0)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    g = g_ref[...]                                       # (4B, 8, BH)
    NL = A_ref.shape[1]

    def chunk_body(c, carry):
        def substep(i_loc, carry):
            prev, prev_e, cur, cur_e = carry
            l = c * LC + i_loc
            start = jnp.maximum(m_ids, abs(mp)) == l
            cur2 = jnp.where(start, seed_m_ref[...], cur)
            cur_e2 = jnp.where(start, seed_e_ref[...], cur_e)
            prev2 = jnp.where(start, 0.0, prev)
            prev_e2 = jnp.where(start, 0, prev_e)
            lam = _emit(cur2, cur_e2, bigi)
            if _MXU_STORE == "pre":
                lam_s[:, pl.dslice(i_loc, 1), :] = lam[:, None, :]
            else:
                lam_s[i_loc] = lam
            sel = (jax.lax.broadcasted_iota(jnp.int32, (1, NL), 1)
                   == l).astype(jnp.float32)
            A_l = jnp.sum(A_ref[...] * sel, axis=1, keepdims=True)
            B_l = jnp.sum(B_ref[...] * sel, axis=1, keepdims=True)
            bt_l = jnp.sum(beta_ref[...] * sel, axis=1, keepdims=True)
            alpha = A_l * x + B_l
            return _rec_advance(cur2, cur_e2, prev2, prev_e2, alpha,
                                bt_l * jnp.ones_like(x),
                                big, bigi)

        carry = jax.lax.fori_loop(0, LC, substep, carry)
        # (8, 4B, BH) x (8, LC, BH) -> (8, 4B, LC), batch m (pos 0),
        # contraction h
        lam_b = lam_s[...] if _MXU_STORE == "pre" \
            else jnp.transpose(lam_s[...], (1, 0, 2))
        dotc = _mxu_dot(g, lam_b, (((2,), (2,)), ((0,), (0,))))
        idx = (slice(None), slice(None), pl.dslice(c * LC, LC))
        out_ref[idx] += dotc
        return carry

    z = jnp.zeros((8, BH), jnp.float32)
    zi = jnp.zeros((8, BH), jnp.int32)
    carry0 = (z, zi, z, jnp.full((8, BH), -128, jnp.int32))
    c0 = (j * 8) // LC                                   # triangular skip
    jax.lax.fori_loop(c0, NCH, chunk_body, carry0)


def adjoint_legendre_pallas_mxu(otf: LegendreOTF, F_n: jnp.ndarray,
                                F_s: jnp.ndarray, block_h: int = 2048,
                                block_l: int = 128,
                                interpret: bool = False,
                                max_b: int = 8):
    """(F_n, F_s) (..., nh, nm) complex64 -> alm (..., nl, nm) complex64.

    MXU-contraction variant of adjoint_legendre_pallas."""
    nl = otf.lmax + 1
    nm = otf.mmax + 1
    nh = F_n.shape[-2]
    nside = nh // 2
    block_h = min(block_h, _rup(nh, 128))
    block_l = min(block_l, _rup(nl, 8))
    seeds, seede, A, B, beta, x = _pick_pack_T(otf, nside, block_h,
                                               block_l)
    nm_p, nh_p = seeds.shape
    nl_p = A.shape[1]
    parl = (1.0 - 2.0 * (np.arange(nl_p) % 2)).astype(np.float32)
    m_par = (1.0 - 2.0 * (np.arange(nm) % 2)).astype(np.float32)

    batch = F_n.shape[:-2]
    Fn2 = F_n.reshape((-1, nh, nm))
    Fs2 = F_s.reshape((-1, nh, nm))
    Btot = Fn2.shape[0]

    grid = (nm_p // 8, nh_p // block_h)                  # rings innermost
    bs_seed = pl.BlockSpec((8, block_h), lambda j, i: (j, i))
    bs_c = pl.BlockSpec((8, nl_p), lambda j, i: (j, 0))
    bs_x = pl.BlockSpec((1, block_h), lambda j, i: (0, i))

    parts = []
    for b0 in range(0, Btot, max_b):
        Bc_ = min(max_b, Btot - b0)
        gn = Fn2[b0:b0 + Bc_]
        gs = Fs2[b0:b0 + Bc_] * m_par[None, None, :]
        g_ri = jnp.concatenate([gn.real, gn.imag, gs.real, gs.imag],
                               0).astype(jnp.float32)    # (4B, nh, nm)
        g_T = jnp.pad(g_ri.transpose(2, 0, 1),
                      ((0, nm_p - nm), (0, 0), (0, nh_p - nh)))
        M = 4 * Bc_
        bs_g = pl.BlockSpec((8, M, block_h), lambda j, i: (j, 0, i))
        bs_o = pl.BlockSpec((8, M, nl_p), lambda j, i: (j, 0, 0))
        kern = partial(_adj_kernel_mxu, otf.mp, block_h, block_l,
                       nl_p // block_l)
        raw = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[bs_seed, bs_seed, bs_c, bs_c, bs_c, bs_x, bs_g],
            out_specs=bs_o,
            out_shape=jax.ShapeDtypeStruct((nm_p, M, nl_p), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((8, block_l, block_h) if _MXU_STORE == "pre"
                           else (block_l, 8, block_h), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret or _INTERPRET,
        )(seeds, seede, A, B, beta, x, g_T)
        # a = a_n + (-1)^l a~_s, then re/im unstack + (nm, nl) -> (nl, nm)
        a_n = raw[:nm, :2 * Bc_, :]
        a_s = raw[:nm, 2 * Bc_:, :] * parl[None, None, :]
        a_ri = (a_n + a_s).transpose(1, 2, 0)[:, :nl, :]  # (2B, nl, nm)
        parts.append(a_ri[:Bc_] + 1j * a_ri[Bc_:])
    return jnp.concatenate(parts, 0).reshape(batch + (nl, nm))


def alm2map_pallas(plan, otf: LegendreOTF, alm: jnp.ndarray,
                   block_h: int = 128, block_m: int = 128,
                   interpret: bool = False):
    """Full Y on the Pallas Legendre stage: same semantics as
    sht_otf.alm2map_otf (f32 path; batched)."""
    from .sht import _gather_pix, ring_synthesis

    F_n, F_s = synth_legendre_pallas(otf, alm.astype(jnp.complex64),
                                     plan.nh, block_h, block_m,
                                     interpret=interpret)
    south = jnp.flip(F_s[..., : plan.nh - 1, :], axis=-2)
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
    sht_otf.map2alm_otf (f32 path; batched)."""
    from .sht import _pad_to_rings, ring_analysis

    w = plan.ring_weight
    fpad = _pad_to_rings(plan, maps) * w[:, None]
    F = ring_analysis(plan, fpad.astype(plan.cdtype))
    F_n = F[..., : plan.nh, :]
    F_s = jnp.flip(F[..., plan.nh:, :], axis=-2)
    pad = plan.nh - 1 - F_s.shape[-2]
    F_s = jnp.pad(F_s, [(0, 0)] * (F_s.ndim - 2) + [(0, pad + 1), (0, 0)])
    return adjoint_legendre_pallas(otf, F_n.astype(jnp.complex64),
                                   F_s.astype(jnp.complex64),
                                   block_h, block_m, interpret)
