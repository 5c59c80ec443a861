"""On-the-fly SHT for large lmax: chunked Legendre recurrence + block matmul.

The table-based transforms (sht.py) store Lambda (nh, nl, nm) — 34 GB at
nside 1024 / lmax 2048 in f32, beyond a single chip's HBM. Here the
Legendre functions are regenerated on the fly, the way libsharp does on
CPU, but structured for TPU:

  * the three-term l-recurrence runs on the VPU in chunks of L ells,
    materializing a (L, nh, nm) Lambda block in VMEM/HBM-transient space;
  * each block immediately contracts with the alm chunk as a batched
    matmul (MXU) and is discarded — peak memory O(L nh nm);
  * float32 safety: the recurrence carries a per-(ring, m) block exponent
    (values below 2^-30-ish are held scaled; contributions only count once
    the exponent reaches zero), the same scaling strategy as the host
    table builder (wigner.py) and libsharp.

One code path serves synthesis and adjoint for any (spin -> mp) via the
generic d^l_{m,mp} recurrence; spin-0 uses mp=0.
"""
from __future__ import annotations

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import healpix
from .sht import SHTPlan, get_plan, ring_synthesis, ring_analysis, \
    _gather_pix, _pad_to_rings

_SCALE_POW = 30  # rescale granularity 2^30 (f32-safe)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["seed_mant", "seed_exp", "A", "Bc", "beta", "x", "norm",
                 "parity_m", "m_vals"],
    meta_fields=["lmax", "mmax", "mp", "chunk", "backend"],
)
@dataclasses.dataclass(frozen=True)
class LegendreOTF:
    """Recurrence data for d^l_{m,mp} on the northern rings."""
    seed_mant: jax.Array   # (nh, nm) seed mantissa at l0(m)
    seed_exp: jax.Array    # (nh, nm) int32 block exponent (<= 0)
    A: jax.Array           # (nl, nm) recurrence alpha = A*x + Bc
    Bc: jax.Array          # (nl, nm)
    beta: jax.Array        # (nl, nm)
    x: jax.Array           # (nh,) cos(theta)
    norm: jax.Array        # (nl,) sqrt((2l+1)/4pi)
    parity_m: jax.Array    # (nm,) (-1)^m
    m_vals: jax.Array      # (nm,) int32 GLOBAL m of each column (supports
                           # m-sharded blocks carrying a slice of the m axis)
    lmax: int
    mmax: int
    mp: int
    chunk: int
    # Legendre-stage implementation: "xla" (chunked lax.scan) or "pallas"
    # (fused VMEM-resident kernel, pallas_sht.py; full-m plans only)
    backend: str = "xla"


@functools.lru_cache(maxsize=None)
def legendre_otf(nside: int, lmax: int, mp: int, dtype: str = "float32",
                 chunk: int = 64, mmax: int | None = None,
                 backend: str = "xla") -> LegendreOTF:
    from scipy.special import gammaln

    if mmax is None:
        mmax = lmax
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
    lbig = _SCALE_POW * np.log(2.0)
    # mantissa normalized into (2^-30, 1]: exp = ceil(logv / lbig) so that
    # representable seeds sit at exp == 0 (the emit gate)
    seed_exp = np.minimum(np.ceil(logv / lbig), 0.0)
    seed_mant = sign * np.exp(logv - seed_exp * lbig)
    bad = ~np.isfinite(logv)
    seed_mant[bad] = 0.0
    seed_exp[bad] = -128.0

    ell = np.arange(lmax + 1, dtype=np.float64)[:, None]
    wl1 = np.sqrt(np.maximum(((ell + 1) ** 2 - m**2)
                             * ((ell + 1) ** 2 - mp**2), 0.0)) / (ell + 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        wl = np.where(ell > 0,
                      np.sqrt(np.maximum((ell**2 - m**2) * (ell**2 - mp**2),
                                         0.0)) / np.maximum(ell, 1), 0.0)
        A = (2 * ell + 1) / wl1
        Bc = -(2 * ell + 1) * (m * mp) / np.maximum(ell * (ell + 1), 1) / wl1
        beta = wl / wl1
    for arr in (A, Bc, beta):
        arr[~np.isfinite(arr)] = 0.0

    npdt = np.float32 if dtype == "float32" else np.float64
    cast = lambda a: jnp.asarray(np.asarray(a, npdt))
    return LegendreOTF(
        seed_mant=cast(seed_mant), seed_exp=jnp.asarray(seed_exp.astype(np.int32)),
        A=cast(A), Bc=cast(Bc), beta=cast(beta),
        x=cast(g.z[:nh]),
        norm=cast(np.sqrt((2 * ell[:, 0] + 1) / (4 * np.pi))),
        parity_m=cast((-1.0) ** np.arange(nm)),
        m_vals=jnp.asarray(np.arange(nm, dtype=np.int32)),
        lmax=lmax, mmax=mmax, mp=mp, chunk=chunk, backend=backend)


def _rec_step(otf: LegendreOTF, carry, l):
    """One l-step of the scaled recurrence; emits normalized lambda row."""
    dt = otf.seed_mant.dtype
    mm = otf.m_vals
    big = jnp.asarray(2.0 ** _SCALE_POW, dt)
    bigi = jnp.asarray(2.0 ** -_SCALE_POW, dt)
    prev, prev_e, cur, cur_e = carry
    start = (jnp.maximum(mm, abs(otf.mp)) == l)
    cur = jnp.where(start, otf.seed_mant, cur)
    cur_e = jnp.where(start, otf.seed_exp, cur_e)
    prev = jnp.where(start, 0.0, prev)
    prev_e = jnp.where(start, 0, prev_e)
    emit = jnp.where(cur_e == 0, cur,
                     jnp.where(cur_e == -1, cur * bigi,
                               jnp.where(cur_e == -2, cur * (bigi * bigi),
                                         0.0)))
    lc = jnp.clip(l, 0, otf.lmax)
    valid = (l <= otf.lmax).astype(dt)
    emit = emit * otf.norm[lc] * valid
    # recurrence l -> l+1
    alpha = otf.A[lc] * otf.x[:, None] + otf.Bc[lc]
    de = prev_e - cur_e
    sc = jnp.where(de == 0, 1.0, jnp.where(de <= -1, bigi, big)).astype(dt)
    sc = jnp.where(de <= -2, 0.0, sc)
    new = alpha * cur - otf.beta[lc] * prev * sc
    grow = jnp.abs(new) > big
    new = jnp.where(grow, new * bigi, new)
    cur_scaled = jnp.where(grow, cur * bigi, cur)
    # the divided cur must carry the incremented exponent too, else the
    # beta*prev term is double-scaled (to ~2^-30 of its value) on the step
    # after a rescale — catastrophic when the rescale lands near the
    # turning point where prev ~ cur (seen as ~1e8 mode amplification at
    # nside 512 before the fix)
    new_e = cur_e + grow.astype(jnp.int32)
    return (cur_scaled, new_e, new, new_e), emit


def _init_rec_carry(otf: LegendreOTF):
    # derive from the OTF arrays (zeros_like) so the carry inherits any
    # device-varying sharding inside shard_map (scan requires carry in/out
    # types, incl. varying manual axes, to match)
    z = jnp.zeros_like(otf.seed_mant)
    zi = jnp.zeros_like(otf.seed_exp)
    return (z, zi, z, zi - 128)


def _lam_chunks_scan(otf: LegendreOTF, body_per_chunk, init_extra):
    """Eager helper (tests): run body_per_chunk(l0, lam_block, extra)."""
    L = otf.chunk
    nl = otf.lmax + 1
    nchunks = (nl + L - 1) // L
    carry = _init_rec_carry(otf)
    extra = init_extra
    for c in range(nchunks):
        ls = jnp.arange(c * L, (c + 1) * L, dtype=jnp.int32)
        carry, lam = jax.lax.scan(partial(_rec_step, otf), carry, ls)
        extra = body_per_chunk(c * L, lam, extra)
    return extra


def _chunk_axes(otf: LegendreOTF, ndim_batch: int):
    """(nchunks, L, pad_l, parity weights builder) shared by both passes."""
    L = otf.chunk
    nl = otf.lmax + 1
    pad_l = (-nl) % L
    nchunks = (nl + pad_l) // L
    return L, nl, pad_l, nchunks


def _even_weights(otf: LegendreOTF, ls: jnp.ndarray):
    """(L, nm) weight of the even-(l+m) subspace for the given ells."""
    sign_l = (-1.0) ** ls.astype(otf.seed_mant.dtype)
    return 0.5 * (1.0 + sign_l[:, None] * otf.parity_m[None, :])


def synth_legendre_otf(otf: LegendreOTF, otf_neg, alm: jnp.ndarray, nh: int):
    """alm (..., nl, nm) complex -> (F_north (..., nh, nm), F_south).

    One lax.scan over l-chunks: the chunk body regenerates a (L, nh, nm)
    Lambda block by recurrence and contracts it with the alm chunk (two
    einsums for the two (l+m)-parity subspaces). Compiles once regardless
    of lmax. backend='pallas' plans route through the fused kernel."""
    if otf.backend == "pallas":
        interp = jax.default_backend() == "cpu"
        if nh >= 1024:
            # round-5 MXU kernel: the batched-dot accumulation layout
            # wins above nside ~512 (49.7 vs 23.4 SHT/s at nside 1024,
            # BENCH r05); the VPU kernel stays for small grids where the
            # finer m-grid overhead dominates
            from .pallas_sht import synth_legendre_pallas_mxu
            return synth_legendre_pallas_mxu(otf, alm, nh,
                                             interpret=interp)
        from .pallas_sht import synth_legendre_pallas
        return synth_legendre_pallas(otf, alm, nh, interpret=interp)
    L, nl, pad_l, nchunks = _chunk_axes(otf, alm.ndim - 2)
    batch = alm.shape[:-2]
    nm = otf.mmax + 1
    cdt = alm.dtype
    a_pad = jnp.pad(alm, [(0, 0)] * (alm.ndim - 2) + [(0, pad_l), (0, 0)])
    # chunk axis leading for scan xs
    a_chunks = jnp.moveaxis(
        a_pad.reshape(*batch, nchunks, L, nm), -3, 0)

    def chunk_body(carry, xs):
        rec, Fe, Fo = carry
        a_c, l0 = xs
        ls = l0 + jnp.arange(L, dtype=jnp.int32)
        rec, lam = jax.lax.scan(partial(_rec_step, otf), rec, ls)
        even = _even_weights(otf, ls)
        Fe = Fe + jnp.einsum("...lm,lrm->...rm", a_c * even, lam, precision="float32")
        Fo = Fo + jnp.einsum("...lm,lrm->...rm", a_c * (1.0 - even), lam, precision="float32")
        return (rec, Fe, Fo), None

    Fe0 = jnp.zeros(batch + (nh, 1), cdt) \
        + (otf.seed_mant[:, :1] * 0).astype(cdt) \
        + (otf.parity_m * 0).astype(cdt)
    l0s = jnp.arange(nchunks, dtype=jnp.int32) * L
    (rec, Fe, Fo), _ = jax.lax.scan(
        chunk_body, (_init_rec_carry(otf), Fe0, Fe0), (a_chunks, l0s))
    # lambda(pi-theta) = (-1)^(l+m) lambda(theta) for mp=0 (spin 0)
    return Fe + Fo, Fe - Fo


def adjoint_legendre_otf(otf: LegendreOTF, F_n: jnp.ndarray, F_s: jnp.ndarray):
    """(F_north, F_south rows at theta_r) -> alm (..., nl, nm)."""
    if otf.backend == "pallas":
        interp = jax.default_backend() == "cpu"
        if F_n.shape[-2] >= 1024:
            from .pallas_sht import adjoint_legendre_pallas_mxu
            return adjoint_legendre_pallas_mxu(otf, F_n, F_s,
                                               interpret=interp)
        from .pallas_sht import adjoint_legendre_pallas
        return adjoint_legendre_pallas(otf, F_n, F_s, interpret=interp)
    L, nl, pad_l, nchunks = _chunk_axes(otf, F_n.ndim - 2)
    batch = F_n.shape[:-2]
    nm = otf.mmax + 1
    Ge = F_n + F_s            # couples to even (l+m) terms
    Go = F_n - F_s

    def chunk_body(rec, l0):
        ls = l0 + jnp.arange(L, dtype=jnp.int32)
        rec, lam = jax.lax.scan(partial(_rec_step, otf), rec, ls)
        even = _even_weights(otf, ls)
        a_e = jnp.einsum("...rm,lrm->...lm", Ge, lam, precision="float32") * even
        a_o = jnp.einsum("...rm,lrm->...lm", Go, lam, precision="float32") * (1.0 - even)
        return rec, a_e + a_o

    l0s = jnp.arange(nchunks, dtype=jnp.int32) * L
    rec, chunks = jax.lax.scan(chunk_body, _init_rec_carry(otf), l0s)
    # chunks: (nchunks, ..., L, nm) -> (..., nl, nm)
    out = jnp.moveaxis(chunks, 0, -3).reshape(*batch, nchunks * L, nm)
    return out[..., :nl, :]


def synth_spin2_otf(otf_p: LegendreOTF, otf_m: LegendreOTF, cp: jnp.ndarray,
                    cm: jnp.ndarray, nh: int):
    """Spin-2 Legendre stage on the fly.

    cp = -(E+iB), cm = -(E-iB) (..., nl, nm). Returns (Sp, Sm) full-ring
    spectra (..., nring, nm) for the +2 and -2 harmonics, mirroring
    sht._legendre_synth with (lam_p2, lam_m2) tables:
      Sp_north = sum_l cp lam+,  Sp_south = sum_l cp (-1)^(l+m) lam-
      Sm_north = sum_l cm lam-,  Sm_south = sum_l cm (-1)^(l+m) lam+
    with lam+- regenerated by the mp = -+2 recurrences in one chunk scan.
    """
    L, nl, pad_l, nchunks = _chunk_axes(otf_p, cp.ndim - 2)
    batch = cp.shape[:-2]
    nm = otf_p.mmax + 1
    cdt = cp.dtype
    c2 = jnp.stack([cp, cm])                         # (2, ..., nl, nm)
    c_pad = jnp.pad(c2, [(0, 0)] * (c2.ndim - 2) + [(0, pad_l), (0, 0)])
    c_chunks = jnp.moveaxis(
        c_pad.reshape(2, *batch, nchunks, L, nm), -3, 0)

    def chunk_body(carry, xs):
        rec_p, rec_m, Ep, Op, Em, Om = carry
        c_c, l0 = xs                                  # c_c (2, ..., L, nm)
        ls = l0 + jnp.arange(L, dtype=jnp.int32)
        rec_p, lam_p = jax.lax.scan(partial(_rec_step, otf_p), rec_p, ls)
        rec_m, lam_m = jax.lax.scan(partial(_rec_step, otf_m), rec_m, ls)
        even = _even_weights(otf_p, ls)
        ce = c_c * even
        co = c_c * (1.0 - even)
        # E/O accumulators against both tables: index [coeff(2), ...]
        Ep = Ep + jnp.einsum("k...lm,lrm->k...rm", ce, lam_p, precision="float32")
        Op = Op + jnp.einsum("k...lm,lrm->k...rm", co, lam_p, precision="float32")
        Em = Em + jnp.einsum("k...lm,lrm->k...rm", ce, lam_m, precision="float32")
        Om = Om + jnp.einsum("k...lm,lrm->k...rm", co, lam_m, precision="float32")
        return (rec_p, rec_m, Ep, Op, Em, Om), None

    z = jnp.zeros((2,) + batch + (nh, 1), cdt) \
        + (otf_p.seed_mant[:, :1] * 0).astype(cdt) \
        + (otf_p.parity_m * 0).astype(cdt)
    l0s = jnp.arange(nchunks, dtype=jnp.int32) * L
    (rp, rm, Ep, Op, Em, Om), _ = jax.lax.scan(
        chunk_body, (_init_rec_carry(otf_p), _init_rec_carry(otf_m),
                     z, z, z, z), (c_chunks, l0s))

    def full(north, south_half):
        south = jnp.flip(south_half[..., : nh - 1, :], axis=-2)
        return jnp.concatenate([north, south], axis=-2)

    Sp = full(Ep[0] + Op[0], Em[0] - Om[0])
    Sm = full(Em[1] + Om[1], Ep[1] - Op[1])
    return Sp, Sm


def alm2map_spin2_otf(plan: SHTPlan, otf_p: LegendreOTF, otf_m: LegendreOTF,
                      alm_E: jnp.ndarray, alm_B: jnp.ndarray):
    """Spin-2 synthesis without tables (same semantics as
    sht.alm2map_spin2)."""
    cp = -(alm_E + 1j * alm_B).astype(plan.cdtype)
    cm = -(alm_E - 1j * alm_B).astype(plan.cdtype)
    Sp, Sm = synth_spin2_otf(otf_p, otf_m, cp, cm, plan.nh)
    mpos = jnp.concatenate([jnp.zeros((1,)), jnp.ones((plan.mmax,))]
                           ).astype(plan.rdtype)
    P = ring_synthesis(plan, Sp) + jnp.conj(ring_synthesis(plan, Sm * mpos))
    Q = _gather_pix(plan, P.real.astype(plan.rdtype))
    U = _gather_pix(plan, P.imag.astype(plan.rdtype))
    return Q, U


# ---------------------------------------------------------------------------
# Public transforms (spin 0)
# ---------------------------------------------------------------------------

def alm2map_otf(plan: SHTPlan, otf: LegendreOTF, alm: jnp.ndarray):
    """Y without tables: same semantics as sht.alm2map."""
    alm = alm.astype(plan.cdtype)
    F_n, F_s = synth_legendre_otf(otf, None, alm, plan.nh)
    south = jnp.flip(F_s[..., : plan.nh - 1, :], axis=-2)
    F = jnp.concatenate([F_n, south], axis=-2)
    scale = jnp.concatenate([jnp.ones((1,)), 2.0 * jnp.ones((plan.mmax,))]
                            ).astype(plan.rdtype)
    f = ring_synthesis(plan, F * scale)
    return _gather_pix(plan, f.real.astype(plan.rdtype))


def adjoint_from_ring_spectra(plan: SHTPlan, otf: LegendreOTF,
                              F: jnp.ndarray):
    """Legendre-adjoint of full-ring spectra F (..., nring, nm) on the fly
    (the tail shared by Yt and YtW)."""
    F_n = F[..., : plan.nh, :]
    F_s = jnp.flip(F[..., plan.nh:, :], axis=-2)
    pad = plan.nh - 1 - F_s.shape[-2]
    F_s = jnp.pad(F_s, [(0, 0)] * (F_s.ndim - 2) + [(0, pad + 1), (0, 0)])
    return adjoint_legendre_otf(otf, F_n, F_s)


def map2alm_otf(plan: SHTPlan, otf: LegendreOTF, maps: jnp.ndarray):
    """YtW without tables: same semantics as sht.map2alm."""
    w = plan.ring_weight
    fpad = _pad_to_rings(plan, maps) * w[:, None]
    F = ring_analysis(plan, fpad.astype(plan.cdtype))
    return adjoint_from_ring_spectra(plan, otf, F)
