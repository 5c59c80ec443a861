"""Batched spherical-harmonic transforms on HEALPix grids, TPU-native.

Replaces libsharp2 + its MPI layer in the reference (``sharp.f90``,
``comm_map_mod.f90:437-575`` — the Y/Yt/YtW/WY methods). The design is built
for XLA rather than translated from libsharp:

  * alm live in a rectangular complex layout ``a[..., l, m]`` (m >= 0,
    zero-padded above the triangle) — static shapes, mask where needed.
  * The Legendre stage is one batched einsum over l per hemisphere —
    an MXU-shaped matmul batched over m and any leading batch axes
    (components x bands x Stokes x chains all batch through one kernel).
  * The ring Fourier stage uses a Bluestein chirp-z transform so that every
    HEALPix ring — regardless of its pixel count 4, 8, ..., 4*nside — goes
    through ONE static-shape batched FFT. No ragged FFTs, no per-ring-size
    code paths, no dynamic shapes.
  * North/south hemisphere symmetry lambda_lm(pi-theta) =
    (-1)^(l+m) lambda'_lm(theta) halves the Legendre table.

Conventions: spin-0 matches healpy/HEALPix (Condon-Shortley, Y_lm =
N_l d^l_{m,0} e^{im phi}); spin-2 uses sY_lm = N_l d^l_{m,-s} e^{im phi} and
(Q +- iU) = sum_lm (-(E +- iB))_lm (+-2)Y_lm, the HEALPix polarization
convention. The alm inner product is <a,b> = sum_l [a_l0 b_l0 +
2 sum_{m>0} Re(a conj(b))] (same metric as the reference's real-packed
``mpi_dot_product``, comm_utils.f90:599); adjoints below are exact w.r.t. it.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from scipy.fft import next_fast_len

from . import healpix
from .wigner import spin_lambda_north


# ---------------------------------------------------------------------------
# Plan: all static precomputed device arrays for one (nside, lmax, mmax)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["lam0", "lam_p2", "lam_m2", "parity", "lmmask", "synth_A",
                 "synth_Vh", "synth_B", "ana_A", "ana_Vh", "ana_B", "pix_idx",
                 "pad_src", "pad_valid", "ring_weight", "qw", "otf0",
                 "belt_phase", "cap_sA", "cap_sVh", "cap_sB", "cap_aA",
                 "cap_aVh", "cap_aB", "capn_src", "capn_valid", "caps_src",
                 "caps_valid", "capn_pix_idx", "caps_pix_idx"],
    meta_fields=["nside", "lmax", "mmax", "rdtype", "cdtype", "Ls", "La",
                 "cap_Ls", "cap_La", "split"],
)
@dataclasses.dataclass(frozen=True)
class SHTPlan:
    nside: int
    lmax: int
    mmax: int
    rdtype: Any
    cdtype: Any
    # Legendre tables, northern rings incl. equator: (nh, lmax+1, mmax+1)
    lam0: jax.Array          # spin-0
    lam_p2: jax.Array | None  # spin-2: N_l d^l_{m,-2}
    lam_m2: jax.Array | None  # spin-2: N_l d^l_{m,+2}
    parity: jax.Array        # (lmax+1, mmax+1) (-1)^(l+m), 0 outside triangle
    lmmask: jax.Array        # (lmax+1, mmax+1) 1.0 on m<=l
    # Bluestein synthesis: f_p = sum_m G_m e^{im phi_p}
    synth_A: jax.Array       # (nring, mmax+1) complex: e^{im phi0} w^{m^2}
    synth_Vh: jax.Array      # (nring, Ls) complex: FFT of shifted chirp
    synth_B: jax.Array       # (nring, pmax) complex: w^{p^2}, 0 for p>=nphi
    # Bluestein analysis: F_m = sum_p f_p e^{-im phi_p}
    ana_A: jax.Array         # (nring, pmax) complex: w^{-p^2}, 0 for p>=nphi
    ana_Vh: jax.Array        # (nring, La) complex
    ana_B: jax.Array         # (nring, mmax+1) complex: e^{-im phi0} w^{-m^2}
    Ls: int
    La: int
    # pixel <-> padded-ring gathers
    pix_idx: jax.Array       # (npix,) int32 into flattened (nring, pmax)
    pad_src: jax.Array       # (nring*pmax,) int32 into map, clamped
    pad_valid: jax.Array     # (nring*pmax,) rdtype 0/1 mask
    ring_weight: jax.Array   # (nring,) quadrature weight per pixel of each ring
    qw: jax.Array            # (nring,) = ring_weight (alias kept for clarity)
    # On-the-fly Legendre recurrence (sht_otf.LegendreOTF) used instead of
    # the lam0 table when tables=False — enables lmax beyond table memory.
    otf0: object = None
    # --- belt/cap split ring stage (the fast local path) ---
    # The 2*nside+1 equatorial-belt rings all have nphi = 4*nside, so their
    # Fourier stage is ONE power-of-2 (i)FFT of length 4*nside plus a phase
    # twist; only the 2*(nside-1) polar-cap rings need Bluestein, with a
    # shorter (power-of-2) convolution length. The whole-sphere Bluestein
    # tables above are kept for the ring-sharded multi-chip path
    # (parallel/sht_shard.py), which slices rings by contiguous blocks.
    split: bool = False
    cap_Ls: int = 0
    cap_La: int = 0
    belt_phase: jax.Array | None = None   # (nbelt, nm) e^{i m phi0_r}
    cap_sA: jax.Array | None = None       # (2nc, nm)
    cap_sVh: jax.Array | None = None      # (2nc, cap_Ls)
    cap_sB: jax.Array | None = None       # (2nc, cap_pmax)
    cap_aA: jax.Array | None = None       # (2nc, cap_pmax)
    cap_aVh: jax.Array | None = None      # (2nc, cap_La)
    cap_aB: jax.Array | None = None       # (2nc, nm)
    capn_src: jax.Array | None = None     # (nc*pmax,) int32 into map
    capn_valid: jax.Array | None = None
    caps_src: jax.Array | None = None
    caps_valid: jax.Array | None = None
    capn_pix_idx: jax.Array | None = None  # (ncap_pix,) into (nc, pmax) flat
    caps_pix_idx: jax.Array | None = None

    @property
    def nh(self) -> int:
        return 2 * self.nside

    @property
    def nring(self) -> int:
        return 4 * self.nside - 1

    @property
    def npix(self) -> int:
        return 12 * self.nside * self.nside

    @property
    def pmax(self) -> int:
        return 4 * self.nside

    @property
    def ncap(self) -> int:
        return self.nside - 1

    @property
    def nbelt(self) -> int:
        return 2 * self.nside + 1

    @property
    def cap_pmax(self) -> int:
        return 4 * (self.nside - 1)


def _chirp_powers(n: np.ndarray, k2: np.ndarray) -> np.ndarray:
    """exp(i*pi*k2/n) computed with k2 reduced mod 2n in exact ints."""
    red = np.mod(k2, 2 * n)
    return np.exp(1j * np.pi * red / n)


@functools.lru_cache(maxsize=None)
def get_plan(nside: int, lmax: int, mmax: int | None = None, spin2: bool = False,
             dtype: str = "float64", weights: str = "ring",
             tables: bool = True,
             legendre_backend: str = "xla") -> SHTPlan:
    """Build (host) and cache the SHT plan for one resolution.

    tables=False skips the precomputed Legendre tables (lam0/lam_p2/lam_m2
    are None) — used by the on-the-fly transforms (sht_otf) that only need
    the ring/Bluestein machinery of the plan. legendre_backend selects the
    tableless Legendre stage: 'xla' (chunked scan) or 'pallas' (fused
    kernel; interpret-mode automatically on CPU)."""
    if mmax is None:
        mmax = lmax
    rdtype = jnp.dtype(dtype)
    cdtype = jnp.complex128 if rdtype == jnp.float64 else jnp.complex64
    g = healpix.ring_geometry(nside)
    nring, pmax, nm = g.nring, 4 * nside, mmax + 1

    lam0_np = None
    if tables:
        lam0_np, _ = spin_lambda_north(nside, lmax, 0, mmax)
    if spin2 and tables:
        lam_p2_np, lam_m2_np = spin_lambda_north(nside, lmax, 2, mmax)
    ll = np.arange(lmax + 1)[:, None]
    mm = np.arange(mmax + 1)[None, :]
    tri = (mm <= ll).astype(np.float64)
    parity = ((-1.0) ** (ll + mm)) * tri

    # --- Bluestein synthesis tables ---
    nphi = g.nphi.astype(np.int64)[:, None]
    m = np.arange(nm, dtype=np.int64)[None, :]
    p = np.arange(pmax, dtype=np.int64)[None, :]
    Ls = next_fast_len(pmax + 2 * mmax + 1, real=False)
    synth_A = np.exp(1j * g.phi0[:, None] * m) * _chirp_powers(nphi, m * m)
    synth_B = np.where(p < nphi, _chirp_powers(nphi, p * p), 0.0)
    # shifted chirp v[j] = w^{-j^2}, j = idx - mmax, idx = 0..mmax+pmax-1
    j = np.arange(mmax + pmax, dtype=np.int64)[None, :] - mmax
    v = _chirp_powers(nphi, -(j * j))
    vpad = np.zeros((nring, Ls), dtype=np.complex128)
    vpad[:, : mmax + pmax] = v
    synth_Vh = np.fft.fft(vpad, axis=-1)

    # --- Bluestein analysis tables (z -> conj) ---
    La = next_fast_len(2 * pmax + mmax, real=False)
    ana_A = np.where(p < nphi, _chirp_powers(nphi, -(p * p)), 0.0)
    ana_B = np.exp(-1j * g.phi0[:, None] * m) * _chirp_powers(nphi, -(m * m))
    ja = np.arange(pmax + mmax, dtype=np.int64)[None, :] - (pmax - 1)
    va = _chirp_powers(nphi, ja * ja)
    vapad = np.zeros((nring, La), dtype=np.complex128)
    vapad[:, : pmax + mmax] = va
    ana_Vh = np.fft.fft(vapad, axis=-1)

    # --- pixel gathers ---
    ring_of = healpix.ring_index_of_pix(nside).astype(np.int64)
    pinring = healpix.pix_in_ring_of_pix(nside).astype(np.int64)
    pix_idx = (ring_of * pmax + pinring).astype(np.int32)
    pad_src = np.zeros(nring * pmax, dtype=np.int64)
    pad_valid = np.zeros(nring * pmax, dtype=np.float64)
    rr = np.repeat(np.arange(nring), pmax)
    pp = np.tile(np.arange(pmax), nring)
    ok = pp < g.nphi[rr]
    pad_src[ok] = g.offset[rr[ok]] + pp[ok]
    pad_valid[ok] = 1.0

    w = healpix.ring_weights(nside) if weights == "ring" else healpix.area_weights(nside)

    # --- belt/cap split tables (fast local ring stage) ---
    nc = nside - 1
    split = nc > 0
    belt_phase = cap_sA = cap_sVh = cap_sB = None
    cap_aA = cap_aVh = cap_aB = None
    capn_src = capn_valid = caps_src = caps_valid = None
    capn_pix_idx = caps_pix_idx = None
    cap_Ls = cap_La = 0
    if split:
        nbelt = 2 * nside + 1
        cap_pmax = 4 * nc
        # belt: e^{i m phi0_r} for rings nc .. nc+nbelt-1
        belt_phase = np.exp(1j * g.phi0[nc: nc + nbelt, None] * m)
        # caps: Bluestein with power-of-2 length (XLA TPU FFT strongly
        # prefers powers of two; L >= n_in + n_out - 1 suffices)
        idx_cap = np.concatenate([np.arange(nc), np.arange(3 * nside, 4 * nside - 1)])
        nphi_c = g.nphi.astype(np.int64)[idx_cap][:, None]
        phi0_c = g.phi0[idx_cap][:, None]
        pc = np.arange(cap_pmax, dtype=np.int64)[None, :]
        cap_Ls = 1 << int(np.ceil(np.log2(mmax + cap_pmax + 1)))
        cap_sA = np.exp(1j * phi0_c * m) * _chirp_powers(nphi_c, m * m)
        cap_sB = np.where(pc < nphi_c, _chirp_powers(nphi_c, pc * pc), 0.0)
        jc = np.arange(mmax + cap_pmax, dtype=np.int64)[None, :] - mmax
        vc = _chirp_powers(nphi_c, -(jc * jc))
        vcpad = np.zeros((2 * nc, cap_Ls), dtype=np.complex128)
        vcpad[:, : mmax + cap_pmax] = vc
        cap_sVh = np.fft.fft(vcpad, axis=-1)
        cap_La = 1 << int(np.ceil(np.log2(cap_pmax + mmax + 1)))
        cap_aA = np.where(pc < nphi_c, _chirp_powers(nphi_c, -(pc * pc)), 0.0)
        cap_aB = np.exp(-1j * phi0_c * m) * _chirp_powers(nphi_c, -(m * m))
        jca = np.arange(cap_pmax + mmax, dtype=np.int64)[None, :] - (cap_pmax - 1)
        vca = _chirp_powers(nphi_c, jca * jca)
        vcapad = np.zeros((2 * nc, cap_La), dtype=np.complex128)
        vcapad[:, : cap_pmax + mmax] = vca
        cap_aVh = np.fft.fft(vcapad, axis=-1)
        # cap pixel pad/gather tables (belt is a pure reshape)
        def _cap_tables(rows):
            src = np.zeros(len(rows) * pmax, dtype=np.int64)
            val = np.zeros(len(rows) * pmax, dtype=np.float64)
            rr_ = np.repeat(rows, pmax)
            pp_ = np.tile(np.arange(pmax), len(rows))
            ok_ = pp_ < g.nphi[rr_]
            src[ok_] = g.offset[rr_[ok_]] + pp_[ok_]
            val[ok_] = 1.0
            # inverse: for each cap pixel, its (local_row, p) slot
            loc = np.repeat(np.arange(len(rows)), g.nphi[rows])
            pin = np.concatenate([np.arange(n) for n in g.nphi[rows]])
            return (src.astype(np.int32), val,
                    (loc * pmax + pin).astype(np.int32))
        capn_src, capn_valid, capn_pix_idx = _cap_tables(np.arange(nc))
        caps_src, caps_valid, caps_pix_idx = _cap_tables(
            np.arange(3 * nside, 4 * nside - 1))

    # cast on host first: the TPU backend cannot ingest float64 buffers,
    # and device-side convert_element_type would require an f64 H2D.
    otf0 = None
    if not tables:
        from .sht_otf import legendre_otf
        otf0 = legendre_otf(nside, lmax, 0, dtype=dtype,
                            chunk=min(64, lmax + 1), mmax=mmax,
                            backend=legendre_backend)

    dev = lambda x: jnp.asarray(np.asarray(x, dtype=np.dtype(rdtype)))
    devc = lambda x: jnp.asarray(np.asarray(x, dtype=np.dtype(cdtype)))
    return SHTPlan(
        nside=nside, lmax=lmax, mmax=mmax, rdtype=rdtype, cdtype=cdtype,
        lam0=dev(lam0_np) if tables else None,
        lam_p2=dev(lam_p2_np) if (spin2 and tables) else None,
        lam_m2=dev(lam_m2_np) if (spin2 and tables) else None,
        parity=dev(parity), lmmask=dev(tri),
        synth_A=devc(synth_A), synth_Vh=devc(synth_Vh), synth_B=devc(synth_B),
        ana_A=devc(ana_A), ana_Vh=devc(ana_Vh), ana_B=devc(ana_B),
        Ls=Ls, La=La,
        pix_idx=jnp.asarray(pix_idx),
        pad_src=jnp.asarray(pad_src.astype(np.int32)),
        pad_valid=dev(pad_valid),
        ring_weight=dev(w), qw=dev(w),
        otf0=otf0,
        split=split, cap_Ls=cap_Ls, cap_La=cap_La,
        belt_phase=devc(belt_phase) if split else None,
        cap_sA=devc(cap_sA) if split else None,
        cap_sVh=devc(cap_sVh) if split else None,
        cap_sB=devc(cap_sB) if split else None,
        cap_aA=devc(cap_aA) if split else None,
        cap_aVh=devc(cap_aVh) if split else None,
        cap_aB=devc(cap_aB) if split else None,
        capn_src=jnp.asarray(capn_src) if split else None,
        capn_valid=dev(capn_valid) if split else None,
        caps_src=jnp.asarray(caps_src) if split else None,
        caps_valid=dev(caps_valid) if split else None,
        capn_pix_idx=jnp.asarray(capn_pix_idx) if split else None,
        caps_pix_idx=jnp.asarray(caps_pix_idx) if split else None,
    )


# ---------------------------------------------------------------------------
# Ring Fourier stage (batched Bluestein over all rings at once)
# ---------------------------------------------------------------------------

def _fft_flat(x: jax.Array, n: int, inverse: bool = False) -> jax.Array:
    """Batched FFT over the last axis via a flattened-2D view.

    The reshape to (-1, len) pins a row-major layout on the FFT operand —
    required by the CPU backend's fft thunk when upstream vmap/sharding
    would otherwise hand it a transposed layout — and is a free bitcast on
    TPU when the layout is already natural.
    """
    shape = x.shape
    flat = x.reshape(-1, shape[-1])
    out = jnp.fft.ifft(flat, n=n, axis=-1) if inverse else jnp.fft.fft(flat, n=n, axis=-1)
    return out.reshape(*shape[:-1], out.shape[-1])


def _ring_synthesis_bluestein(plan: SHTPlan, G: jax.Array) -> jax.Array:
    """Whole-sphere Bluestein synthesis (used by the ring-sharded path)."""
    u = G * plan.synth_A
    U = _fft_flat(u, plan.Ls)
    w = _fft_flat(U * plan.synth_Vh, plan.Ls, inverse=True)
    w = jax.lax.slice_in_dim(w, plan.mmax, plan.mmax + plan.pmax, axis=-1)
    return w * plan.synth_B


def ring_synthesis(plan: SHTPlan, G: jax.Array) -> jax.Array:
    """f[..., r, p] = sum_{m=0..mmax} G[..., r, m] e^{i m phi_{rp}} (complex).

    Output padded to (..., nring, pmax); entries with p >= nphi_r are zero.
    Fast path: belt rings via one power-of-2 iFFT (all have nphi = 4 nside),
    polar caps via a short power-of-2 Bluestein.
    """
    if not plan.split:
        return _ring_synthesis_bluestein(plan, G)
    nc, nbelt, fourN = plan.ncap, plan.nbelt, plan.pmax
    # belt: alias-fold m modulo 4*nside, then inverse DFT of length 4*nside
    H = jax.lax.slice_in_dim(G, nc, nc + nbelt, axis=-2) * plan.belt_phase
    nm = H.shape[-1]
    pad = (-nm) % fourN
    if pad:
        H = jnp.pad(H, [(0, 0)] * (H.ndim - 1) + [(0, pad)])
    if H.shape[-1] > fourN:
        H = H.reshape(*H.shape[:-1], -1, fourN).sum(axis=-2)
    fb = _fft_flat(H, fourN, inverse=True) * fourN
    # caps: short Bluestein (north and south rows stacked)
    Gc = jnp.concatenate([G[..., :nc, :], G[..., nc + nbelt:, :]], axis=-2)
    u = Gc * plan.cap_sA
    U = _fft_flat(u, plan.cap_Ls)
    w = _fft_flat(U * plan.cap_sVh, plan.cap_Ls, inverse=True)
    w = jax.lax.slice_in_dim(w, plan.mmax, plan.mmax + plan.cap_pmax, axis=-1)
    fc = w * plan.cap_sB
    fc = jnp.pad(fc, [(0, 0)] * (fc.ndim - 2)
                 + [(0, 0), (0, fourN - plan.cap_pmax)])
    return jnp.concatenate([fc[..., :nc, :], fb, fc[..., nc:, :]], axis=-2)


def _ring_analysis_bluestein(plan: SHTPlan, f: jax.Array) -> jax.Array:
    """Whole-sphere Bluestein analysis (used by the ring-sharded path)."""
    u = f * plan.ana_A
    U = _fft_flat(u, plan.La)
    w = _fft_flat(U * plan.ana_Vh, plan.La, inverse=True)
    w = jax.lax.slice_in_dim(w, plan.pmax - 1, plan.pmax - 1 + plan.mmax + 1, axis=-1)
    return w * plan.ana_B


def ring_analysis(plan: SHTPlan, f: jax.Array) -> jax.Array:
    """F[..., r, m] = sum_{p<nphi_r} f[..., r, p] e^{-i m phi_{rp}} (complex)."""
    if not plan.split:
        return _ring_analysis_bluestein(plan, f)
    nc, nbelt, fourN, nm = plan.ncap, plan.nbelt, plan.pmax, plan.mmax + 1
    # belt: F_m = e^{-im phi0} * DFTbin(m mod 4 nside)
    fb = jax.lax.slice_in_dim(f, nc, nc + nbelt, axis=-2)
    bins = _fft_flat(fb, fourN)
    reps = -(-nm // fourN)
    if reps > 1:
        bins = jnp.tile(bins, [1] * (bins.ndim - 1) + [reps])
    Fb = bins[..., :nm] * jnp.conj(plan.belt_phase)
    # caps
    fc = jnp.concatenate([f[..., :nc, : plan.cap_pmax],
                          f[..., nc + nbelt:, : plan.cap_pmax]], axis=-2)
    u = fc * plan.cap_aA
    U = _fft_flat(u, plan.cap_La)
    w = _fft_flat(U * plan.cap_aVh, plan.cap_La, inverse=True)
    w = jax.lax.slice_in_dim(w, plan.cap_pmax - 1, plan.cap_pmax - 1 + nm,
                             axis=-1)
    Fc = w * plan.cap_aB
    return jnp.concatenate([Fc[..., :nc, :], Fb, Fc[..., nc:, :]], axis=-2)


def _pad_to_rings(plan: SHTPlan, maps: jax.Array) -> jax.Array:
    """(..., npix) -> (..., nring, pmax) with zeros in invalid slots."""
    if plan.split:
        nc, fourN = plan.ncap, plan.pmax
        b0 = 2 * plan.nside * nc
        belt = jax.lax.slice_in_dim(
            maps, b0, b0 + plan.nbelt * fourN, axis=-1
        ).reshape(*maps.shape[:-1], plan.nbelt, fourN)
        cn = (maps[..., plan.capn_src] * plan.capn_valid).reshape(
            *maps.shape[:-1], nc, fourN)
        cs = (maps[..., plan.caps_src] * plan.caps_valid).reshape(
            *maps.shape[:-1], nc, fourN)
        return jnp.concatenate([cn, belt, cs], axis=-2)
    flat = maps[..., plan.pad_src] * plan.pad_valid
    return flat.reshape(*maps.shape[:-1], plan.nring, plan.pmax)


def _gather_pix(plan: SHTPlan, fpad: jax.Array) -> jax.Array:
    """(..., nring, pmax) -> (..., npix)."""
    if plan.split:
        nc, nbelt, fourN = plan.ncap, plan.nbelt, plan.pmax
        lead = fpad.shape[:-2]
        cn = fpad[..., :nc, :].reshape(*lead, nc * fourN)[..., plan.capn_pix_idx]
        belt = fpad[..., nc: nc + nbelt, :].reshape(*lead, nbelt * fourN)
        cs = fpad[..., nc + nbelt:, :].reshape(*lead, nc * fourN)[..., plan.caps_pix_idx]
        return jnp.concatenate([cn, belt, cs], axis=-1)
    return fpad.reshape(*fpad.shape[:-2], -1)[..., plan.pix_idx]


# ---------------------------------------------------------------------------
# Legendre stage
# ---------------------------------------------------------------------------

def _legendre_synth(plan: SHTPlan, alm: jax.Array, lam: jax.Array,
                    lam_south: jax.Array) -> jax.Array:
    """alm (..., nl, nm) complex -> F (..., nring, nm) complex.

    North rings use table `lam`; south rings use `lam_south` with the parity
    sign folded into the alm (lambda(pi-theta) = (-1)^(l+m) lambda'(theta)).
    """
    alm = alm * plan.lmmask
    Fn = jnp.einsum("...lm,rlm->...rm", alm, lam)
    Fs = jnp.einsum("...lm,rlm->...rm", alm * plan.parity, lam_south)
    south = jnp.flip(Fs[..., : plan.nh - 1, :], axis=-2)
    return jnp.concatenate([Fn, south], axis=-2)


def _legendre_adjoint(plan: SHTPlan, F: jax.Array, lam: jax.Array,
                      lam_south: jax.Array) -> jax.Array:
    """F (..., nring, nm) complex -> alm (..., nl, nm) complex (transpose)."""
    Fn = F[..., : plan.nh, :]
    Fs = jnp.flip(F[..., plan.nh:, :], axis=-2)  # rows at theta_0..theta_{nh-2}
    a = jnp.einsum("...rm,rlm->...lm", Fn, lam)
    a = a + jnp.einsum("...rm,rlm->...lm", Fs, lam_south[: plan.nh - 1]) * plan.parity
    return a * plan.lmmask


# ---------------------------------------------------------------------------
# Public transforms — spin 0
# ---------------------------------------------------------------------------

def alm2map(plan: SHTPlan, alm: jax.Array) -> jax.Array:
    """Y: alm (..., lmax+1, mmax+1) complex -> map (..., npix) real.

    Reference semantics: comm_map_mod.f90:437-455 (Y). Dispatches to the
    on-the-fly Legendre path when the plan was built with tables=False.
    """
    alm = alm.astype(plan.cdtype)
    if plan.lam0 is None:
        from .sht_otf import alm2map_otf
        return alm2map_otf(plan, plan.otf0, alm)
    F = _legendre_synth(plan, alm, plan.lam0, plan.lam0)
    # real field: f = Re( G_0 + sum_{m>=1} 2 G_m e^{im phi} )
    scale = jnp.concatenate([jnp.ones((1,)), 2.0 * jnp.ones((plan.mmax,))]).astype(plan.rdtype)
    f = ring_synthesis(plan, F * scale)
    return _gather_pix(plan, f.real.astype(plan.rdtype))


def alm2map_adjoint(plan: SHTPlan, maps: jax.Array) -> jax.Array:
    """Yt: exact adjoint of alm2map under the epsilon-weighted alm metric.

    Reference semantics: comm_map_mod.f90:511-530 (Yt).
    """
    fpad = _pad_to_rings(plan, maps).astype(plan.cdtype)
    F = ring_analysis(plan, fpad)
    if plan.lam0 is None:
        from .sht_otf import adjoint_from_ring_spectra
        return adjoint_from_ring_spectra(plan, plan.otf0, F)
    return _legendre_adjoint(plan, F, plan.lam0, plan.lam0)


def map2alm(plan: SHTPlan, maps: jax.Array) -> jax.Array:
    """YtW: quadrature analysis — alm ~= map2alm(alm2map(alm)).

    Reference semantics: comm_map_mod.f90:546-564 (YtW).
    """
    w = plan.ring_weight
    fpad = _pad_to_rings(plan, maps) * w[:, None]
    F = ring_analysis(plan, fpad.astype(plan.cdtype))
    if plan.lam0 is None:
        from .sht_otf import adjoint_from_ring_spectra
        return adjoint_from_ring_spectra(plan, plan.otf0, F)
    return _legendre_adjoint(plan, F, plan.lam0, plan.lam0)


def map2alm_iter(plan: SHTPlan, maps: jax.Array, iters: int = 3) -> jax.Array:
    """Jacobi-refined analysis: alm_{k+1} = alm_k + YtW(m - Y alm_k).

    The healpy `iter=` refinement; reduces HEALPix quadrature error by
    orders of magnitude for band-limited maps at lmax ~ 2 nside."""
    a = map2alm(plan, maps)
    for _ in range(iters):
        a = a + map2alm(plan, maps - alm2map(plan, a))
    return a


def map_smooth_weighted(plan: SHTPlan, maps: jax.Array) -> jax.Array:
    """WY-style weighted roundtrip helper (reserved for mapmaking ops)."""
    return alm2map(plan, map2alm(plan, maps))


def smooth_map(plan: SHTPlan, maps: jax.Array, fwhm_arcmin: float,
               iters: int = 0) -> jax.Array:
    """Gaussian-smooth a map in harmonic space (the reference's
    smooth_map, comm_data_mod.f90:450 / comm_map smooth)."""
    from ..instrument.beam import gaussian_bl

    bl = jnp.asarray(gaussian_bl(fwhm_arcmin, plan.lmax).astype(
        np.dtype(plan.rdtype)))
    a = map2alm_iter(plan, maps, iters) if iters else map2alm(plan, maps)
    return alm2map(plan, a * bl[:, None])


# ---------------------------------------------------------------------------
# Public transforms — spin 2 (polarization)
# ---------------------------------------------------------------------------

def alm2map_spin2(plan: SHTPlan, alm_E: jax.Array, alm_B: jax.Array):
    """(E, B) alms -> (Q, U) maps. HEALPix convention:
    Q + iU = sum_lm [-(E + iB)]_lm (+2)Y_lm  (m summed over both signs).
    """
    assert plan.lam_p2 is not None, "plan built without spin2=True"
    cp = -(alm_E + 1j * alm_B).astype(plan.cdtype)   # coeff of +2Y
    cm = -(alm_E - 1j * alm_B).astype(plan.cdtype)   # coeff of -2Y
    Sp = _legendre_synth(plan, cp, plan.lam_p2, plan.lam_m2)
    Sm = _legendre_synth(plan, cm, plan.lam_m2, plan.lam_p2)
    # P(p) = sum_{m>=0} Sp_m e^{im phi} + sum_{m>=1} conj(Sm_m) e^{-im phi}
    mpos = jnp.concatenate([jnp.zeros((1,)), jnp.ones((plan.mmax,))]).astype(plan.rdtype)
    P = ring_synthesis(plan, Sp) + jnp.conj(ring_synthesis(plan, Sm * mpos))
    Q = _gather_pix(plan, P.real.astype(plan.rdtype))
    U = _gather_pix(plan, P.imag.astype(plan.rdtype))
    return Q, U


def alm2map_spin2_adjoint(plan: SHTPlan, Q: jax.Array, U: jax.Array):
    """Exact adjoint of alm2map_spin2 under the epsilon-weighted alm metric.

    Derivation (see module docstring): with P = Q + iU,
      G+ = ring_analysis(P), K = ring_analysis(conj(P)),
      U+_lm = Lambda+^T G+,  U-_lm = Lambda-^T K (m>=1 only),
      E_hat = -(U+ + U-) / eps_m,   B_hat = i (U+ - U-)/... (conjugation
    folded so that only real tables multiply complex ring spectra).
    """
    assert plan.lam_p2 is not None
    P = (Q + 1j * U).astype(plan.cdtype)
    fpad_p = _pad_to_rings(plan, P)
    Gp = ring_analysis(plan, fpad_p)
    K = ring_analysis(plan, jnp.conj(fpad_p))
    Up = _legendre_adjoint(plan, Gp, plan.lam_p2, plan.lam_m2)
    Um = _legendre_adjoint(plan, K, plan.lam_m2, plan.lam_p2)
    mpos = jnp.concatenate([jnp.zeros((1,)), jnp.ones((plan.mmax,))]).astype(plan.rdtype)
    Um = Um * mpos
    eps = jnp.concatenate([jnp.ones((1,)), 2.0 * jnp.ones((plan.mmax,))]).astype(plan.rdtype)
    Eh = -(Up + Um) / eps
    Bh = 1j * (Up - Um) / eps
    return Eh, Bh


def alm2map_teb(plan: SHTPlan, alm: jax.Array) -> jax.Array:
    """(..., 3, nl, nm) [T,E,B] alms -> (..., 3, npix) [T,Q,U] maps.

    The polarized Y of the reference (comm_map_mod.f90:437-455 handles all
    Stokes in one libsharp job; here T uses spin-0, (E,B) spin-2)."""
    T = alm2map(plan, alm[..., 0, :, :])
    Q, U = alm2map_spin2(plan, alm[..., 1, :, :], alm[..., 2, :, :])
    return jnp.stack([T, Q, U], axis=-2)


def alm2map_teb_adjoint(plan: SHTPlan, maps: jax.Array) -> jax.Array:
    """Adjoint of alm2map_teb: (..., 3, npix) -> (..., 3, nl, nm)."""
    T = alm2map_adjoint(plan, maps[..., 0, :])
    E, B = alm2map_spin2_adjoint(plan, maps[..., 1, :], maps[..., 2, :])
    return jnp.stack([T, E, B], axis=-3)


def map2alm_teb(plan: SHTPlan, maps: jax.Array) -> jax.Array:
    """Quadrature analysis for [T,Q,U] -> [T,E,B] (YtW, polarized)."""
    T = map2alm(plan, maps[..., 0, :])
    E, B = map2alm_spin2(plan, maps[..., 1, :], maps[..., 2, :])
    return jnp.stack([T, E, B], axis=-3)


def map2alm_spin2(plan: SHTPlan, Q: jax.Array, U: jax.Array):
    """Quadrature-weighted spin-2 analysis (YtW for polarization)."""
    w = plan.ring_weight
    # metric adjoint with quadrature weights gives eps-correct analysis,
    # but eps division must be replaced: quadrature analysis integrates
    # against conj(sY), which the eps-metric adjoint already implements.
    P = (Q + 1j * U).astype(plan.cdtype)
    fpad = _pad_to_rings(plan, P) * w[:, None]
    Gp = ring_analysis(plan, fpad)
    K = ring_analysis(plan, jnp.conj(fpad))
    # (+2)a_lm and (-2)a_lm quadrature estimates (valid for all m >= 0):
    a_p2 = _legendre_adjoint(plan, Gp, plan.lam_p2, plan.lam_m2)
    a_m2 = _legendre_adjoint(plan, K, plan.lam_m2, plan.lam_p2)
    Eh = -(a_p2 + a_m2) / 2.0
    Bh = 1j * (a_p2 - a_m2) / 2.0
    return Eh, Bh
