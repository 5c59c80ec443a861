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
import os
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
                 "otf_p2", "otf_m2",
                 "belt_phase", "cap_sA", "cap_sVh", "cap_sB", "cap_aA",
                 "cap_aVh", "cap_aB"],
    meta_fields=["nside", "lmax", "mmax", "rdtype", "cdtype", "Ls", "La",
                 "cap_groups", "split", "mat_prec"],
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
    # spin-2 OTF recurrences (tables=False polarized plans):
    # otf_p2 ~ lam_p2 (d^l_{m,-2}), otf_m2 ~ lam_m2 (d^l_{m,+2})
    otf_p2: object = None
    otf_m2: object = None
    # --- belt/cap split ring stage (the fast local path) ---
    # The 2*nside+1 equatorial-belt rings all have nphi = 4*nside, so their
    # Fourier stage is ONE power-of-2 (i)FFT of length 4*nside plus a phase
    # twist; only the 2*(nside-1) polar-cap rings need Bluestein, with a
    # shorter (power-of-2) convolution length. The whole-sphere Bluestein
    # tables above are kept for the ring-sharded multi-chip path
    # (parallel/sht_shard.py), which slices rings by contiguous blocks.
    split: bool = False
    # Matmul precision for the Legendre contractions. XLA's DEFAULT TPU
    # matmul runs one bf16 pass (measured 2e-3 relative error on the
    # synthesized map); "float32" recovers full f32 accuracy (3e-7) for
    # ~20% extra roundtrip cost — the right default for a sampler whose CG
    # and chi^2 depend on transform fidelity. Pass precision="default" to
    # get_plan for throughput experiments.
    mat_prec: str = "float32"
    # cap rings grouped by required convolution length: north ring i+1 and
    # its south mirror share (nphi, phi0), so each group's tables are
    # (grows, .) broadcast over a leading north/south plane axis of size 2.
    # cap_groups: ((i0, i1, Ls_k, La_k), ...) — rows i0..i1-1 (0-based,
    # ascending i), power-of-2 lengths Ls_k/La_k >= mmax + 4*i1.
    cap_groups: tuple = ()
    belt_phase: jax.Array | None = None   # (nbelt, nm) e^{i m phi0_r}
    cap_sA: tuple = ()                    # per group (grows, nm)
    cap_sVh: tuple = ()                   # per group (grows, Ls_k)
    cap_sB: tuple = ()                    # per group (grows, 4*i1)
    cap_aA: tuple = ()                    # per group (grows, 4*i1)
    cap_aVh: tuple = ()                   # per group (grows, La_k)
    cap_aB: tuple = ()                    # per group (grows, nm)

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


def _chirp_powers(n: np.ndarray, k2: np.ndarray) -> np.ndarray:
    """exp(i*pi*k2/n) computed with k2 reduced mod 2n in exact ints."""
    red = np.mod(k2, 2 * n)
    return np.exp(1j * np.pi * red / n)


@functools.lru_cache(maxsize=None)
def get_plan(nside: int, lmax: int, mmax: int | None = None, spin2: bool = False,
             dtype: str = "float64", weights: str = "ring",
             tables: bool | None = None,
             legendre_backend: str = "xla",
             otf_chunk: int = 64,
             precision: str = "float32") -> SHTPlan:
    """Build (host) and cache the SHT plan for one resolution.

    tables=False skips the precomputed Legendre tables (lam0/lam_p2/lam_m2
    are None) — used by the on-the-fly transforms (sht_otf) that only need
    the ring/Bluestein machinery of the plan. legendre_backend selects the
    tableless Legendre stage: 'xla' (chunked scan) or 'pallas' (fused
    kernel; interpret-mode automatically on CPU).

    tables=None (default) resolves automatically: tables when the Legendre
    table stays under 2 GiB, else the fused Pallas OTF path. Tables above
    2^31 bytes are additionally unsafe on the TPU runtime: a CG
    lax.fori_loop with such a table live MISCOMPUTES (monotonic residual
    divergence; BASELINE.md round 3) even though single transforms,
    operator symmetry, AND the same iteration chunked 5-per-jit are all
    correct — an XLA/runtime long-loop + big-constant interaction. An
    explicit tables=True request above the limit therefore raises unless
    COMMANDER_TPU_ALLOW_BIG_TABLES=1 (safe if the caller chunks its
    loops)."""
    if mmax is None:
        mmax = lmax
    table_bytes = (2 * nside) * (lmax + 1) * (mmax + 1) \
        * np.dtype(dtype).itemsize * (3 if spin2 else 1)
    if tables is None:
        tables = table_bytes < 2 ** 31
        if not tables and legendre_backend == "xla":
            # auto-routed OTF plans keep the XLA chunked-scan backend:
            # it executes correctly on ANY backend (the fused Pallas
            # kernel would run in interpret mode on CPU — orders of
            # magnitude slower — and host-side model building runs on
            # CPU even in accelerator sessions). Performance-critical
            # device payloads request legendre_backend="pallas"
            # explicitly (run.py tpu_mode, bench.py, _prof_* drivers).
            pass
    elif tables and table_bytes >= 2 ** 31 \
            and not os.environ.get("COMMANDER_TPU_ALLOW_BIG_TABLES"):
        raise ValueError(
            f"Legendre table would be {table_bytes / 2**30:.1f} GiB "
            f">= 2 GiB: >2^31-byte tables miscompute on the TPU runtime "
            f"(BASELINE.md round 3). Use tables=None/False (OTF path) or "
            f"set COMMANDER_TPU_ALLOW_BIG_TABLES=1.")
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
    belt_phase = None
    cap_groups = ()
    cap_sA, cap_sVh, cap_sB = [], [], []
    cap_aA, cap_aVh, cap_aB = [], [], []
    if split:
        nbelt = 2 * nside + 1
        # belt: e^{i m phi0_r} for rings nc .. nc+nbelt-1
        belt_phase = np.exp(1j * g.phi0[nc: nc + nbelt, None] * m)
        # caps: Bluestein with power-of-2 lengths, rings grouped by the
        # smallest length satisfying L >= nm + nphi - 1 = mmax + 4*i (XLA
        # TPU FFT strongly prefers powers of two, and small polar rings
        # need far shorter convolutions than large ones). North ring i+1
        # and its south mirror share (nphi, phi0): one table row serves
        # both, broadcast over a leading plane axis of size 2.
        groups = []
        i0 = 0
        while i0 < nc:
            L = 1 << int(np.ceil(np.log2(mmax + 4 * (i0 + 1))))
            i1 = min(nc, (L - mmax) // 4)
            gp = 4 * i1                     # widest ring in group
            rows = np.arange(i0, i1)
            nphi_c = (4 * (rows + 1)).astype(np.int64)[:, None]
            phi0_c = np.pi / nphi_c
            pc = np.arange(gp, dtype=np.int64)[None, :]
            groups.append((i0, i1, L, L))
            cap_sA.append(np.exp(1j * phi0_c * m) * _chirp_powers(nphi_c, m * m))
            cap_sB.append(np.where(pc < nphi_c,
                                   _chirp_powers(nphi_c, pc * pc), 0.0))
            jc = np.arange(mmax + gp, dtype=np.int64)[None, :] - mmax
            vc = _chirp_powers(nphi_c, -(jc * jc))
            vcpad = np.zeros((len(rows), L), dtype=np.complex128)
            vcpad[:, : mmax + gp] = vc
            cap_sVh.append(np.fft.fft(vcpad, axis=-1))
            cap_aA.append(np.where(pc < nphi_c,
                                   _chirp_powers(nphi_c, -(pc * pc)), 0.0))
            cap_aB.append(np.exp(-1j * phi0_c * m)
                          * _chirp_powers(nphi_c, -(m * m)))
            jca = np.arange(gp + mmax, dtype=np.int64)[None, :] - (gp - 1)
            vca = _chirp_powers(nphi_c, jca * jca)
            vcapad = np.zeros((len(rows), L), dtype=np.complex128)
            vcapad[:, : gp + mmax] = vca
            cap_aVh.append(np.fft.fft(vcapad, axis=-1))
            i0 = i1
        cap_groups = tuple(groups)

    # cast on host first: the TPU backend cannot ingest float64 buffers,
    # and device-side convert_element_type would require an f64 H2D.
    otf0 = None
    otf_p2 = otf_m2 = None
    if not tables:
        from .sht_otf import legendre_otf
        otf0 = legendre_otf(nside, lmax, 0, dtype=dtype,
                            chunk=min(otf_chunk, lmax + 1), mmax=mmax,
                            backend=legendre_backend)
        if spin2:
            # naming mirrors the tables: lam_p2 holds d^l_{m,-2}
            # (spin_lambda_north, wigner.py:276-296)
            otf_p2 = legendre_otf(nside, lmax, -2, dtype=dtype,
                                  chunk=min(otf_chunk, lmax + 1),
                                  mmax=mmax, backend=legendre_backend)
            otf_m2 = legendre_otf(nside, lmax, 2, dtype=dtype,
                                  chunk=min(otf_chunk, lmax + 1),
                                  mmax=mmax, backend=legendre_backend)

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
        otf0=otf0, otf_p2=otf_p2, otf_m2=otf_m2,
        split=split, cap_groups=cap_groups, mat_prec=precision,
        belt_phase=devc(belt_phase) if split else None,
        cap_sA=tuple(devc(x) for x in cap_sA),
        cap_sVh=tuple(devc(x) for x in cap_sVh),
        cap_sB=tuple(devc(x) for x in cap_sB),
        cap_aA=tuple(devc(x) for x in cap_aA),
        cap_aVh=tuple(devc(x) for x in cap_aVh),
        cap_aB=tuple(devc(x) for x in cap_aB),
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
    # caps: grouped short Bluesteins over (north, south-flipped) planes
    Gc = jnp.stack([G[..., :nc, :],
                    jnp.flip(G[..., nc + nbelt:, :], axis=-2)], axis=-3)
    outs = []
    for k, (i0, i1, Ls_k, _) in enumerate(plan.cap_groups):
        gp = 4 * i1
        u = Gc[..., :, i0:i1, :] * plan.cap_sA[k]
        U = _fft_flat(u, Ls_k)
        w = _fft_flat(U * plan.cap_sVh[k], Ls_k, inverse=True)
        w = jax.lax.slice_in_dim(w, plan.mmax, plan.mmax + gp, axis=-1)
        fk = w * plan.cap_sB[k]
        outs.append(jnp.pad(fk, [(0, 0)] * (fk.ndim - 1) + [(0, fourN - gp)]))
    fc = jnp.concatenate(outs, axis=-2)
    return jnp.concatenate([fc[..., 0, :, :], fb,
                            jnp.flip(fc[..., 1, :, :], axis=-2)], axis=-2)


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
    # caps: grouped short Bluesteins over (north, south-flipped) planes
    fcap = jnp.stack([f[..., :nc, :],
                      jnp.flip(f[..., nc + nbelt:, :], axis=-2)], axis=-3)
    outs = []
    for k, (i0, i1, _, La_k) in enumerate(plan.cap_groups):
        gp = 4 * i1
        u = fcap[..., :, i0:i1, :gp] * plan.cap_aA[k]
        U = _fft_flat(u, La_k)
        w = _fft_flat(U * plan.cap_aVh[k], La_k, inverse=True)
        w = jax.lax.slice_in_dim(w, gp - 1, gp - 1 + nm, axis=-1)
        outs.append(w * plan.cap_aB[k])
    Fc = jnp.concatenate(outs, axis=-2)
    return jnp.concatenate([Fc[..., 0, :, :], Fb,
                            jnp.flip(Fc[..., 1, :, :], axis=-2)], axis=-2)


def _cap_rows(nside: int):
    """Static (offset, nphi) per cap ring: north row i (ring i+1) and south
    row j (ring 3*nside+j). Analytic HEALPix layout — no tables needed."""
    N, nc = nside, nside - 1
    npix = 12 * N * N
    north = [(2 * i * (i + 1), 4 * (i + 1)) for i in range(nc)]
    south = [(npix - 2 * (N - 1 - j) * (N - j), 4 * (N - 1 - j))
             for j in range(nc)]
    return north, south


def _pad_to_rings(plan: SHTPlan, maps: jax.Array) -> jax.Array:
    """(..., npix) -> (..., nring, pmax) with zeros in invalid slots.

    Split path: the belt block is a pure reshape (contiguous in RING pixel
    order); each cap ring is one static slice + padded row write — unrolled
    dense copies, which the TPU executes far faster than a pixel gather."""
    if plan.split:
        nc, fourN = plan.ncap, plan.pmax
        lead = maps.shape[:-1]
        b0 = 2 * plan.nside * nc
        belt = jax.lax.slice_in_dim(
            maps, b0, b0 + plan.nbelt * fourN, axis=-1
        ).reshape(*lead, plan.nbelt, fourN)
        north, south = _cap_rows(plan.nside)
        cn = jnp.zeros((*lead, nc, fourN), maps.dtype)
        cs = jnp.zeros((*lead, nc, fourN), maps.dtype)
        for i, (o, n) in enumerate(north):
            cn = cn.at[..., i, :n].set(
                jax.lax.slice_in_dim(maps, o, o + n, axis=-1))
        for j, (o, n) in enumerate(south):
            cs = cs.at[..., j, :n].set(
                jax.lax.slice_in_dim(maps, o, o + n, axis=-1))
        return jnp.concatenate([cn, belt, cs], axis=-2)
    flat = maps[..., plan.pad_src] * plan.pad_valid
    return flat.reshape(*maps.shape[:-1], plan.nring, plan.pmax)


def _gather_pix(plan: SHTPlan, fpad: jax.Array) -> jax.Array:
    """(..., nring, pmax) -> (..., npix)."""
    if plan.split:
        nc, nbelt, fourN = plan.ncap, plan.nbelt, plan.pmax
        lead = fpad.shape[:-2]
        north, south = _cap_rows(plan.nside)
        parts = [fpad[..., i, : n] for i, (_, n) in enumerate(north)]
        parts.append(fpad[..., nc: nc + nbelt, :].reshape(*lead, nbelt * fourN))
        parts += [fpad[..., nc + nbelt + j, : n]
                  for j, (_, n) in enumerate(south)]
        return jnp.concatenate(parts, axis=-1)
    return fpad.reshape(*fpad.shape[:-2], -1)[..., plan.pix_idx]


# ---------------------------------------------------------------------------
# Legendre stage
# ---------------------------------------------------------------------------

def _recomplex(F4: jax.Array):
    """(..., 2k, r, m) real stack -> k complex arrays (..., r, m)."""
    return [F4[..., 2 * i, :, :] + 1j * F4[..., 2 * i + 1, :, :]
            for i in range(F4.shape[-3] // 2)]


def _legendre_synth(plan: SHTPlan, alm: jax.Array, lam: jax.Array,
                    lam_south: jax.Array) -> jax.Array:
    """alm (..., nl, nm) complex -> F (..., nring, nm) complex.

    North rings use table `lam`; south rings use `lam_south` with the parity
    sign folded into the alm (lambda(pi-theta) = (-1)^(l+m) lambda'(theta)).

    The contraction is performed in REAL arithmetic with (re, im) — and,
    when north/south share a table, the parity-folded copies — stacked into
    the matmul M-dimension: one pass over the (large, HBM-resident)
    Legendre table instead of two complex-promoted passes.
    """
    alm = alm * plan.lmmask
    ap = alm * plan.parity
    if lam is lam_south:
        st = jnp.stack([alm.real, alm.imag, ap.real, ap.imag], axis=-3)
        Fn, Fs = _recomplex(jnp.einsum("...klm,rlm->...krm", st, lam, precision=plan.mat_prec))
    else:
        stn = jnp.stack([alm.real, alm.imag], axis=-3)
        sts = jnp.stack([ap.real, ap.imag], axis=-3)
        Fn, = _recomplex(jnp.einsum("...klm,rlm->...krm", stn, lam, precision=plan.mat_prec))
        Fs, = _recomplex(jnp.einsum("...klm,rlm->...krm", sts, lam_south, precision=plan.mat_prec))
    south = jnp.flip(Fs[..., : plan.nh - 1, :], axis=-2)
    return jnp.concatenate([Fn, south], axis=-2)


def _south_rows(plan: SHTPlan, F: jax.Array) -> jax.Array:
    """South-ring rows of F flipped to theta_0..theta_{nh-2} order and
    zero-padded to nh rows (so they contract against the same nh-row
    northern table in one fused matmul)."""
    Fs = jnp.flip(F[..., plan.nh:, :], axis=-2)
    return jnp.pad(Fs, [(0, 0)] * (Fs.ndim - 2) + [(0, 1), (0, 0)])


def _legendre_adjoint(plan: SHTPlan, F: jax.Array, lam: jax.Array,
                      lam_south: jax.Array) -> jax.Array:
    """F (..., nring, nm) complex -> alm (..., nl, nm) complex (transpose).

    Same real-stacked single-table-pass strategy as _legendre_synth."""
    Fn = F[..., : plan.nh, :]
    if lam is lam_south:
        Fs = _south_rows(plan, F)
        st = jnp.stack([Fn.real, Fn.imag, Fs.real, Fs.imag], axis=-3)
        an, as_ = _recomplex(jnp.einsum("...krm,rlm->...klm", st, lam, precision=plan.mat_prec))
        a = an + as_ * plan.parity
    else:
        Fs = jnp.flip(F[..., plan.nh:, :], axis=-2)
        stn = jnp.stack([Fn.real, Fn.imag], axis=-3)
        sts = jnp.stack([Fs.real, Fs.imag], axis=-3)
        an, = _recomplex(jnp.einsum("...krm,rlm->...klm", stn, lam, precision=plan.mat_prec))
        as_, = _recomplex(jnp.einsum("...krm,rlm->...klm", sts,
                                     lam_south[: plan.nh - 1],
                                     precision=plan.mat_prec))
        a = an + as_ * plan.parity
    return a * plan.lmmask


def _legendre_synth_spin2(plan: SHTPlan, cp: jax.Array, cm: jax.Array):
    """Fused spin-2 Legendre synthesis: one pass over each of the two
    spin-2 tables serves both streams (north of one, parity-folded south
    of the other). Returns (Sp, Sm) as _legendre_synth would."""
    cp = cp * plan.lmmask
    cm = cm * plan.lmmask
    cpp = cp * plan.parity
    cmp_ = cm * plan.parity
    st_p2 = jnp.stack([cp.real, cp.imag, cmp_.real, cmp_.imag], axis=-3)
    st_m2 = jnp.stack([cm.real, cm.imag, cpp.real, cpp.imag], axis=-3)
    Sp_n, Sm_s = _recomplex(jnp.einsum("...klm,rlm->...krm", st_p2, plan.lam_p2, precision=plan.mat_prec))
    Sm_n, Sp_s = _recomplex(jnp.einsum("...klm,rlm->...krm", st_m2, plan.lam_m2, precision=plan.mat_prec))
    Sp = jnp.concatenate([Sp_n, jnp.flip(Sp_s[..., : plan.nh - 1, :], axis=-2)],
                         axis=-2)
    Sm = jnp.concatenate([Sm_n, jnp.flip(Sm_s[..., : plan.nh - 1, :], axis=-2)],
                         axis=-2)
    return Sp, Sm


def _legendre_adjoint_spin2(plan: SHTPlan, Gp: jax.Array, K: jax.Array):
    """Fused spin-2 Legendre adjoint: (Up, Um) = (adj(Gp; p2, m2),
    adj(K; m2, p2)) with one pass over each table."""
    Gp_n, Gp_s = Gp[..., : plan.nh, :], _south_rows(plan, Gp)
    K_n, K_s = K[..., : plan.nh, :], _south_rows(plan, K)
    st_p2 = jnp.stack([Gp_n.real, Gp_n.imag, K_s.real, K_s.imag], axis=-3)
    st_m2 = jnp.stack([K_n.real, K_n.imag, Gp_s.real, Gp_s.imag], axis=-3)
    Up_n, Um_s = _recomplex(jnp.einsum("...krm,rlm->...klm", st_p2, plan.lam_p2, precision=plan.mat_prec))
    Um_n, Up_s = _recomplex(jnp.einsum("...krm,rlm->...klm", st_m2, plan.lam_m2, precision=plan.mat_prec))
    Up = (Up_n + Up_s * plan.parity) * plan.lmmask
    Um = (Um_n + Um_s * plan.parity) * plan.lmmask
    return Up, Um


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


def _legendre_synth_spin2_otf(plan: SHTPlan, cp: jax.Array,
                              cm: jax.Array):
    """OTF (tableless) twin of _legendre_synth_spin2: the parity-folded
    south streams of the spin-2 kernels come out of the OPPOSITE-spin
    recurrence, exactly as the table path pairs lam_p2/lam_m2 through
    plan.parity (the OTF kernels fold (-1)^(l+m) into their F_s)."""
    from .sht_otf import synth_legendre_otf

    cp = (cp * plan.lmmask).astype(plan.cdtype)
    cm = (cm * plan.lmmask).astype(plan.cdtype)
    both = jnp.stack([cp, cm], axis=0)           # (2, ..., nl, nm)
    Np2, Sp2 = synth_legendre_otf(plan.otf_p2, None, both, plan.nh)
    Nm2, Sm2 = synth_legendre_otf(plan.otf_m2, None, both, plan.nh)
    Sp_n, Sm_s = Np2[0], Sp2[1]
    Sm_n, Sp_s = Nm2[1], Sm2[0]
    Sp = jnp.concatenate(
        [Sp_n, jnp.flip(Sp_s[..., : plan.nh - 1, :], axis=-2)], axis=-2)
    Sm = jnp.concatenate(
        [Sm_n, jnp.flip(Sm_s[..., : plan.nh - 1, :], axis=-2)], axis=-2)
    return Sp, Sm


def _legendre_adjoint_spin2_otf(plan: SHTPlan, Gp: jax.Array,
                                K: jax.Array):
    """OTF twin of _legendre_adjoint_spin2. Zero-padded batch entries
    separate the north/south contributions that the fused OTF adjoint
    would otherwise sum into one output."""
    from .sht_otf import adjoint_legendre_otf

    nh = plan.nh

    def split(X):
        X_n = X[..., :nh, :]
        X_s = jnp.flip(X[..., nh:, :], axis=-2)
        pad = nh - X_s.shape[-2]
        X_s = jnp.pad(X_s, [(0, 0)] * (X.ndim - 2) + [(0, pad), (0, 0)])
        return X_n, X_s

    Gp_n, Gp_s = split(Gp)
    K_n, K_s = split(K)
    z = jnp.zeros_like(Gp_n)
    A = adjoint_legendre_otf(plan.otf_p2, jnp.stack([Gp_n, z], axis=0),
                             jnp.stack([z, K_s], axis=0))
    B = adjoint_legendre_otf(plan.otf_m2, jnp.stack([K_n, z], axis=0),
                             jnp.stack([z, Gp_s], axis=0))
    Up = (A[0] + B[1]) * plan.lmmask
    Um = (B[0] + A[1]) * plan.lmmask
    return Up, Um


# ---------------------------------------------------------------------------
# Public transforms — spin 2 (polarization)
# ---------------------------------------------------------------------------

def alm2map_spin2(plan: SHTPlan, alm_E: jax.Array, alm_B: jax.Array):
    """(E, B) alms -> (Q, U) maps. HEALPix convention:
    Q + iU = sum_lm [-(E + iB)]_lm (+2)Y_lm  (m summed over both signs).
    """
    assert plan.lam_p2 is not None or plan.otf_p2 is not None, \
        "plan built without spin2=True"
    cp = -(alm_E + 1j * alm_B).astype(plan.cdtype)   # coeff of +2Y
    cm = -(alm_E - 1j * alm_B).astype(plan.cdtype)   # coeff of -2Y
    if plan.lam_p2 is None:
        Sp, Sm = _legendre_synth_spin2_otf(plan, cp, cm)
    else:
        Sp, Sm = _legendre_synth_spin2(plan, cp, cm)
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
    assert plan.lam_p2 is not None or plan.otf_p2 is not None
    P = (Q + 1j * U).astype(plan.cdtype)
    fpad_p = _pad_to_rings(plan, P)
    Gp = ring_analysis(plan, fpad_p)
    K = ring_analysis(plan, jnp.conj(fpad_p))
    if plan.lam_p2 is None:
        Up, Um = _legendre_adjoint_spin2_otf(plan, Gp, K)
    else:
        Up, Um = _legendre_adjoint_spin2(plan, Gp, K)
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
    # stack on a LEADING axis then moveaxis: stacking directly at -2
    # makes XLA:TPU pick an npix-major layout for the (..., 3, npix)
    # result, whose (…,3) minor dims tile to (4,128) — a 170x HBM
    # padding blow-up observed at nside 512 (round-5 shakeout OOM)
    return jnp.moveaxis(jnp.stack([T, Q, U], axis=0), 0, -2)


def alm2map_teb_adjoint(plan: SHTPlan, maps: jax.Array) -> jax.Array:
    """Adjoint of alm2map_teb: (..., 3, npix) -> (..., 3, nl, nm)."""
    T = alm2map_adjoint(plan, maps[..., 0, :])
    E, B = alm2map_spin2_adjoint(plan, maps[..., 1, :], maps[..., 2, :])
    return jnp.moveaxis(jnp.stack([T, E, B], axis=0), 0, -3)


def map2alm_teb(plan: SHTPlan, maps: jax.Array) -> jax.Array:
    """Quadrature analysis for [T,Q,U] -> [T,E,B] (YtW, polarized)."""
    T = map2alm(plan, maps[..., 0, :])
    E, B = map2alm_spin2(plan, maps[..., 1, :], maps[..., 2, :])
    return jnp.moveaxis(jnp.stack([T, E, B], axis=0), 0, -3)


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
    if plan.lam_p2 is None:
        a_p2, a_m2 = _legendre_adjoint_spin2_otf(plan, Gp, K)
    else:
        a_p2, a_m2 = _legendre_adjoint_spin2(plan, Gp, K)
    Eh = -(a_p2 + a_m2) / 2.0
    Bh = 1j * (a_p2 - a_m2) / 2.0
    return Eh, Bh


def flop_count(plan: SHTPlan, spin2: bool = False) -> dict:
    """Estimated FLOPs for one synthesis (alm2map) with this plan — the
    libsharp opcnt introspection the reference reads per execute
    (sharp.f90:91-92,197-198). Returns a dict with per-stage and total
    counts; the adjoint costs the same by symmetry.
    """
    nl = plan.lmax + 1
    nm = plan.mmax + 1
    # Legendre: real einsum over (nh rings x nl x nm), 2 planes (re, im)
    # x 2 hemispheres folded into one pass, 2 flops per MAC
    leg = 2.0 * 2.0 * 2.0 * plan.nh * nl * nm
    if spin2:
        leg *= 2.0                     # two tables (+2, -2)
    # ring stage: belt complex iFFT + grouped cap Bluesteins,
    # 5 N log2 N per complex FFT of length N
    fft = 5.0 * plan.nbelt * plan.pmax * np.log2(plan.pmax)
    for (i0, i1, Ls, _) in plan.cap_groups:
        rows = 2 * (i1 - i0)           # north + south planes
        fft += 2.0 * 5.0 * rows * Ls * np.log2(Ls)   # fft + ifft
    if not plan.cap_groups:            # whole-sphere Bluestein plan
        fft = 2.0 * 5.0 * plan.nring * plan.Ls * np.log2(plan.Ls)
    if spin2:
        fft *= 2.0
    return {"legendre": leg, "ring_fft": fft, "total": leg + fft}
