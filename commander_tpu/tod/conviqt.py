"""Sidelobe convolution (conviqt): beam x sky over all rotations.

TPU-native counterpart of ``comm_conviqt_mod.f90`` (precompute_sky :207,
interp :159): the convolved signal for a beam b rotated to Euler angles
(phi, theta, psi) is

  s(phi, theta, psi) = sum_{m'} e^{i m' psi} f_{m'}(theta, phi),
  f_{m'}(theta, phi) = sum_{lm} a_lm conj(b_{l m'}) d^l_{m,m'}(theta) e^{im phi}

i.e. one GENERALIZED-SPIN synthesis per beam azimuthal mode m' — computed
here with the same batched Legendre-einsum + Bluestein ring machinery as
the science SHTs (sphere.sht), with Wigner-d tables at mp = +-m'. The TOD
lookup is then a pixel gather + cos/sin(m' psi) combination, replacing the
reference's (pix, psi)-grid interpolation tables in node-shared memory.

Real sky + real beam  =>  f_{-m'} = conj(f_{m'}), so only m' >= 0 maps are
stored: s_t = f_0(p_t) + 2 sum_{m'>0} [Re f cos(m' psi) - Im f sin(m' psi)].
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..sphere import sht
from ..sphere.sht import SHTPlan, _gather_pix, _legendre_synth, ring_synthesis
from ..sphere.wigner import _theta_halves, wigner_d_table


@functools.lru_cache(maxsize=None)
def conviqt_tables(nside: int, lmax: int, mmax_beam: int, dtype: str = "float64"):
    """Wigner-d tables d^l_{m,+-m'} for m'=0..mmax_beam on northern rings.

    Returns list over m' of (d_pos, d_neg) jnp arrays (nh, nl, nm)."""
    cth2, sth2 = _theta_halves(nside)
    out = []
    for mp in range(mmax_beam + 1):
        dp = wigner_d_table(lmax, lmax, mp, cth2, sth2)
        dn = dp if mp == 0 else wigner_d_table(lmax, lmax, -mp, cth2, sth2)
        nptype = np.float64 if dtype == "float64" else np.float32
        out.append((jnp.asarray(dp.astype(nptype)),
                    jnp.asarray(dn.astype(nptype))))
    return out


def conviqt_precompute(plan: SHTPlan, tables, alm: jnp.ndarray,
                       blm: jnp.ndarray):
    """f_{m'} maps for m' = 0..M.

    alm: (nl, nm) sky; blm: (nl, M+1) beam coefficients b_{l m'} (m' >= 0).
    Returns (M+1, 2, npix): [Re f_{m'}, Im f_{m'}] per beam mode.
    Reference: precompute_sky (comm_conviqt_mod.f90:207)."""
    maps = []
    for mp, (d_pos, d_neg) in enumerate(tables):
        c_pos = alm * jnp.conj(blm[:, mp])[:, None]          # (nl, nm)
        # positive-m coefficient stack through the d^l_{m,+mp} table
        Fp = _legendre_synth(plan, c_pos.astype(plan.cdtype), d_pos, d_neg)
        # negative-m part: C_{-m} = (-1)^{mp} conj(a_lm) conj(b) d^l_{m,-mp}
        c_neg = jnp.conj(alm) * jnp.conj(blm[:, mp])[:, None] * (-1.0) ** mp
        Fn = _legendre_synth(plan, c_neg.astype(plan.cdtype), d_neg, d_pos)
        mpos = jnp.concatenate([jnp.zeros((1,)), jnp.ones((plan.mmax,))]
                               ).astype(plan.rdtype)
        f = ring_synthesis(plan, Fp) \
            + jnp.conj(ring_synthesis(plan, jnp.conj(Fn) * mpos))
        re = _gather_pix(plan, f.real.astype(plan.rdtype))
        im = _gather_pix(plan, f.imag.astype(plan.rdtype))
        maps.append(jnp.stack([re, im]))
    return jnp.stack(maps)                                   # (M+1, 2, npix)


def conviqt_interp(fmaps: jnp.ndarray, pix: jnp.ndarray, psi: jnp.ndarray):
    """TOD-domain sidelobe signal: gather + azimuthal Fourier sum.

    fmaps: (M+1, 2, npix); pix/psi: (..., Nt). Reference: interp
    (comm_conviqt_mod.f90:159)."""
    M = fmaps.shape[0] - 1
    s = fmaps[0, 0][pix]
    for mp in range(1, M + 1):
        re = fmaps[mp, 0][pix]
        im = fmaps[mp, 1][pix]
        s = s + 2.0 * (re * jnp.cos(mp * psi) - im * jnp.sin(mp * psi))
    return s


def degrade_table(nside_hi: int, nside_lo: int) -> np.ndarray:
    """(npix_hi,) int32 RING pixel at nside_lo containing each nside_hi
    pixel center — the reference's ind2sl mapping (comm_tod_mod.f90:312)."""
    from ..sphere import healpix
    if nside_hi == nside_lo:
        return np.arange(12 * nside_hi * nside_hi, dtype=np.int32)
    vec = np.asarray(healpix.pix2vec_ring(nside_hi))
    th = np.arccos(np.clip(vec[:, 2], -1.0, 1.0))
    ph = np.mod(np.arctan2(vec[:, 1], vec[:, 0]), 2.0 * np.pi)
    return np.asarray(healpix.ang2pix_ring(nside_lo, th, ph), np.int32)


def build_sl_fmaps(plan: SHTPlan, tables, alm_T: jnp.ndarray,
                   blms: jnp.ndarray):
    """Per-detector conviqt f-maps from the current band sky.

    alm_T: (nl, nm) band temperature alm at the sidelobe plan's lmax;
    blms: (Nd, nl, M+1) per-det sidelobe beam alms. Returns
    (Nd, M+1, 2, npix_sl). The per-iteration rebuild of the reference's
    slconv operators (comm_tod_LFI_mod.f90:431-446)."""
    return jnp.stack([conviqt_precompute(plan, tables, alm_T, blms[d])
                      for d in range(blms.shape[0])])
