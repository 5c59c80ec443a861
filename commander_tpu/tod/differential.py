"""Differential-horn (WMAP-style) TOD processing.

TPU-native counterpart of ``comm_tod_WMAP_mod.f90`` (process_WMAP_tod
:142-485): each detector measures the DIFFERENCE of two horns,

  d_t = g [ (1+x_im) s_A(t) - (1-x_im) s_B(t) ] + n_t,
  s_X(t) = T[pix_X] + Q[pix_X] cos 2 psi_X + U[pix_X] sin 2 psi_X

with transmission-imbalance parameters x_im per detector. Mapmaking is no
longer per-pixel separable (each sample couples pixel pairs), so the map
solve is a CG on the normal equations P^T N^-1 P m = P^T N^-1 d with a
diagonal (hit-weight) preconditioner — the reference solves the same
system with its own CG (:380-460); here the operator is two gathers and a
scatter-add per application, fully batched in jit.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.cg import pcg


def project_diff(maps, pixA, psiA, pixB, psiB, x_im, pol: bool):
    """maps (k, npix) -> differential TOD (..., Nt).

    x_im: (..., 1) or scalar imbalance (broadcast to samples)."""
    def horn(pix, psi):
        s = maps[0][pix]
        if pol and maps.shape[0] >= 3:
            s = s + maps[1][pix] * jnp.cos(2 * psi) \
                + maps[2][pix] * jnp.sin(2 * psi)
        return s
    return (1.0 + x_im) * horn(pixA, psiA) - (1.0 - x_im) * horn(pixB, psiB)


def project_diff_T(tod_w, pixA, psiA, pixB, psiB, x_im, npix: int, pol: bool):
    """Adjoint of project_diff: weighted TOD -> map-space accumulation."""
    k = 3 if pol else 1
    out = jnp.zeros((k, npix), tod_w.dtype)

    def scatter(out, pix, psi, coeff):
        w = coeff * tod_w
        out = out.at[0, pix.reshape(-1)].add(w.reshape(-1))
        if pol:
            out = out.at[1, pix.reshape(-1)].add(
                (w * jnp.cos(2 * psi)).reshape(-1))
            out = out.at[2, pix.reshape(-1)].add(
                (w * jnp.sin(2 * psi)).reshape(-1))
        return out

    out = scatter(out, pixA, psiA, (1.0 + x_im))
    out = scatter(out, pixB, psiB, -(1.0 - x_im))
    return out


def solve_diff_map(tod, pixA, psiA, pixB, psiB, x_im, mask, inv_var,
                   npix: int, pol: bool, tol=1e-8, maxiter=150):
    """CG mapmaker for differential data. Returns (maps (k,npix), CGResult,
    hits (npix,)). inv_var: per-(scan,det) white-noise weight."""
    w = mask * inv_var[..., None]

    def apply_A(m):
        s = project_diff(m, pixA, psiA, pixB, psiB, x_im, pol)
        return project_diff_T(s * w, pixA, psiA, pixB, psiB, x_im, npix, pol)

    b = project_diff_T(tod * w, pixA, psiA, pixB, psiB, x_im, npix, pol)
    # diagonal preconditioner: per-pixel accumulated weights per horn
    ones = jnp.ones_like(tod)
    diagT = jnp.zeros((npix,), tod.dtype)
    diagT = diagT.at[pixA.reshape(-1)].add(
        ((1.0 + x_im) ** 2 * w * ones).reshape(-1))
    diagT = diagT.at[pixB.reshape(-1)].add(
        ((1.0 - x_im) ** 2 * w * ones).reshape(-1))
    k = 3 if pol else 1
    diag = jnp.stack([diagT] + [0.5 * diagT] * (k - 1))
    hits = diagT > 0
    M_inv = lambda r: jnp.where(diag > 0, r / jnp.maximum(diag, 1e-30), 0.0)

    res = pcg(apply_A, b, M_inv=M_inv,
              dot=lambda a, c: jnp.sum(a * c), tol=tol, maxiter=maxiter)
    return res.x * hits[None, :], res, hits


def sample_imbalance(key, tod, s_A, s_B, mask, sigma0, prior_std=0.05):
    """Draw x_im | d, sky: with r = d - g(s_A - s_B), model residual slope
    on (s_A + s_B): x_im ~ N(<u, r>/<u, u>, 1/<u,u>), u = g (s_A + s_B)
    (the reference samples x_im in its gain block)."""
    u = s_A + s_B
    w = mask / jnp.maximum(sigma0[..., None] ** 2, 1e-30)
    num = jnp.sum(u * tod * w, (-1,))
    den = jnp.sum(u * u * w, (-1,)) + 1.0 / prior_std**2
    mean = num / jnp.maximum(den, 1e-30)
    std = 1.0 / jnp.sqrt(jnp.maximum(den, 1e-30))
    return mean + std * jax.random.normal(key, mean.shape, tod.dtype)
