"""Amplitude prior constraints: CMB mono/dipole projection, md priors.

TPU-native counterpart of ``apply_cmb_dipole_prior``
(comm_cmb_comp_mod.f90:129-163) and the monopole-prior machinery
(COMP_MONOPOLE_PRIOR; applyMonoDipolePrior comm_diffuse_comp_mod.f90:5738):
after each amplitude draw the CMB component's l<=1 modes are constrained —
either zeroed (the dipole is carried by the md components / fiducial
dipole) or pinned to a prior value estimated outside a mask.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def project_out_monodipole(alm, keep_l0=False, keep_l1=False):
    """Zero the l=0 (and l=1) modes of alm[..., l, m] (T row if 3 Stokes).

    Reference: apply_cmb_dipole_prior zeroes the CMB dipole after CG when
    md components own it."""
    a = alm
    if not keep_l0:
        a = a.at[..., 0, :].set(0.0)
    if not keep_l1:
        a = a.at[..., 1, :].set(0.0)
    return a


def masked_monodipole_fit(maps, mask, pix_vec):
    """Best-fit monopole + dipole of a map outside a mask.

    maps: (..., P); mask: (P,) 1=use; pix_vec: (P, 3).
    Returns (coeffs (..., 4), template (..., P)) with basis [1, x, y, z] —
    the estimator behind the reference's monopole priors
    ('<mask file>' mode of COMP_MONOPOLE_PRIOR)."""
    T = jnp.concatenate([jnp.ones((1, pix_vec.shape[0]), maps.dtype),
                         pix_vec.T.astype(maps.dtype)], axis=0)   # (4, P)
    Tw = T * mask
    G = Tw @ T.T                                  # (4, 4)
    b = jnp.einsum("...p,kp->...k", maps * mask, T)
    coeff = jnp.einsum("kl,...l->...k", jnp.linalg.inv(G), b)
    templ = jnp.einsum("...k,kp->...p", coeff, T)
    return coeff, templ


def subtract_masked_monopole(maps, mask, pix_vec, dipole=True):
    """Remove the mono(+di)pole estimated outside the mask from full maps."""
    coeff, _ = masked_monodipole_fit(maps, mask, pix_vec)
    if not dipole:
        coeff = coeff.at[..., 1:].set(0.0)
    T = jnp.concatenate([jnp.ones((1, pix_vec.shape[0]), maps.dtype),
                         pix_vec.T.astype(maps.dtype)], axis=0)
    return maps - jnp.einsum("...k,kp->...p", coeff, T), coeff
