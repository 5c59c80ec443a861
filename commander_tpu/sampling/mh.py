"""Metropolis-Hastings moves: joint alm-C_ell rescaling and bandpass shifts.

TPU-native counterparts of:
  * sample_joint_alm_Cl (comm_signal_mod.f90:554-680) — the resampling-mode
    move that proposes C_ell' per bin and deterministically rescales the
    component alms by sqrt(C'/C), accepting on the data likelihood (the
    prior terms cancel by construction of the proposal).
  * sample_bp (comm_tod_bandpass_mod.f90:28) — Metropolis accept/reject of
    proposed bandpass shifts Delta using the chi^2 of the band residuals
    (evaluated here at map level; the TOD-level variant plugs the TOD
    chi^2 into the same accept step).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..model.cl import bin_index_table, cl_eval
from ..model.mixing import DiffuseComponent, mixing_matrix
from .amplitude import AmplitudeSystem, apply_sqrtS
from .chisq import compute_chisq


def sample_joint_alm_cl(key, cfg, sys: AmplitudeSystem, plan, a, cl_bins,
                        comp: int, step_size: float = 0.05):
    """One joint (alm, Cl) MH move for one component.

    Proposal: per-bin log-normal step Cl' = Cl * exp(eps), alms rescaled by
    sqrt(Cl'/Cl) per ell. Under this deterministic rescaling the Gaussian
    prior P(a|Cl) is invariant, so the Metropolis ratio is the data
    likelihood ratio alone (the reference's construction, :600-660).
    Returns (a', cl_bins', accepted).
    """
    k1, k2 = jax.random.split(key)
    eps = step_size * jax.random.normal(k1, cl_bins.shape[-2:], a.real.dtype)
    cl_new_bins = cl_bins.at[comp].multiply(jnp.exp(eps))

    idx = jnp.asarray(bin_index_table(cfg))
    ratio_l = jnp.exp(eps)[..., idx]                     # (S, nl)
    scale = jnp.sqrt(ratio_l)
    a_new = a.at[comp].multiply(scale[..., :, None])

    chi2_old, _, _ = compute_chisq(sys, plan, a)
    chi2_new, _, _ = compute_chisq(sys, plan, a_new)
    # log-normal proposal asymmetry in Cl space: q(Cl|Cl')/q(Cl'|Cl) = e^eps
    ln_r = -0.5 * (chi2_new - chi2_old) + jnp.sum(eps)
    accept = jnp.log(jax.random.uniform(k2, (), a.real.dtype)) < ln_r
    a_out = jnp.where(accept, a_new, a)
    cl_out = jnp.where(accept, cl_new_bins, cl_bins)
    return a_out, cl_out, accept


def sample_bandpass_shift(key, comps: Sequence[DiffuseComponent],
                          bps, thetas, sys: AmplitudeSystem, plan, a,
                          deltas, band: int, step_hz: float = 0.1e9,
                          prior_std_hz: float = 1.0e9):
    """Metropolis move on one band's bandpass shift Delta (additive_shift
    model, comm_bp_mod.f90:194-204 + accept step comm_tod_bandpass:28).

    deltas: (B,) current shifts [Hz]. Rebuilds the band's mixing column at
    the proposed shift inside the accept ratio. Returns (deltas', F',
    accepted)."""
    import dataclasses as dc

    k1, k2 = jax.random.split(key)
    prop = deltas[band] + step_hz * jax.random.normal(k1, (), sys.data.dtype)

    def mix_with(delta_b):
        ds = [float(deltas[b]) if b != band else delta_b
              for b in range(len(bps))]
        F = mixing_matrix(comps, bps, thetas=thetas, deltas=ds)
        if F.ndim == 2:
            F = F[..., None].repeat(sys.F.shape[-1], axis=-1)
        return jnp.asarray(F, sys.data.dtype)

    F_old = sys.F
    F_new = mix_with(prop)
    chi2_old, _, _ = compute_chisq(sys, plan, a)
    chi2_new, _, _ = compute_chisq(dc.replace(sys, F=F_new), plan, a)
    lnp_old = -0.5 * (deltas[band] / prior_std_hz) ** 2
    lnp_new = -0.5 * (prop / prior_std_hz) ** 2
    ln_r = -0.5 * (chi2_new - chi2_old) + (lnp_new - lnp_old)
    accept = jnp.log(jax.random.uniform(k2, (), sys.data.dtype)) < ln_r
    deltas = deltas.at[band].set(jnp.where(accept, prop, deltas[band]))
    F_out = jnp.where(accept, F_new, F_old)
    return deltas, F_out, accept


def accept_bandpass_tod(key, chi2_cur, chi2_prop, delta_cur, delta_prop,
                        prior_std_hz: float = 1.0e9):
    """TOD-chi^2 Metropolis accept for a bandpass-shift proposal.

    The reference's sample_bp (comm_tod_bandpass_mod.f90:28-82): the chi^2
    of each proposal is accumulated over the band's scans during TOD
    processing (here: tod.process.tod_chisq at the current and the proposed
    shift), the accept step compares them with a Gaussian prior on Delta.
    Returns (delta_new, accepted)."""
    lnp = -0.5 * ((delta_prop / prior_std_hz) ** 2
                  - (delta_cur / prior_std_hz) ** 2)
    ln_r = -0.5 * (chi2_prop - chi2_cur) + lnp
    accept = jnp.log(jax.random.uniform(key, (), jnp.result_type(float))) \
        < ln_r
    return jnp.where(accept, delta_prop, delta_cur), accept
