"""Residuals and chi-square diagnostics.

TPU-native counterpart of ``comm_chisq_mod.f90``: get_sky_signal (:401),
compute_residual (:196), compute_chisq (:32). All functions operate on the
AmplitudeSystem pytree + component amplitudes and are jit-safe; per-band and
full-sky chi^2 are the runtime self-checks the reference leans on as its de
facto test strategy (SURVEY.md §4.3).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..sphere import sht
from .amplitude import AmplitudeSystem, _project_bands, _synth


def sky_signal(sys: AmplitudeSystem, plan, a, exclude: int | None = None):
    """Per-band model sky maps sum_c B_b F_bc Y a_c -> (B, S, P).

    exclude: optionally leave one component out (for residual-based
    spectral-index sampling, comm_chisq_mod.f90:196 semantics)."""
    if exclude is not None:
        a = a.at[exclude].set(0.0)
    alm_b = _project_bands(sys, plan, a)
    return _synth(plan, alm_b)


def compute_residual(sys: AmplitudeSystem, plan, a, exclude: int | None = None):
    """data - model (optionally excluding one component's signal)."""
    return sys.data - sky_signal(sys, plan, a, exclude=exclude)


def compute_chisq(sys: AmplitudeSystem, plan, a):
    """(chisq_total, chisq_map (B,S,P), ndof) — reference compute_chisq."""
    r = compute_residual(sys, plan, a)
    cmap = jnp.square(r) * sys.inv_rms2
    ndof = jnp.sum(sys.inv_rms2 > 0)
    return jnp.sum(cmap), cmap, ndof
