"""Mixing-matrix evaluation: component SEDs band-integrated per band.

TPU-native counterpart of the reference's mixing-matrix machinery
(``updateDiffuseMixmat`` comm_diffuse_comp_mod.f90:1662, the ``comm_F_int``
lookup hierarchy comm_F_int_{0D,1D,2D}_mod.f90, and the per-band ``comm_F``
cache comm_F_mod.f90). Instead of precomputed spline tables evaluated in
per-pixel Fortran loops, the band integral is computed directly as a
quadrature contraction inside jit: for component c with spectral parameters
theta (scalars or per-pixel maps),

    F[b, c](theta) = sum_k w_bk * S_c(nu_bk; theta) * unit_c

which XLA vectorizes over pixels. Exact (no interpolation error), and the
theta-derivatives the samplers need come for free via jax.grad.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp

from ..instrument.bandpass import Bandpass
from .seds import SED_NPAR, SED_REGISTRY, thermo_to_rj


@dataclasses.dataclass(frozen=True)
class DiffuseComponent:
    """Static configuration of one diffuse sky component.

    Mirrors the reference's component metadata (comm_comp_mod.f90:37-78 —
    label, type, nu_ref, unit, polarization) minus the runtime state, which
    lives in the sampler's state pytree.
    """
    name: str
    sed: str                 # key into SED_REGISTRY
    nu_ref: float            # reference frequency [Hz]
    polarized: bool = False
    # default spectral parameters (used where theta is not supplied)
    theta0: tuple = ()
    # amplitude unit at nu_ref: 'uK_cmb' (cmb comp) or 'uK_RJ' (foregrounds)
    unit: str = "uK_RJ"

    @property
    def npar(self) -> int:
        return SED_NPAR[self.sed]


def mixing_element(comp: DiffuseComponent, bp: Bandpass, theta=None,
                   delta=0.0, band_index: int | None = None):
    """F[b,c]: band response of unit component amplitude, in band units.

    theta: sequence of spectral parameters (scalars or (npix,) arrays);
    defaults to comp.theta0. Returns scalar or (npix,) array.
    Line components (comp.sed == 'line'): theta holds the per-band line
    ratios (the reference's sampled line ratios, comm_line_comp_mod.f90);
    F is theta[band_index] directly (zero where absent).
    """
    if theta is None:
        theta = comp.theta0
    if comp.sed == "line":
        if band_index is None:
            raise ValueError("line components need band_index")
        ratios = jnp.asarray(theta)
        return ratios[band_index] if band_index < len(theta) else 0.0 * ratios[0]
    nu, w = bp.weights(delta)
    sed_fn = SED_REGISTRY[comp.sed]
    if comp.sed == "cmb":
        vals = sed_fn(nu)
    else:
        th = [jnp.asarray(t)[..., None] if hasattr(t, "shape") and jnp.ndim(t) > 0
              else t for t in theta]
        vals = sed_fn(nu, comp.nu_ref, *th)
    # component amplitude unit -> uK_RJ at nu_ref
    if comp.unit == "uK_RJ" or comp.sed == "cmb":
        unit_fac = 1.0
    elif comp.unit == "uK_cmb":
        unit_fac = thermo_to_rj(comp.nu_ref)
    else:
        raise ValueError(f"unsupported component unit {comp.unit}")
    return jnp.sum(w * vals, axis=-1) * unit_fac


def mixing_matrix(comps: Sequence[DiffuseComponent], bps: Sequence[Bandpass],
                  thetas=None, deltas=None):
    """Full mixing matrix F[b, c] (scalars -> (nband, ncomp) array).

    thetas: per-component parameter tuples (None -> defaults).
    deltas: per-band bandpass shifts (None -> 0).
    Only valid when all thetas are scalars; per-pixel thetas should call
    mixing_element per component (shapes differ).
    """
    rows = []
    for b, bp in enumerate(bps):
        d = 0.0 if deltas is None else deltas[b]
        row = [mixing_element(c, bp, None if thetas is None else thetas[i],
                              d, band_index=b)
               for i, c in enumerate(comps)]
        rows.append(jnp.stack(row))
    return jnp.stack(rows)
