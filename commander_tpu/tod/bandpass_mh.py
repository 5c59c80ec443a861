"""Per-detector bandpass sampling: the reference's ndelta-proposal MH.

Mirrors the commander.f90:274-399 process_TOD proposal flow + sample_bp
(comm_tod_bandpass_mod.f90:28-79):
  * per-detector bandpass shifts delta_d around the band shift, proposed
    as zero-mean relative moves (delta(1:ndet) - mean + delta(0),
    commander.f90:306-317)
  * per-proposal per-detector sky evaluated against the TOD
  * Metropolis sweep over proposals on the summed chi^2

TPU-first redesign: the reference rebuilds the full mixing matrix and
re-synthesizes every per-det sky map per proposal (O(npix) SHT work x
ndelta x ndet). Here the UNIT component maps are synthesized once per
iteration and gathered to the TOD domain once; each proposal is then just
a per-det mixing re-quadrature (O(nquad x ncomp), nside-independent) and
an einsum over the gathered component streams — proposal cost is
independent of nside at fixed lmax.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..model.mixing import mixing_element
from . import model as M


def unit_comp_tod(plan, bl_b, a, block, pol: bool):
    """Gather each component's unit-amplitude band response to TOD samples.

    bl_b: (S, nl) band beam; a: (C, S, nl, nm) component alms.
    Returns (C, Ns, Nd, Nt)."""
    from ..sampling import amplitude as amp
    alm_b = a * bl_b[None, :, :, None]
    maps = amp._synth(plan, alm_b)                        # (C, S, npix)
    return jax.vmap(lambda m: M.project_sky(m, block.pix, block.psi, pol)
                    )(maps)


def det_mixing(comps, det_bps, thetas, deltas_det, shift_model
               ="additive_shift"):
    """Per-det mixing row F[d, c] at per-det bandpass shifts (Nd,).

    The in-jit quadrature replacement for the reference's update_tau +
    update_mixing_matrices per proposal (commander.f90:338-343)."""
    rows = []
    for d, bp in enumerate(det_bps):
        row = [jnp.asarray(mixing_element(c, bp, tuple(th),
                                          deltas_det[d]), jnp.float32)
               for c, th in zip(comps, thetas)]
        rows.append(jnp.stack(row))
    return jnp.stack(rows)                                # (Nd, C)


def chisq_det(F_det, comp_tod, s_stat, block, tstate):
    """Per-detector TOD chi^2 for a candidate per-det mixing.

    comp_tod: (C, Ns, Nd, Nt) unit component streams; s_stat: static
    signal terms (orb + sl + zodi + mono), (Ns, Nd, Nt)."""
    s_sky = jnp.einsum("dc,csdt->sdt", F_det, comp_tod,
                       precision=jax.lax.Precision.HIGHEST)
    s_tot = s_sky + s_stat
    resid = block.tod - tstate.n_corr - tstate.gain[..., None] * s_tot
    c2 = resid ** 2 * block.mask \
        / jnp.maximum(tstate.sigma0[..., None] ** 2, 1e-30)
    return jnp.sum(c2, axis=(0, 2))                       # (Nd,)


def sample_bp_det(key, comps, thetas, det_bps, comp_tod, s_stat, block,
                  tstate, deltas_det0, n_prop: int = 1,
                  sigma_prop: float = 0.1e9, band_delta: float = 0.0,
                  shift_model: str = "additive_shift", optimize=False):
    """ndelta-proposal Metropolis over per-det bandpass shifts.

    deltas_det0: (Nd,) current per-det shifts (relative to band_delta).
    Returns (accepted deltas (Nd,), per-det chi^2 at acceptance, n_accept).
    Reference: proposal construction commander.f90:299-335, accept sweep
    sample_bp comm_tod_bandpass_mod.f90:42-61."""
    nd = len(det_bps)
    cur = jnp.asarray(deltas_det0)

    @jax.jit
    def _chisq(dd):
        F = det_mixing(comps, det_bps, thetas, dd + band_delta,
                       shift_model)
        return chisq_det(F, comp_tod, s_stat, block, tstate)

    c_cur = _chisq(cur)
    n_acc = 0
    for k in range(n_prop):
        key, k1, k2 = jax.random.split(key, 3)
        eta = sigma_prop * jax.random.normal(k1, (nd,), cur.dtype)
        prop = cur + eta
        prop = prop - jnp.mean(prop)        # relative moves only; the band
        #                                     mean shift is sampled by the
        #                                     band-level MH (delta(0))
        c_prop = _chisq(prop)
        diff = jnp.maximum(jnp.sum(c_prop) - jnp.sum(c_cur), 0.0)
        if optimize:
            accept = bool(jnp.sum(c_prop) <= jnp.sum(c_cur))
        else:
            accept = bool(jax.random.uniform(k2, ())
                          < jnp.exp(-0.5 * diff))
        if accept:
            cur, c_cur = prop, c_prop
            n_acc += 1
    return cur, c_cur, n_acc
