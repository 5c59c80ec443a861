"""The Gibbs-sampling driver: conditional steps composed into a jitted kernel.

TPU-native counterpart of the reference's main loop (``commander.f90:182-254``):
per iteration it alternates
  1. amplitude draw  a ~ P(a | d, Cl, theta)   [CG, sampling/amplitude.py]
  2. C_ell draw     Cl ~ P(Cl | a)             [inverse-gamma, model/cl.py]
  3. (stages to come: spectral indices, gains, bandpass, TOD)
The state is one immutable pytree per chain; chains batch via vmap with
independent fold_in PRNG keys — replacing the reference's per-rank seeded RNG
streams (comm_param_mod.f90:334-357) with counter-based keys.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..model.cl import (ClModelConfig, bin_index_table, cl_eval,
                        sample_cl_binned_invgamma)
from ..sphere import sht
from ..sphere.alm import triangle_mask
from . import amplitude as amp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GibbsState:
    """Per-chain sampler state (immutable pytree)."""
    a: jnp.ndarray          # (C, S, nl, nm) complex component amplitudes
    cl_bins: jnp.ndarray    # (C, S, nbins) binned power parameters
    key: jnp.ndarray        # PRNG key
    it: jnp.ndarray         # iteration counter
    cg_iters: jnp.ndarray   # diagnostics: last CG iteration count
    cg_relres: jnp.ndarray  # diagnostics: last CG relative residual
    # joint linear amplitudes (None when the model has none):
    t: jnp.ndarray | None = None   # template/md amplitudes (T,)
    p: jnp.ndarray | None = None   # point-source amplitudes (nsrc,)


@dataclasses.dataclass(frozen=True)
class GibbsConfig:
    """Static configuration of the Gibbs kernel."""
    cl_cfg: ClModelConfig
    cg_tol: float = 1e-7
    cg_maxiter: int = 300
    sample_cl: bool = True
    # OPERATION = optimize (reference commander.f90 'optimize' mode):
    # Wiener-mean amplitudes (no fluctuation terms) + ML C_ell update
    # instead of posterior draws.
    optimize: bool = False
    # Per-component COMP_CL_TYPE (comm_Cl_mod.f90:49-101): when non-empty,
    # component c's prior spectrum follows cl_cfgs[c]. 'binned' comps keep
    # their slice of state.cl_bins (own bin_starts, padded to the shared
    # nbins axis) and are resampled by inverse-gamma; functional kinds
    # (power_law / power_law_gauss / exp / gauss / none) are FIXED priors
    # taken from base_sys.cl — the reference never resamples them
    # (sample_Cls_powlaw is empty, comm_Cl_mod.f90:1251-1265).
    cl_cfgs: tuple = ()
    # CG_PRECOND_TYPE / CG_LMAX_PRECOND (param file keys)
    cg_precond: str = "diagonal"
    cg_lmax_precond: int = -1
    # CG sampling groups (define_cg_samp_groups): when non-empty the
    # amplitude step is a Gibbs sweep of per-group conditional solves
    # (commander.f90:211-221) instead of one joint draw.
    groups: tuple = ()
    # InvGamma(alpha0, beta0) hyperprior on binned C_b. The default
    # (-1, 0) is the reference's flat prior on C_b; proper values are
    # used by the Geweke joint-consistency validation (a flat prior has
    # no normalizable forward simulation).
    cl_alpha0: float = -1.0
    cl_beta0: float = 0.0


def init_state(key, ncomp, nmaps, lmax, nbins, cl0=1.0, ntemp=0,
               nsrc=0) -> GibbsState:
    nl = lmax + 1
    rdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    a = jnp.zeros((ncomp, nmaps, nl, nl), dtype=jnp.complex128
                  if jax.config.jax_enable_x64 else jnp.complex64)
    cl_bins = jnp.full((ncomp, nmaps, nbins), cl0, dtype=rdt)
    z = jnp.asarray(0)
    return GibbsState(a=a, cl_bins=cl_bins, key=key, it=z,
                      cg_iters=z, cg_relres=jnp.asarray(0.0),
                      t=jnp.zeros((ntemp,), rdt) if ntemp else None,
                      p=jnp.zeros((nsrc,), rdt) if nsrc else None)


def gibbs_step(cfg: GibbsConfig, base_sys: amp.AmplitudeSystem, plan,
               state: GibbsState, ts=None, ps=None) -> GibbsState:
    """One full Gibbs iteration (jittable; vmap over chains works).

    ts/ps: optional TemplateSet / PtsrcSet (sampling/joint.py) — when
    present the amplitude step solves the JOINT system
    [diffuse alms | template amps | source amps] like the reference's
    full solution vector (cr_amp2x)."""
    key, k_amp, k_cl = jax.random.split(state.key, 3)

    # 1. amplitudes | Cl  (comm_signal_mod.f90:154 sample_amps_by_CG)
    cl = eval_cl_all(cfg, base_sys, state.cl_bins)
    if base_sys.ell_mask is not None:
        # COMP_LMAX_AMP/LMIN_AMP projection (comm_cr_mod.f90:858-860)
        cl = cl * base_sys.ell_mask
    sys = dataclasses.replace(base_sys, cl=cl)
    t_new, p_new = state.t, state.p
    if cfg.groups:
        from . import groups as groups_mod
        a, t_new, p_new, res = groups_mod.sample_amplitudes_grouped(
            cfg.groups, sys, plan, state.a, state.t, state.p, ts, ps,
            key=None if cfg.optimize else k_amp, tol=cfg.cg_tol,
            optimize=cfg.optimize, precond=cfg.cg_precond,
            lowl_lmax=cfg.cg_lmax_precond)
        if res is None:
            from ..ops.cg import CGResult
            res = CGResult(x=None, iters=jnp.asarray(0),
                           rel_res=jnp.asarray(0.0),
                           converged=jnp.asarray(True))
    elif ts is not None or ps is not None:
        from . import joint
        x, res = joint.sample_joint(sys, plan, ts, ps,
                                    key=None if cfg.optimize else k_amp,
                                    tol=cfg.cg_tol, maxiter=cfg.cg_maxiter)
        a, t_new, p_new = x.a, x.t, x.p
    else:
        a, res = amp.sample_amplitudes(sys, plan,
                                       key=None if cfg.optimize else k_amp,
                                       tol=cfg.cg_tol,
                                       maxiter=cfg.cg_maxiter,
                                       precond=cfg.cg_precond,
                                       lowl_lmax=cfg.cg_lmax_precond)

    # 2. Cl | amplitudes  (comm_signal_mod.f90:435 sample_powspec ->
    #    comm_Cl_mod.f90:865 inverse-Wishart, diagonal-Stokes reduction).
    # Per-component COMP_CL_TYPE: only 'binned' components are resampled.
    cl_bins = sample_cl_all(cfg, k_cl, a, state.cl_bins)

    return GibbsState(a=a, cl_bins=cl_bins, key=key, it=state.it + 1,
                      cg_iters=res.iters, cg_relres=res.rel_res,
                      t=t_new, p=p_new)


def eval_cl_all(cfg: GibbsConfig, base_sys, cl_bins) -> jnp.ndarray:
    """Per-comp prior spectra: binned comps from their cl_bins slice,
    functional/none comps fixed at base_sys.cl (COMP_CL_TYPE dispatch;
    sampleCls select-case, comm_Cl_mod.f90:838-863)."""
    if not cfg.cl_cfgs:
        return jax.vmap(
            lambda b: cl_eval(cfg.cl_cfg, {"cl_bins": b}))(cl_bins)
    rows = []
    for c, cc in enumerate(cfg.cl_cfgs):
        if cc.kind == "binned":
            nb = len(cc.bin_starts)
            rows.append(cl_eval(cc, {"cl_bins": cl_bins[c, :, :nb]}))
        else:
            rows.append(base_sys.cl[c])
    return jnp.stack(rows)


def _ml_cl_bins(cl_cfg: ClModelConfig, a) -> jnp.ndarray:
    """ML binned update C_b = s_b/n_b for optimize mode (flat-prior mode)."""
    from ..model.cl import sigma_ell
    idx = jnp.asarray(bin_index_table(cl_cfg))
    nbins = len(cl_cfg.bin_starts)
    sig = sigma_ell(a, cl_cfg.lmax)              # (..., S, nl)
    ell = jnp.arange(cl_cfg.lmax + 1, dtype=sig.dtype)
    wl = 2.0 * ell + 1.0
    onehot = jax.nn.one_hot(idx, nbins, dtype=sig.dtype)   # (nl, nbins)
    ssum = jnp.einsum("...sl,lb->...sb", wl * sig, onehot)
    nmodes = wl @ onehot
    return ssum / jnp.maximum(nmodes, 1.0)


def sample_cl_all(cfg: GibbsConfig, k_cl, a, cl_bins) -> jnp.ndarray:
    """Per-component C_ell step honoring COMP_CL_TYPE."""
    if not cfg.sample_cl:
        return cl_bins
    if not cfg.cl_cfgs:
        if cfg.optimize:
            return _ml_cl_bins(cfg.cl_cfg, a)
        keys = jax.random.split(k_cl, a.shape[0])
        return jax.vmap(
            lambda k, ac: sample_cl_binned_invgamma(
                k, cfg.cl_cfg, ac, alpha0=cfg.cl_alpha0,
                beta0=cfg.cl_beta0)
        )(keys, a)
    new_bins = cl_bins
    for c, cc in enumerate(cfg.cl_cfgs):
        if cc.kind != "binned":
            continue                     # fixed prior: never resampled
        nb = len(cc.bin_starts)
        if cfg.optimize:
            draw = _ml_cl_bins(cc, a[c])
        else:
            draw = sample_cl_binned_invgamma(
                jax.random.fold_in(k_cl, c), cc, a[c],
                alpha0=cfg.cl_alpha0, beta0=cfg.cl_beta0,
                prev_bins=cl_bins[c, :, :nb])
        new_bins = new_bins.at[c, :, :nb].set(draw)
    return new_bins


def make_step_fn(cfg: GibbsConfig, base_sys: amp.AmplitudeSystem, plan):
    """Jitted single-chain step: state -> state."""
    return jax.jit(partial(gibbs_step, cfg, base_sys, plan))


def run_chain(cfg: GibbsConfig, base_sys, plan, state: GibbsState,
              niter: int) -> tuple[GibbsState, dict]:
    """Run niter Gibbs iterations with lax.scan, collecting light diagnostics
    (the reference's per-iteration chain outputs, comm_output_mod.f90:91)."""
    step = partial(gibbs_step, cfg, base_sys, plan)

    def body(state, _):
        new = step(state)
        out = {"cl_bins": new.cl_bins, "cg_iters": new.cg_iters,
               "cg_relres": new.cg_relres}
        return new, out

    final, hist = jax.lax.scan(body, state, None, length=niter)
    return final, hist
